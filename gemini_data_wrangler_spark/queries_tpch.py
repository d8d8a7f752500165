"""TPC-H-style headline queries, adapted to the driver's star schema and
expressed through the stage IR (JOIN/FILTER/GROUP/TOPK stages + expression
columns) — the analytical workloads a user of the reference would run via
CUSTOM SQL, here first-class pipelines.

These are the bench headliners: multi-way joins with broadcastable dims,
expression aggregates, and top-k — the plans that must hold up at 100 TB
(broadcast joins for nation/region/customer dims, partial aggregation
before the shuffle, TakeOrderedAndProject for top-k).

Adaptations to the driver schema (TESTDATA.md): no ship/commit/receipt
distinction beyond l_shipdate, no shipmode/shipinstruct, orders has no
clerk/comment — filters re-targeted to existing columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.queries import register, run_stages

# ---------------------------------------------------------------------------
# Q1: pricing summary report (FILTER + GROUP with expression aggregates)
# ---------------------------------------------------------------------------
_Q1_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           round(SUM(l_quantity), 2) AS sum_qty,
           round(SUM(l_extendedprice), 2) AS sum_base_price,
           round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(AVG(l_quantity), 6) AS avg_qty,
           round(AVG(l_extendedprice), 6) AS avg_price,
           round(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", _Q1_ORACLE)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = run_stages(
        spark,
        sf_dir,
        [
            {
                "id": "stage_0",
                "type": "FILTER",
                "data": {
                    "table": "lineitem",
                    "column": "l_shipdate",
                    "operator": "<=",
                    "value": "1998-09-02 00:00:00",
                },
            },
            {
                "id": "stage_1",
                "type": "GROUP",
                "data": {
                    "groupBy": ["l_returnflag", "l_linestatus"],
                    "aggregations": [
                        {"function": "SUM", "column": "l_quantity", "alias": "_sq"},
                        {"function": "SUM", "column": "l_extendedprice", "alias": "_sbp"},
                        {"function": "SUM", "column": "l_extendedprice * (1 - l_discount)", "alias": "_sdp"},
                        {"function": "SUM", "column": "l_extendedprice * (1 - l_discount) * (1 + l_tax)", "alias": "_sc"},
                        {"function": "AVG", "column": "l_quantity", "alias": "_aq"},
                        {"function": "AVG", "column": "l_extendedprice", "alias": "_ap"},
                        {"function": "AVG", "column": "l_discount", "alias": "_ad"},
                        {"function": "COUNT", "column": "*", "alias": "count_order"},
                    ],
                },
            },
        ],
    )
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("_sq", 2).alias("sum_qty"),
        F.round("_sbp", 2).alias("sum_base_price"),
        F.round("_sdp", 2).alias("sum_disc_price"),
        F.round("_sc", 2).alias("sum_charge"),
        F.round("_aq", 6).alias("avg_qty"),
        F.round("_ap", 6).alias("avg_price"),
        F.round("_ad", 6).alias("avg_disc"),
        "count_order",
    )


# ---------------------------------------------------------------------------
# Q3: shipping priority (3-way join + expression agg + deterministic top-k)
# ---------------------------------------------------------------------------
_Q3_ORACLE = """
    SELECT l_orderkey,
           round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
"""


@register("tpch_q3_shipping_priority", _Q3_ORACLE)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = run_stages(
        spark,
        sf_dir,
        [
            {
                "id": "stage_0",
                "type": "FILTER",
                "data": {"table": "customer", "column": "c_mktsegment", "operator": "=", "value": "BUILDING"},
            },
            {
                "id": "stage_1",
                "type": "FILTER",
                "data": {"table": "orders", "column": "o_orderdate", "operator": "<", "value": "1995-03-15 00:00:00"},
            },
            {
                "id": "stage_2",
                "type": "FILTER",
                "data": {"table": "lineitem", "column": "l_shipdate", "operator": ">", "value": "1995-03-15 00:00:00"},
            },
            {
                "id": "stage_3",
                "type": "JOIN",
                "data": {
                    "joinType": "INNER",
                    "leftTable": "result_stage_1_filter",
                    "rightTable": "result_stage_0_filter",
                    "leftKey": "o_custkey",
                    "rightKey": "c_custkey",
                    "broadcast": "right",
                },
            },
            {
                "id": "stage_4",
                "type": "JOIN",
                "data": {
                    "joinType": "INNER",
                    "leftTable": "result_stage_2_filter",
                    "rightTable": "result_stage_3_join",
                    "leftKey": "l_orderkey",
                    "rightKey": "o_orderkey",
                },
            },
            {
                "id": "stage_5",
                "type": "GROUP",
                "data": {
                    "groupBy": ["l_orderkey", "o_orderdate", "o_orderpriority"],
                    "aggregations": [
                        {"function": "SUM", "column": "l_extendedprice * (1 - l_discount)", "alias": "_rev"}
                    ],
                },
            },
            {
                "id": "stage_6",
                "type": "TOPK",
                "data": {
                    "n": 10,
                    "orderBy": [
                        {"column": "_rev", "direction": "DESC"},
                        {"column": "o_orderdate", "direction": "ASC"},
                        {"column": "l_orderkey", "direction": "ASC"},
                    ],
                },
            },
        ],
    )
    return df.select(
        "l_orderkey", F.round("_rev", 2).alias("revenue"), "o_orderdate", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# Q5: local supplier volume (5-way join through dims; broadcast the dims)
# ---------------------------------------------------------------------------
_Q5_ORACLE = """
    SELECT n_name,
           round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
"""


@register("tpch_q5_local_supplier", _Q5_ORACLE)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The two-column supplier join (l_suppkey AND c_nationkey = s_nationkey)
    # exceeds the single-key JOIN stage, so the tail is a CUSTOM stage over
    # the stage results — exactly how the reference reaches beyond its
    # algebra (ui/src/sqlGenerator.ts:101-106).
    df = run_stages(
        spark,
        sf_dir,
        [
            {
                "id": "stage_0",
                "type": "FILTER",
                "data": {
                    "table": "orders",
                    "conditions": [
                        {"column": "o_orderdate", "operator": ">=", "value": "1994-01-01 00:00:00"},
                        {"column": "o_orderdate", "operator": "<", "value": "1995-01-01 00:00:00", "logic": "AND"},
                    ],
                },
            },
            {
                "id": "stage_1",
                "type": "JOIN",
                "data": {
                    "joinType": "INNER",
                    "leftTable": "result_stage_0_filter",
                    "rightTable": "customer",
                    "leftKey": "o_custkey",
                    "rightKey": "c_custkey",
                },
            },
            {
                "id": "stage_2",
                "type": "JOIN",
                "data": {
                    "joinType": "INNER",
                    "leftTable": "lineitem",
                    "rightTable": "result_stage_1_join",
                    "leftKey": "l_orderkey",
                    "rightKey": "o_orderkey",
                },
            },
            {
                "id": "stage_3",
                "type": "CUSTOM",
                "data": {
                    "sql": """
                    SELECT n_name,
                           SUM(l_extendedprice * (1 - l_discount)) AS _rev
                    FROM result_stage_2_join t
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'ASIA'
                    GROUP BY n_name
                    """
                },
            },
            {
                "id": "stage_4",
                "type": "SORT",
                "data": {"orderBy": [{"column": "_rev", "direction": "DESC"}]},
            },
        ],
    )
    return df.select("n_name", F.round("_rev", 2).alias("revenue"))


# ---------------------------------------------------------------------------
# Q6: forecast revenue change (pure FILTER + global AGGREGATE — pushdown demo)
# ---------------------------------------------------------------------------
_Q6_ORACLE = """
    SELECT round(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", _Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = run_stages(
        spark,
        sf_dir,
        [
            {
                "id": "stage_0",
                "type": "FILTER",
                "data": {
                    "table": "lineitem",
                    "conditions": [
                        {"column": "l_shipdate", "operator": ">=", "value": "1994-01-01 00:00:00"},
                        {"column": "l_shipdate", "operator": "<", "value": "1995-01-01 00:00:00", "logic": "AND"},
                        {"column": "l_discount", "operator": ">=", "value": 0.05, "logic": "AND"},
                        {"column": "l_discount", "operator": "<=", "value": 0.07, "logic": "AND"},
                        {"column": "l_quantity", "operator": "<", "value": 24, "logic": "AND"},
                    ],
                },
            },
            {
                "id": "stage_1",
                "type": "AGGREGATE",
                "data": {
                    "aggregations": [
                        {"function": "SUM", "column": "l_extendedprice * l_discount", "alias": "_rev"}
                    ]
                },
            },
        ],
    )
    return df.select(F.round("_rev", 2).alias("revenue"))


# ---------------------------------------------------------------------------
# Q10: returned-item reporting (join + group on customer, top 20 by revenue)
# ---------------------------------------------------------------------------
_Q10_ORACLE = """
    SELECT c_custkey, c_name,
           round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, c_custkey ASC
    LIMIT 20
"""


@register("tpch_q10_returned_items", _Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = run_stages(
        spark,
        sf_dir,
        [
            {
                "id": "stage_0",
                "type": "FILTER",
                "data": {
                    "table": "orders",
                    "conditions": [
                        {"column": "o_orderdate", "operator": ">=", "value": "1993-10-01 00:00:00"},
                        {"column": "o_orderdate", "operator": "<", "value": "1994-01-01 00:00:00", "logic": "AND"},
                    ],
                },
            },
            {
                "id": "stage_1",
                "type": "FILTER",
                "data": {"table": "lineitem", "column": "l_returnflag", "operator": "=", "value": "R"},
            },
            {
                "id": "stage_2",
                "type": "JOIN",
                "data": {
                    "joinType": "INNER",
                    "leftTable": "result_stage_1_filter",
                    "rightTable": "result_stage_0_filter",
                    "leftKey": "l_orderkey",
                    "rightKey": "o_orderkey",
                },
            },
            {
                "id": "stage_3",
                "type": "JOIN",
                "data": {
                    "joinType": "INNER",
                    "leftTable": "result_stage_2_join",
                    "rightTable": "customer",
                    "leftKey": "o_custkey",
                    "rightKey": "c_custkey",
                },
            },
            {
                "id": "stage_4",
                "type": "JOIN",
                "data": {
                    "joinType": "INNER",
                    "leftTable": "result_stage_3_join",
                    "rightTable": "nation",
                    "leftKey": "c_nationkey",
                    "rightKey": "n_nationkey",
                    "broadcast": "right",
                },
            },
            {
                "id": "stage_5",
                "type": "GROUP",
                "data": {
                    "groupBy": ["c_custkey", "c_name", "c_acctbal", "n_name"],
                    "aggregations": [
                        {"function": "SUM", "column": "l_extendedprice * (1 - l_discount)", "alias": "_rev"}
                    ],
                },
            },
            {
                "id": "stage_6",
                "type": "TOPK",
                "data": {
                    "n": 20,
                    "orderBy": [
                        {"column": "_rev", "direction": "DESC"},
                        {"column": "c_custkey", "direction": "ASC"},
                    ],
                },
            },
        ],
    )
    return df.select(
        "c_custkey", "c_name", F.round("_rev", 2).alias("revenue"), "c_acctbal", "n_name"
    )
