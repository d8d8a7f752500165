"""Tests for stage-DAG derivation, flow JSON round-trip, and sinks."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from gemini_data_wrangler_spark.plans.graph import (
    build_stage_graph,
    export_flow,
    export_flow_json,
    import_flow_json,
    topological_levels,
)
from gemini_data_wrangler_spark.plans.stage import Stage
from gemini_data_wrangler_spark.sources.sinks import write_csv, write_parquet


def _stages():
    return [
        Stage(type="LOAD", id="s1", data={"tableName": "orders"}),
        Stage(type="LOAD", id="s2", data={"tableName": "customers"}),
        Stage(
            type="JOIN",
            id="s3",
            data={"joinType": "INNER", "leftTable": "orders", "rightTable": "customers",
                  "leftKey": "cid", "rightKey": "cid"},
        ),
        Stage(type="FILTER", id="s4", data={"table": "joined_orders_customers",
                                            "column": "x", "operator": ">", "value": 1}),
    ]


def test_build_stage_graph_edges_and_levels():
    nodes = build_stage_graph(_stages())
    assert nodes["s3"].inputs == ["s1", "s2"]
    assert nodes["s4"].inputs == ["s3"]  # via the joined_{l}_{r} synthetic name
    assert [nodes[s].level for s in ("s1", "s2", "s3", "s4")] == [0, 0, 1, 2]
    assert topological_levels(nodes) == [["s1", "s2"], ["s3"], ["s4"]]


def test_flow_json_round_trip():
    stages = _stages()
    records = export_flow(stages)
    # ids renumbered to displayed order (ui/src/App.tsx:2045-2051)
    assert [r["id"] for r in records] == ["stage_1", "stage_2", "stage_3", "stage_4"]
    text = export_flow_json(stages)
    back = import_flow_json(text)
    assert [s.type for s in back] == [s.type for s in stages]
    assert back[2].data["leftTable"] == "orders"
    # unknown types whitelist-default to CUSTOM
    mutated = json.loads(text)
    mutated[0]["type"] = "NONSense"
    assert import_flow_json(json.dumps(mutated))[0].type == "CUSTOM"


def test_write_parquet_partitioned_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)], "id long, part string, v double"
    )
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_by=["part"])
    # hive-style partition dirs exist -> partition pruning is possible
    assert sorted(d for d in os.listdir(out) if d.startswith("part=")) == ["part=a", "part=b"]
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_write_csv_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert {(r.id, r.s) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables
    from gemini_data_wrangler_spark.sources.sinks import write_bucketed_table
    from tests.conftest import SF_SMALL

    tables = load_sf_tables(spark, SF_SMALL)
    write_bucketed_table(
        tables["orders"], "b_orders", ["o_custkey"], n_buckets=4, sort_cols=["o_custkey"]
    )
    write_bucketed_table(
        tables["customer"], "b_customer", ["c_custkey"], n_buckets=4, sort_cols=["c_custkey"]
    )
    try:
        o = spark.table("b_orders")
        c = spark.table("b_customer")
        # Disable broadcast so the co-location (not a broadcast) is what
        # removes the shuffle.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o.join(c, o["o_custkey"] == c["c_custkey"]).groupBy("c_mktsegment").count()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # The join inputs must be exchange-free (bucket co-location);
            # the post-join aggregation keys on a different column, so
            # exactly ONE exchange (the agg's) may appear in the whole plan.
            assert plan.count("Exchange") <= 1, plan
            assert "SortMergeJoin" in plan
            from pyspark.sql import functions as F

            n = joined.agg(F.sum("count")).collect()[0][0]
            assert n == tables["orders"].count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """An equality filter on the partition column must become a
    PartitionFilter (directory pruning) — the scan never opens the other
    partitions' files. This is THE mechanism that turns a 100 TB date-range
    query into a read of only the touched days."""
    df = spark.createDataFrame(
        [(i, f"d{i % 5}") for i in range(100)], "id bigint, day string"
    )
    out = str(tmp_path / "part")
    write_parquet(df, out, partition_by=["day"])
    scan = spark.read.parquet(out).filter(F.col("day") == "d3")
    assert scan.count() == 20
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # FileSourceScan reports pruned partition filters + a 1/5 selection.
    assert "PartitionFilters: [" in plan and "d3" in plan


def test_zorder_layout_clusters_every_dimension(spark, tmp_path):
    """Z-ordered files must be clustered in BOTH dimensions (per-file
    min/max span well under the global span), where a linear sort leaves
    the non-leading dimension unclustered (~full span per file)."""
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.sinks import write_zorder
    from tests.conftest import SF_SMALL

    o = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderkey", "o_totalprice", F.unix_timestamp("o_orderdate").cast("double").alias("od"))
    )
    g = o.agg(
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("g1"),
        (F.max("od") - F.min("od")).alias("g2"),
    ).collect()[0]

    def file_spans(df):
        return (
            df.groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("o_totalprice") - F.min("o_totalprice")).alias("s1"),
                (F.max("od") - F.min("od")).alias("s2"),
            )
            .agg(F.avg("s1").alias("a1"), F.avg("s2").alias("a2"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )

    write_zorder(o, str(tmp_path / "z"), ["o_totalprice", "od"], n_files=16)
    z = file_spans(spark.read.parquet(str(tmp_path / "z")))
    o.repartitionByRange(16, "o_totalprice").sortWithinPartitions(
        "o_totalprice"
    ).write.parquet(str(tmp_path / "lin"))
    lin = file_spans(spark.read.parquet(str(tmp_path / "lin")))

    assert z.n >= 8
    assert z.a1 / g.g1 < 0.6  # leading dim clustered
    assert z.a2 / g.g2 < 0.6  # second dim ALSO clustered
    assert z.a2 < lin.a2 * 0.75  # linear sort leaves dim 2 unclustered
