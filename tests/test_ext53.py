"""Property tests for extension batch 53: recursive CTE, LATERAL,
month attribution."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_recursive_depth_is_log2(spark):
    rows = _q("relational_recursive_tree")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        k = r["c_custkey"]
        if k >= 1:
            assert r["depth"] == int(math.floor(math.log2(k))), k
            # path sum: k + k//2 + ... + 1
            s, node = 0, k
            while True:
                s += node
                if node <= 1:
                    break
                node //= 2
            assert r["path_key_sum"] == s


def test_lateral_topn_matches_window_form(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    t = load_sf_tables(spark, SF_ORACLE)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    expected = {
        (r["n_name"], r["c_custkey"])
        for r in t["customer"]
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 2")
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey")
        .collect()
    }
    got = {
        (r["n_name"], r["c_custkey"])
        for r in _q("join_lateral_topn")(spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_month_attribution_totals_match_littles_law(spark):
    rows = _q("ops_backlog_by_month")(spark, SF_ORACLE).collect()
    assert rows
    total_days = sum(r["order_days"] for r in rows)
    # Conservation: the month split must preserve the total order-days
    # (sum of interval durations), the same quantity Little's law uses.
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    t = load_sf_tables(spark, SF_ORACLE)
    fs = t["lineitem"].groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship"))
    dur = (
        t["orders"]
        .join(fs, t["orders"]["o_orderkey"] == fs["l_orderkey"])
        .filter(F.col("ship") > F.col("o_orderdate"))
        .agg(
            (
                F.sum(
                    F.unix_micros(F.col("ship").cast("timestamp"))
                    - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                )
                / 86400000000.0
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    assert abs(total_days - dur) < 0.01
    for r in rows:
        assert r["order_days"] > 0 and r["n_order_slices"] > 0
