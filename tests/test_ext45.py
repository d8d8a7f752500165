"""Property tests for extension batch 45: weighted median, ER blocking
quality, CUSUM changepoint."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_weighted_median_against_python(spark):
    """Spark weighted median must equal a brute-force computation."""
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    li = load_sf_tables(spark, SF_ORACLE)["lineitem"]
    rows = li.select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    ).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], r["l_quantity"], r["l_orderkey"], r["l_linenumber"])
        )
    expected = {}
    for g, vals in by_grp.items():
        vals.sort()
        tw = sum(v[1] for v in vals)
        cw = 0.0
        for v, wt, _, _ in vals:
            cw += wt
            if cw >= tw / 2:
                expected[g] = round(v, 6)
                break
    got = {
        r["grp"]: r["weighted_median"]
        for r in _q("percentile_weighted_median")(spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_er_blocking_quality_invariants(spark):
    r = _q("er_blocking_quality")(spark, SF_ORACLE).collect()[0]
    assert 0 < r["n_cand"] < r["n_total_pairs"]
    assert 0.0 < r["reduction_ratio"] < 1.0
    assert 0 <= r["n_true_in_block"] <= r["n_true"]
    assert 0.0 <= r["pairs_completeness"] <= 1.0
    # Candidate count must equal sum over nations of block-size choose 2.
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    cust = load_sf_tables(spark, SF_ORACLE)["customer"].filter("c_custkey <= 4000")
    sizes = [
        row["c"]
        for row in cust.groupBy("c_nationkey").count().withColumnRenamed("count", "c").collect()
    ]
    assert r["n_cand"] == sum(s * (s - 1) // 2 for s in sizes)


def test_cusum_peak_is_argmax(spark):
    """The reported changepoint must be the argmax of |cusum| over days."""
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    daily = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("x"))
        .orderBy("d")
        .collect()
    )
    mu = round(sum(r["x"] for r in daily) / len(daily), 2)
    s, best = 0.0, (None, -1.0)
    for r in daily:
        s += r["x"] - mu
        if abs(s) > best[1]:
            best = (r["d"], abs(s))
    got = _q("timeseries_changepoint_cusum")(spark, SF_ORACLE).collect()[0]
    assert got["changepoint_date"] == best[0]
    assert abs(got["cusum_abs"] - round(best[1], 2)) < 0.5
    assert got["n_days"] == len(daily)
