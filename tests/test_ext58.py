"""Property tests for extension batch 58: Chow test, runs test."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_chow_statistic_sane(spark):
    r = _q("timeseries_chow_test")(spark, SF_ORACLE).collect()[0]
    assert r["n_pre"] > 10 and r["n_post"] > 10
    # split regression can only fit better than pooled
    assert 0.0 < r["ssr_ratio"] <= 1.0
    assert r["chow_f"] >= 0.0
    # stationary synthetic generator: no dramatic break at the midpoint
    assert r["chow_f"] < 50


def test_runs_test_counts_consistent(spark):
    r = _q("timeseries_runs_test")(spark, SF_ORACLE).collect()[0]
    n = r["n_above"] + r["n_below"]
    assert 1 <= r["n_runs"] <= n
    assert abs(r["expected_runs"] - (2 * r["n_above"] * r["n_below"] / n + 1)) < 1e-4
    # independent daily draws: |z| should not be extreme
    assert abs(r["z_score"]) < 6


def test_runs_test_against_python_walk(spark):
    """Recount the runs with a literal Python pass over the daily series."""
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    daily = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = [r["x"] for r in daily]
    srt = sorted(xs)
    n = len(srt)
    med = srt[n // 2] if n % 2 else (srt[n // 2 - 1] + srt[n // 2]) / 2
    signs = [1 if x > med else 0 for x in xs if x != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    got = _q("timeseries_runs_test")(spark, SF_ORACLE).collect()[0]
    assert got["n_runs"] == runs
    assert got["n_above"] == sum(signs)
