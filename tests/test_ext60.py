"""Property tests for extension batch 60: seasonal-naive MASE,
Holt–Winters."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def _daily(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    ev = load_sf_tables(spark, SF_ORACLE)["events"]
    return (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.round(F.sum("value"), 6).alias("total"))
        .orderBy("d")
        .collect()
    )


def test_mase_consistency(spark):
    r = _q("forecast_seasonal_naive_mase")(spark, SF_ORACLE).collect()[0]
    daily = _daily(spark)
    assert r["n_scored"] == len(daily) - 7
    assert r["mae_seasonal"] > 0 and r["mae_naive"] > 0
    assert abs(r["mase"] - round(r["mae_seasonal"] / r["mae_naive"], 4)) < 0.01


def test_holt_winters_matches_python_recursion(spark):
    """The distributed fold must reproduce the scalar HW recursion."""
    daily = _daily(spark)
    xs = [row["total"] for row in daily]
    a, b, g, m = 0.3, 0.1, 0.2, 7
    level, trend, n = xs[0], 0.0, 1
    seas = [0.0] * m
    states = [(level, trend, list(seas), n)]
    for x in xs[1:]:
        sold = seas[n % m]
        lvl = a * (x - sold) + (1 - a) * (level + trend)
        trd = b * (lvl - level) + (1 - b) * trend
        seas[n % m] = g * (x - lvl) + (1 - g) * sold
        level, trend, n = lvl, trd, n + 1
        states.append((level, trend, list(seas), n))
    rows = sorted(
        _q("forecast_holt_winters")(spark, SF_ORACLE).collect(), key=lambda r: r["d"]
    )
    assert len(rows) == len(xs) - (2 * m - 1)
    for row in rows:
        i = [d["d"] for d in daily].index(row["d"])
        lvl, trd, seas_i, n_i = states[i]
        assert abs(row["level"] - lvl) < 1e-4
        assert abs(row["trend"] - trd) < 1e-4
        exp_season = seas_i[n_i % m]
        assert abs(row["season_next"] - exp_season) < 1e-4
        assert abs(row["forecast_next"] - (lvl + trd + exp_season)) < 1e-4
