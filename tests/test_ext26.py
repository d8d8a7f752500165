"""Property tests for extension batch 26 (beyond oracle parity):
backfill island logic on fabricated gaps, sliding-reach consistency,
latency ordering, watermark-drop monotonicity."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_backfill_plan_empty_on_complete_corpus(spark):
    # The synthetic events table has every day present — an empty plan IS
    # the completeness assertion.
    assert _q("ops_backfill_plan")(spark, SF_ORACLE).count() == 0


def test_backfill_plan_finds_fabricated_gaps(spark, tmp_path):
    """Drop two disjoint day ranges from one event type and assert the
    plan reports exactly those islands."""
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    events = load_sf_tables(spark, SF_ORACLE)["events"]
    d = F.to_date("ts")
    gappy = events.filter(
        ~(
            (F.col("event_type") == "signup")
            & (
                d.between(F.lit("2024-01-05"), F.lit("2024-01-07"))
                | (d == F.lit("2024-01-20"))
            )
        )
    )
    out = str(tmp_path / "events.parquet")
    gappy.write.parquet(out)
    rows = _q("ops_backfill_plan")(spark, str(tmp_path)).collect()
    got = {
        (r["event_type"], str(r["gap_start"]), str(r["gap_end"]), r["n_days"])
        for r in rows
    }
    assert got == {
        ("signup", "2024-01-05", "2024-01-07", 3),
        ("signup", "2024-01-20", "2024-01-20", 1),
    }


def test_sliding_reach_bounds_daily_reach(spark):
    reach = {
        r["window_end"]: r["reach_7d"]
        for r in _q("window_sliding_distinct_users")(spark, SF_ORACLE).collect()
    }
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    events = load_sf_tables(spark, SF_ORACLE)["events"]
    daily = {
        r["d"]: r["u"]
        for r in events.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    assert set(reach) == set(daily)
    total_users = events.select("user_id").distinct().count()
    for day, r7 in reach.items():
        # 7-day reach dominates single-day reach, bounded by the universe.
        assert daily[day] <= r7 <= total_users
    # Monotone ramp-up over the first 7 days of the month.
    days = sorted(reach)
    for a, b in zip(days[:6], days[1:7]):
        assert reach[a] <= reach[b]


def test_conversion_latency_percentiles_ordered(spark):
    r = _q("events_conversion_latency")(spark, SF_ORACLE).collect()[0]
    assert r["n_conversions"] > 0
    assert 0 <= r["latency_p50_s"] <= r["latency_p90_s"] <= r["latency_p99_s"]


def test_watermark_drop_is_monotone_decreasing(spark):
    rows = sorted(
        _q("ops_watermark_sizing")(spark, SF_ORACLE).collect(),
        key=lambda r: r["wm_minutes"],
    )
    assert [r["wm_minutes"] for r in rows] == [5, 15, 30, 60, 120]
    fracs = [r["dropped_frac"] for r in rows]
    # A longer watermark never drops MORE data.
    assert all(a >= b for a, b in zip(fracs, fracs[1:]))
    assert all(0.0 <= f <= 1.0 for f in fracs)
    for r in rows:
        assert 0 <= r["dropped"]
