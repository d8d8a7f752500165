"""Property tests for extension batch 30: sweep-line conservation laws,
two-level carry correctness, nearest-join dominance over as-of."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_backlog_nonnegative_and_conserved(spark):
    rows = sorted(
        _q("ops_backlog_sweepline")(spark, SF_ORACLE).collect(), key=lambda r: r["d"]
    )
    assert rows
    # Backlog is a count of open intervals: never negative, ends at zero
    # (every order eventually closes).
    assert all(r["backlog"] >= 0 for r in rows)
    assert rows[-1]["backlog"] == 0
    # Spot-check one interior day against a direct interval-stab count.
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    mid = rows[len(rows) // 2]["d"]
    direct = orders.filter(
        (F.to_date("o_orderdate") <= F.lit(mid))
        & (
            F.date_add(
                F.to_date("o_orderdate"), (15 + F.col("o_orderkey") % 60).cast("int")
            )
            > F.lit(mid)
        )
    ).count()
    assert direct == next(r["backlog"] for r in rows if r["d"] == mid)


def test_peak_concurrency_two_level_carry_matches_naive(spark):
    got = {
        r["hour"]: r["peak_concurrency"]
        for r in _q("events_peak_concurrency")(spark, SF_ORACLE).collect()
    }
    # Naive single-window sweep (the oracle's shape) on the same data.
    from pyspark.sql import Window
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    events = load_sf_tables(spark, SF_ORACLE)["events"]
    up = events.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    down = events.select(
        F.expr("ts + INTERVAL 300 SECOND").alias("t"), F.lit(-1).alias("delta")
    )
    w = Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    naive = (
        up.unionAll(down)
        .withColumn("active", F.sum("delta").over(w))
        .groupBy(F.date_trunc("hour", "t").alias("hour"))
        .agg(F.max("active").alias("peak"))
    )
    assert got == {r["hour"]: r["peak"] for r in naive.collect()}
    # Hours holding only interval-end points can legally peak at 0.
    assert all(v >= 0 for v in got.values())
    assert max(got.values()) >= 1


def test_nearest_click_dominates_backward_asof(spark):
    """The bidirectional nearest distance can only be ≤ the backward
    as-of distance for anchors both queries match."""
    nearest = {
        r["event_id"]: (r["ts"], r["nearest_click_ts"], r["dist_s"])
        for r in _q("join_nearest_click")(spark, SF_ORACLE).collect()
    }
    assert nearest
    back = _q("asof_purchase_last_click")(spark, SF_ORACLE).collect()
    cols = back[0].asDict().keys()
    assert all(0 <= v[2] <= 3600 for v in nearest.values())
    # Every backward-matched purchase within the tolerance is also
    # nearest-matched, at an equal-or-smaller distance.
    for r in back:
        d = r.asDict()
        eid = d.get("event_id") or d.get("purchase_id")
        if eid in nearest and d.get("last_click") is not None:
            back_dist = (
                d["ts"] - d["last_click"]
            ).total_seconds() if "last_click" in d and d["last_click"] else None
            if back_dist is not None and back_dist <= 3600:
                assert nearest[eid][2] <= back_dist + 1
