"""Property tests for extension batch 52: position-based attribution,
burst detection, Little's law."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_position_credits_sum_to_one(spark):
    rows = _q("attribution_position_based")(spark, SF_ORACLE).collect()
    assert rows
    by_purchase = defaultdict(list)
    for r in rows:
        by_purchase[r["event_id"]].append(r)
    for pid, touches in by_purchase.items():
        total = sum(t["credit"] for t in touches)
        assert abs(total - 1.0) < 1e-4, (pid, total)
        n = touches[0]["n_touches"]
        assert len(touches) == n
        if n >= 3:
            credits = sorted(t["credit"] for t in touches)
            assert credits[-1] == 0.4 and credits[-2] == 0.4
            assert all(abs(c - 0.2 / (n - 2)) < 1e-6 for c in credits[:-2])


def test_burst_detection_thresholds(spark):
    rows = _q("events_burst_detection")(spark, SF_ORACLE).collect()
    # synthetic sf0.01 corpus has a couple of genuine bursts
    assert len(rows) >= 1
    for r in rows:
        assert r["n_events"] >= 10
        assert r["n_events"] > 3.0 * r["trailing_median"]
        assert r["trailing_median"] > 0


def test_littles_law_holds_exactly(spark):
    r = _q("ops_little_law")(spark, SF_ORACLE).collect()[0]
    # integer-microsecond sweepline integral == sum of durations
    assert r["littles_ratio"] == 1.0
    assert r["avg_backlog_l"] > 0
    assert r["lambda_per_day"] > 0
    assert r["w_days"] > 0
    # L = lambda * W up to the round-6 published values
    assert abs(r["avg_backlog_l"] - r["lambda_per_day"] * r["w_days"]) < 0.01 * r["avg_backlog_l"]
