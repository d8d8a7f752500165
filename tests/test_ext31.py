"""Property tests for extension batch 31: cascade monotonicity, KM
estimator laws, Gini bounds vs a direct computation."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_cascade_is_monotone_and_anchored(spark):
    rows = {r["stage"]: r for r in _q("corpus_dedup_cascade")(spark, SF_ORACLE).collect()}
    assert [rows[i]["name"] for i in range(4)] == [
        "raw",
        "exact",
        "normalized",
        "containment",
    ]
    counts = [rows[i]["docs_remaining"] for i in range(4)]
    # Each stage can only remove documents; something must survive.
    assert counts[0] >= counts[1] >= counts[2] >= counts[3] > 0
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    assert counts[0] == load_sf_tables(spark, SF_ORACLE)["documents"].count()
    # Containment at 0.8 must bite on this corpus (it has near-dup pairs).
    assert counts[3] < counts[2]


def test_km_survival_is_monotone_from_one(spark):
    rows = sorted(
        _q("customer_survival_km")(spark, SF_ORACLE).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    s = [r["survival"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in s)
    # Survival is non-increasing and starts below 1 (first failure time).
    assert all(a >= b for a, b in zip(s, s[1:]))
    assert s[0] < 1.0
    # At-risk counts decrease with duration; events never exceed at-risk.
    n = [r["n_at_risk"] for r in rows]
    assert all(a >= b for a, b in zip(n, n[1:]))
    assert all(r["n_events"] <= r["n_at_risk"] for r in rows)


def test_gini_matches_direct_mean_difference(spark):
    r = _q("events_user_gini")(spark, SF_ORACLE).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables
    from pyspark.sql import functions as F

    events = load_sf_tables(spark, SF_ORACLE)["events"]
    xs = [
        row["x"]
        for row in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    ]
    n, tot = len(xs), sum(xs)
    assert r["n_users"] == n
    # Direct definition: mean absolute difference / (2·mean). The O(n²)
    # double loop is replaced by the exact sorted identity
    # Σ_{i,j}|xi−xj| = 2·Σ_i (2i−n+1)·x_(i) (0-indexed ascending) — integer
    # arithmetic, bit-identical value, and ~50 s faster at sf0.01 (the
    # pure-Python pair loop was a top-5 pytest cost; round-8 ask #7).
    xs_sorted = sorted(xs)
    mad = 2 * sum((2 * i - n + 1) * x for i, x in enumerate(xs_sorted)) / (n * n)
    direct = mad / (2 * tot / n)
    assert abs(r["gini"] - direct) < 1e-6
