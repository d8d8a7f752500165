"""Property tests for extension batch 35: bot-screen invariants, KS vs
scipy-free direct computation."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_bot_signals_ranges_and_flag_logic(spark):
    rows = _q("users_bot_signals")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["n_events"] >= 5
        assert r["mean_gap_s"] > 0
        assert r["gap_cv"] >= 0
        assert 0.0 < r["top_transition_share"] <= 1.0
        assert r["suspicious"] == (
            r["gap_cv"] < 0.1 or r["top_transition_share"] > 0.9
        )
    # Organic synthetic traffic: the screen must not flag everyone.
    flagged = sum(1 for r in rows if r["suspicious"])
    assert flagged < len(rows) / 2


def test_ks_matches_direct_computation(spark):
    import math

    r = _q("corpus_ks_drift_test")(spark, SF_ORACLE).collect()[0]
    from pyspark.sql import functions as F
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    a = sorted(
        x["n_chars"] for x in docs.filter(F.col("source") == "src1").collect()
    )
    b = sorted(
        x["n_chars"] for x in docs.filter(F.col("source") == "src8").collect()
    )
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))

    def ecdf(xs, v):
        import bisect

        return bisect.bisect_right(xs, v) / len(xs)

    grid = sorted(set(a) | set(b))
    d = max(abs(ecdf(a, v) - ecdf(b, v)) for v in grid)
    assert abs(r["ks_d"] - round(d, 6)) < 1e-9
    lam = d * math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    assert abs(r["p_approx"] - round(2 * math.exp(-2 * lam * lam), 6)) < 1e-5
    assert 0.0 <= r["p_approx"] <= 2.0  # one-term approximation can exceed 1
