"""Property tests for extension batch 63: trimmed mean, Mann–Whitney,
Levene."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_trimmed_mean_between_bounds(spark):
    rows = _q("agg_trimmed_mean")(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["lo_cut"] < r["trimmed_mean"] < r["hi_cut"]
        assert r["n_kept"] > 0


def test_mann_whitney_against_scipy_formula(spark):
    """Recompute U and z with a direct Python rank computation."""
    import math

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"].collect()
    xs = [r["n_chars"] for r in docs if r["source"] == "src0"]
    ys = [r["n_chars"] for r in docs if r["source"] == "src1"]
    allv = sorted(xs + ys)
    from collections import Counter

    cnt = Counter(allv)
    # average ranks
    rank, ranks = 1, {}
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = rank + (t - 1) / 2
        rank += t
    ranksum_a = sum(ranks[v] for v in xs)
    na, nb, n = len(xs), len(ys), len(allv)
    u = ranksum_a - na * (na + 1) / 2
    tie = sum(t**3 - t for t in cnt.values())
    var = (na * nb / 12) * ((n + 1) - tie / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    got = _q("dq_mann_whitney_test")(spark, SF_ORACLE).collect()[0]
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["u_statistic"] - u) < 1e-4
    assert abs(got["z_score"] - z) < 1e-4
    # same-generator sources: no strong dominance expected
    assert abs(got["z_score"]) < 5


def test_levene_nonnegative_and_dofs(spark):
    r = _q("dq_levene_test")(spark, SF_ORACLE).collect()[0]
    assert r["levene_w"] >= 0
    assert r["dof_between"] == 4
    assert r["dof_within"] > 100
    # homogeneous synthetic variances: W should be modest
    assert r["levene_w"] < 20
