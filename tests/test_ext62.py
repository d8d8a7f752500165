"""Property tests for extension batch 62: BH FDR, Hodges–Lehmann."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_bh_procedure_invariants(spark):
    rows = sorted(
        _q("dq_benjamini_hochberg")(spark, SF_ORACLE).collect(),
        key=lambda r: r["p_rank"],
    )
    assert len(rows) == 25
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    assert all(0.0 <= p <= 1.0 for p in ps)
    # rejected set is a prefix of the p-ordered list (step-up property)
    rejected = [r["rejected"] for r in rows]
    if any(rejected):
        last_true = max(i for i, x in enumerate(rejected) if x)
        assert all(rejected[: last_true + 1])
        assert not any(rejected[last_true + 1 :])
        # the boundary rank satisfies the BH inequality
        assert ps[last_true] <= 0.05 * (last_true + 1) / 25
    # nations are hash-uniform: very few (usually zero) rejections
    assert sum(rejected) <= 3


def test_bh_p_values_match_ks_formula(spark):
    """Spot-check one nation's p-value against a direct KS computation."""
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    cust = load_sf_tables(spark, SF_ORACLE)["customer"].collect()
    rows = {r["nation"]: r for r in _q("dq_benjamini_hochberg")(spark, SF_ORACLE).collect()}
    g0 = sorted(rows)[0]
    xs = sorted(r["c_acctbal"] for r in cust if r["c_nationkey"] == g0)
    ys = sorted(r["c_acctbal"] for r in cust if r["c_nationkey"] != g0)
    grid = sorted(set(xs) | set(ys))
    import bisect

    d = max(
        abs(bisect.bisect_right(xs, v) / len(xs) - bisect.bisect_right(ys, v) / len(ys))
        for v in grid
    )
    lam = d * math.sqrt(len(xs) * len(ys) / (len(xs) + len(ys)))
    p = min(2 * math.exp(-2 * lam * lam), 1.0)
    assert abs(rows[g0]["ks_d"] - d) < 1e-6
    assert abs(rows[g0]["p_value"] - p) < 1e-4


def test_hodges_lehmann_robust_and_exact(spark):
    import statistics

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    got = {r["nation"]: r for r in _q("agg_hodges_lehmann")(spark, SF_ORACLE).collect()}
    cust = load_sf_tables(spark, SF_ORACLE)["customer"].collect()
    g0 = sorted(got)[0]
    xs = [r["c_acctbal"] for r in cust if r["c_nationkey"] == g0]
    walsh = [(a + b) / 2 for i, a in enumerate(xs) for b in xs[i:]]
    assert got[g0]["n_walsh"] == len(walsh)
    assert abs(got[g0]["hodges_lehmann"] - statistics.median(walsh)) < 1e-4
