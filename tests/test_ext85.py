"""Property tests for extension batch 85: mSPRT monotonicity, EB
shrinkage direction."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_msprt_p_monotone_nonincreasing(spark):
    rows = sorted(
        _q("ab_msprt_always_valid")(spark, SF_ORACLE).collect(), key=lambda r: r["day"]
    )
    assert rows
    ps = [r["always_valid_p"] for r in rows]
    assert all(0 < p <= 1 for p in ps)
    assert all(a >= b - 1e-9 for a, b in zip(ps, ps[1:])), "p must never increase"
    # under a null split the test should not fire at the 5% level often;
    # sanity: final p strictly positive (no degenerate blow-up)
    assert ps[-1] > 0


def test_eb_shrinkage_pulls_toward_prior(spark):
    rows = _q("stats_eb_shrunk_return_rates")(spark, SF_ORACLE).collect()
    assert len(rows) == 25
    a, b = rows[0]["alpha"], rows[0]["beta"]
    assert a > 0 and b > 0
    mu = a / (a + b)
    for r in rows:
        # posterior mean lies strictly between the raw rate and the prior
        lo, hi = sorted([r["raw_rate"], mu])
        assert lo - 1e-9 <= r["shrunk_rate"] <= hi + 1e-9, r
    # ranking by shrunk rate, descending
    sr = [r["shrunk_rate"] for r in rows]
    assert sr == sorted(sr, reverse=True)
