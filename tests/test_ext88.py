"""Property tests for extension batch 88: isotonic fit vs sklearn-free
PAV reference, log-rank consistency with Cox."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def _pav(ns, ks):
    """Classic pool-adjacent-violators on (n, k) bins -> per-bin fits."""
    stack = []  # blocks of [n, k, n_bins]
    for n, k in zip(ns, ks):
        stack.append([n, k, 1])
        while len(stack) >= 2 and stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]:
            n2, k2, c2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += k2
            stack[-1][2] += c2
    res = []
    for n, k, c in stack:
        res.extend([k / n] * c)
    return res


def test_isotonic_matches_pav(spark):
    rows = sorted(
        _q("quality_isotonic_calibration")(spark, SF_ORACLE).collect(),
        key=lambda r: r["bin"],
    )
    assert len(rows) == 50
    iso = [r["iso_rate"] for r in rows]
    # monotone non-decreasing
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:])), iso
    ref = _pav([r["n"] for r in rows], [r["k"] for r in rows])
    for got, want in zip(iso, ref):
        assert abs(got - want) < 1e-4, (got, want)


def test_logrank_consistent_with_cox(spark):
    lr = _q("customer_logrank_test")(spark, SF_ORACLE).collect()[0]
    cox = _q("customer_cox_hazard")(spark, SF_ORACLE).collect()[0]
    assert lr["chi2"] >= 0
    assert 0 <= lr["p_value"] <= 1.0001
    # directional agreement: more observed than expected treated events
    # iff the treated hazard ratio exceeds 1
    direction_lr = lr["observed_treated"] > lr["expected_treated"]
    direction_cox = cox["hazard_ratio"] > 1.0
    assert direction_lr == direction_cox, (lr, cox)
