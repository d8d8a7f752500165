"""Property tests for extension batch 97: fairness-gap consistency and
partial-dependence monotonicity vs the fitted slope."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_fairness_gaps_consistent(spark):
    rows = _q("quality_fairness_metrics")(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    pr = [r["positive_rate"] for r in rows]
    tpr = [r["tpr"] for r in rows]
    fpr = [r["fpr"] for r in rows]
    gaps = {(r["parity_gap"], r["tpr_gap"], r["fpr_gap"]) for r in rows}
    assert len(gaps) == 1
    pg, tg, fg = gaps.pop()
    assert abs(pg - (max(pr) - min(pr))) < 1e-5
    assert abs(tg - (max(tpr) - min(tpr))) < 1e-5
    assert abs(fg - (max(fpr) - min(fpr))) < 1e-5
    for r in rows:
        assert 0 <= r["tpr"] <= 1 and 0 <= r["fpr"] <= 1


def test_partial_dependence_monotone_with_slope(spark):
    pd = sorted(
        _q("stats_logistic_partial_dependence")(spark, SF_ORACLE).collect(),
        key=lambda r: r["price_bucket"],
    )
    assert len(pd) == 5
    beta = _q("stats_logistic_regression")(spark, SF_ORACLE).collect()[0]
    vals = [r["partial_dependence"] for r in pd]
    assert all(0 < v < 1 for v in vals)
    if beta["b2"] > 0:
        assert vals == sorted(vals)
    elif beta["b2"] < 0:
        assert vals == sorted(vals, reverse=True)
