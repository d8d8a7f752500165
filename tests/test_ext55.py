"""Property tests for extension batch 55: conformal coverage, DiD,
popularity hit rate."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_conformal_coverage_guarantee(spark):
    r = _q("forecast_conformal_coverage")(spark, SF_ORACLE).collect()[0]
    assert r["n_cal"] > 0 and r["n_test"] > 0
    assert r["q_hat"] > 0
    # the conformal guarantee with binomial slack
    assert r["coverage_ok"] is True
    assert 0.8 <= r["coverage"] <= 1.0


def test_did_null_cohort_near_zero(spark):
    r = _q("ab_diff_in_diff")(spark, SF_ORACLE).collect()[0]
    assert r["std_error"] > 0
    # hash cohort with no real treatment: estimate within 5 SE of zero
    assert abs(r["did_estimate"]) < 5 * r["std_error"]
    assert r["n_treatment"] > 0 and r["n_control"] > 0


def test_popularity_hitrate_bounds(spark):
    r = _q("rec_popularity_hitrate")(spark, SF_ORACLE).collect()[0]
    assert 0 < r["n_test_customers"]
    assert 0 <= r["n_hit"] <= r["n_test_customers"]
    assert abs(r["hit_rate"] - round(r["n_hit"] / r["n_test_customers"], 6)) < 1e-9
    # 5 of 25 brands recommended; multi-line orders make hits common
    assert 0.05 < r["hit_rate"] <= 1.0
