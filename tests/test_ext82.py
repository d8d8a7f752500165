"""Property tests for extension batch 82: AMS unbiasedness mechanics and
Platt calibration improvement."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_ams_f2_within_band(spark):
    row = _q("sketch_ams_f2_check")(spark, SF_ORACLE).collect()[0]
    assert row["f2_exact"] > 0
    assert row["bound_ok"]
    assert 0.2 <= row["ratio"] <= 5.0


def test_platt_scaling_calibrates(spark):
    row = _q("quality_platt_scaling")(spark, SF_ORACLE).collect()[0]
    assert row["n_bins"] == 100
    # Brier of a calibrated probability is bounded by the worst case 0.25
    # plus irreducible noise; sanity: finite, in [0, 1].
    assert 0.0 <= row["brier_calibrated"] <= 1.0
    # monotone score->probability map: slope sign is determined by the
    # data; the fit must have converged to finite coefficients
    assert abs(row["platt_a"]) < 100 and abs(row["platt_b"]) < 100
