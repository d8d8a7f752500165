"""Property tests for extension batch 43: dependence and profiling
statistics."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_mutual_information_bounds(spark):
    r = _q("feature_mutual_information")(spark, SF_ORACLE).collect()[0]
    # 0 <= MI <= min(H(X), H(Y)); small slack for round-6.
    assert -1e-6 <= r["mi_nats"] <= min(r["entropy_x"], r["entropy_y"]) + 1e-6
    assert r["entropy_x"] > 0 and r["entropy_y"] > 0
    # Priorities are ~uniform over 5 values: H(X) <= ln 5.
    assert r["entropy_x"] <= math.log(5) + 1e-6


def test_correlation_matrix_properties(spark):
    rows = _q("profile_correlation_matrix")(spark, SF_ORACLE).collect()
    assert len(rows) == 6  # C(4,2) upper-triangle pairs
    for r in rows:
        assert -1.0 <= r["r"] <= 1.0
        assert r["col_a"] < r["col_b"] or r["col_a"] != r["col_b"]
    # The synthetic generator draws these measures independently, so no
    # pair should look strongly correlated — |r| stays small.
    assert all(abs(r["r"]) < 0.5 for r in rows)


def test_functional_dependency_verdicts(spark):
    rows = {r["fd"]: r for r in _q("dq_functional_dependency")(spark, SF_ORACLE).collect()}
    assert rows["part.p_partkey -> p_brand"]["holds"] is True
    assert rows["part.p_partkey -> p_brand"]["violation_rate"] == 0.0
    for fd, r in rows.items():
        assert 0 <= r["n_violating"] <= r["n_groups"]
        assert (r["n_violating"] == 0) == r["holds"]


def test_anova_f_nonnegative_and_consistent(spark):
    r = _q("dq_anova_f")(spark, SF_ORACLE).collect()[0]
    assert r["ms_between"] >= 0 and r["ms_within"] > 0
    assert abs(r["f_stat"] - round(r["ms_between"] / r["ms_within"], 4)) < 0.02
