"""Property tests for extension batch 28: Holt recursion vs a pure-Python
reference, sketch bound tightness, HLL estimate sanity."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_holt_matches_python_recursion(spark):
    rows = sorted(
        _q("forecast_holt_linear")(spark, SF_ORACLE).collect(), key=lambda r: r["d"]
    )
    assert len(rows) == 30
    a, b = 0.3, 0.1
    lvl, tr = rows[0]["total"], 0.0
    assert abs(rows[0]["level"] - round(lvl, 6)) < 1e-9
    for r in rows[1:]:
        new_lvl = a * r["total"] + (1 - a) * (lvl + tr)
        tr = b * (new_lvl - lvl) + (1 - b) * tr
        lvl = new_lvl
        assert abs(r["level"] - round(lvl, 6)) < 2e-6
        assert abs(r["trend"] - round(tr, 6)) < 2e-6
        assert abs(r["forecast_next"] - round(lvl + tr, 6)) < 2e-6


def test_quantile_sketch_bounds_all_hold(spark):
    rows = _q("sketch_quantile_histogram_check")(spark, SF_ORACLE).collect()
    assert {r["q"] for r in rows} == {0.25, 0.5, 0.9, 0.99}
    assert all(r["bound_ok"] for r in rows)
    # Quantiles are monotone.
    by_q = sorted(rows, key=lambda r: r["q"])
    ex = [r["exact_q"] for r in by_q]
    assert ex == sorted(ex)


def test_hll_sliding_reach_within_bound_everywhere(spark):
    rows = _q("events_reach_hll_sliding_check")(spark, SF_ORACLE).collect()
    assert len(rows) == 30
    assert all(r["bound_ok"] for r in rows)
    assert all(r["exact_reach"] > 0 for r in rows)
