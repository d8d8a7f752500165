"""Property tests for extension batch 29: Pareto mass accounting,
stickiness ordering invariants, HHI range bounds."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_abc_classes_partition_revenue_mass(spark):
    rows = _q("inventory_abc_classes")(spark, SF_ORACLE).collect()
    assert rows
    by_class: dict[str, float] = {"A": 0.0, "B": 0.0, "C": 0.0}
    total = sum(r["revenue"] for r in rows)
    for r in rows:
        by_class[r["abc_class"]] += r["revenue"]
        assert 0.0 < r["cum_share"] <= 1.0 + 1e-9
    # A holds ~80% of revenue (the cut is on cumulative share; the part
    # COUNT in A depends on the distribution — near-uniform on this
    # synthetic corpus, heavy-tailed in real inventories).
    assert 0.75 <= by_class["A"] / total <= 0.81
    # Classes are contiguous in the ranking: max A cum_share < min B < min C.
    a_max = max(r["cum_share"] for r in rows if r["abc_class"] == "A")
    b_min = min(r["cum_share"] for r in rows if r["abc_class"] == "B")
    assert a_max <= 0.8 < b_min


def test_stickiness_ordering_and_ranges(spark):
    rows = _q("events_stickiness_ratios")(spark, SF_ORACLE).collect()
    assert len(rows) == 30
    for r in rows:
        assert r["dau"] <= r["wau"] <= r["mau"]
        assert 0.0 < r["dau_mau"] <= 1.0
        assert 0.0 < r["wau_mau"] <= 1.0
        assert r["dau_mau"] <= r["wau_mau"]


def test_hhi_in_valid_range(spark):
    rows = _q("market_concentration_hhi")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_nations"] - 1e-9 <= r["hhi"] <= 1.0 + 1e-9
        assert -1e-6 <= r["hhi_normalized"] <= 1.0 + 1e-9
