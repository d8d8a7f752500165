"""Property tests for extension batch 56: bitmap membership, Brier
decomposition, MRR."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_bitmap_intersections_exact(spark):
    rows = _q("sketch_bitmap_membership")(spark, SF_ORACLE).collect()
    assert len(rows) == 10  # C(5,2) segment pairs
    for r in rows:
        assert r["bitmap_exact"] is True
        assert r["bitmap_intersection"] == r["exact_intersection"]
        assert r["bitmap_intersection"] > 0


def test_brier_decomposition_identity(spark):
    r = _q("quality_brier_decomposition")(spark, SF_ORACLE).collect()[0]
    assert r["decomposition_ok"] is True
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    assert 0.0 < r["uncertainty"] <= 0.25  # p(1-p) max at 0.25
    # sanity: brier close to rel - res + unc
    assert abs(r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"])) < 0.01


def test_mrr_bounds_and_relation_to_hitrate(spark):
    mrr = _q("rec_popularity_mrr")(spark, SF_ORACLE).collect()[0]
    assert 0.0 < mrr["mrr"] <= 1.0
    assert 0.0 < mrr["worst_rr"] <= mrr["mrr"]
    hr = _q("rec_popularity_hitrate")(spark, SF_ORACLE).collect()[0]
    # every test customer here bought SOME ranked brand, so MRR counts
    # all of them; hit-rate counts only top-5 hits
    assert mrr["n_customers"] >= hr["n_hit"]
