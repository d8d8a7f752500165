"""Property tests for extension batch 44: filter-evaluation metrics."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_auc_bounds_and_counts(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    r = _q("quality_score_auc")(spark, SF_ORACLE).collect()[0]
    assert 0.0 <= r["auc"] <= 1.0
    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    n_en = docs.filter("lang = 'en'").count()
    assert r["n_pos"] == n_en
    assert r["n_pos"] + r["n_neg"] == docs.count()
    # Random word-salad corpus: the stopword score carries no real
    # language signal, so AUC should hover near chance.
    assert 0.3 < r["auc"] < 0.7


def test_auc_against_per_row_rank_formula(spark):
    """Histogram-sweep AUC must equal the classic per-row rank-sum AUC."""
    from gemini_data_wrangler_spark.queries_ext44 import _scored

    rows = _scored(spark, SF_ORACLE).collect()
    scored = sorted((r["score"], r["pos"]) for r in rows)
    # average ranks with ties
    from collections import defaultdict

    by_score = defaultdict(list)
    for i, (s, p) in enumerate(scored, start=1):
        by_score[s].append((i, p))
    rank_sum_pos = 0.0
    n_pos = sum(p for _, p in scored)
    n_neg = len(scored) - n_pos
    for s, entries in by_score.items():
        avg_rank = sum(i for i, _ in entries) / len(entries)
        rank_sum_pos += avg_rank * sum(p for _, p in entries)
    auc_ref = (rank_sum_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    got = _q("quality_score_auc")(spark, SF_ORACLE).collect()[0]["auc"]
    assert abs(got - auc_ref) < 1e-6


def test_calibration_bins_partition_rows(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("quality_calibration_bins")(spark, SF_ORACLE).collect()
    assert 1 <= len(rows) <= 10
    assert sum(r["n"] for r in rows) == load_sf_tables(spark, SF_ORACLE)[
        "documents"
    ].count()
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["pos_rate"] <= 1.0


def test_kappa_identity(spark):
    r = _q("quality_cohens_kappa")(spark, SF_ORACLE).collect()[0]
    assert 0.0 <= r["po"] <= 1.0 and 0.0 < r["pe"] < 1.0
    assert abs(r["kappa"] - round((r["po"] - r["pe"]) / (1 - r["pe"]), 4)) < 0.01
    assert -1.0 <= r["kappa"] <= 1.0


def test_effect_size_consistency(spark):
    r = _q("dq_effect_size_d")(spark, SF_ORACLE).collect()[0]
    assert r["pooled_sd"] > 0
    assert (
        abs(
            r["cohens_d"]
            - round((r["mean_purchase"] - r["mean_click"]) / r["pooled_sd"], 4)
        )
        < 0.01
    )
