"""Property tests for extension batch 39: range-search consistency with
top-k, OOV accounting."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_range_search_consistent_with_topk(spark):
    rng = {
        (r["query_id"], r["vec_id"]): r["sim"]
        for r in _q("similarity_range_search")(spark, SF_ORACLE).collect()
    }
    assert rng
    assert all(s >= 0.35 for s in rng.values())
    topk = _q("similarity_cosine_topk")(spark, SF_ORACLE).collect()
    # Every top-k hit above the range threshold must be a range hit with
    # the identical similarity.
    for r in topk:
        if r["sim"] >= 0.35 and r["query_id"] in {0, 1, 2, 3, 4}:
            assert rng[(r["query_id"], r["vec_id"])] == r["sim"]


def test_oov_rate_accounting(spark):
    rows = _q("vocab_oov_rate")(spark, SF_ORACLE).collect()
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - round(r["n_oov"] / r["n_tokens"], 6)) < 1e-9
    # A 30-word vocab on this corpus covers much but not all.
    import statistics

    mean_oov = statistics.mean(r["oov_rate"] for r in rows)
    assert 0.0 < mean_oov < 0.9
