"""Property tests for extension batch 50: hard negatives, length
buckets, leakage audit, importance weights."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_hard_negatives_label_mismatch_and_harder_than_random(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("embedding_hard_negatives")(spark, SF_ORACLE).collect()
    assert len(rows) == 3 * 5
    labels = {
        r["vec_id"]: r["label"]
        for r in load_sf_tables(spark, SF_ORACLE)["embeddings"].collect()
    }
    for r in rows:
        assert r["label"] != labels[r["anchor_id"]]
        assert r["label"] == labels[r["vec_id"]]
        assert 1 <= r["rank"] <= 3
    # hard negatives must be more similar than the typical random pair
    sims = [r["sim"] for r in rows]
    assert min(sims) > 0.0


def test_length_buckets_account_for_all_docs(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("pack_length_buckets")(spark, SF_ORACLE).collect()
    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        cap = r["bucket_cap"]
        assert cap & (cap - 1) == 0  # power of two
        assert 0.0 <= r["padding_waste"] < 0.5  # bucket is within 2x of len
        assert r["real_tokens"] <= r["padded_tokens"]


def test_group_split_has_zero_leakage(spark):
    r = _q("split_group_leakage_audit")(spark, SF_ORACLE).collect()[0]
    assert r["group_hash_leaky_customers"] == 0
    assert r["row_hash_leaky_customers"] > 0  # row hash leaks multi-order customers
    assert 0.0 < r["row_hash_leak_rate"] <= 1.0
    assert r["n_customers"] > 0


def test_importance_weights_ess(spark):
    rows = _q("sample_importance_weights")(spark, SF_ORACLE).collect()
    assert rows
    ess = rows[0]["ess_fraction"]
    assert all(r["ess_fraction"] == ess for r in rows)
    assert 0.0 < ess <= 1.0  # Cauchy-Schwarz bound
    for r in rows:
        assert r["weight"] > 0
    # sanity: weighted source mass matches target proportions in sign --
    # weights must not all be equal unless distributions are identical
    assert len({r["weight"] for r in rows}) > 1
