"""Property tests for extension batch 42: content-defined chunking,
winnowing fingerprints, phrase search, retrieve-then-rerank."""

from __future__ import annotations

import statistics

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_cdc_chunk_stats_sane(spark):
    rows = _q("chunk_content_defined")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_distinct_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["dup_chunk_ratio"] < 1.0
        # boundary probability 1/8 -> mean chunk ~8 words, pulled down by
        # end-of-document truncation on short docs.
        assert 2.0 < r["avg_chunk_words"] < 14.0


def test_winnowing_density_and_sharing(spark):
    rows = _q("text_winnowing_fingerprint")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_fingerprints"]
        assert 0 <= r["n_shared_fp"] <= r["n_fingerprints"]
    # Expected fingerprint density is ~2/(w+1) = 1/3 of grams (clipped tail
    # windows push it slightly up on short docs).
    dens = statistics.mean(r["n_fingerprints"] / r["n_grams"] for r in rows)
    assert 0.2 < dens < 0.6


def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a run of >= w+k-1 words must share a fingerprint."""
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    # Find a pair of docs sharing an 8-word span (w+k-1 = 8).
    ws = F.split(F.trim(F.lower("text")), r"\s+")
    spans = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 7),"
                    " i -> array_join(slice(ws, i, 8), ' '))"
                )
            ).alias("span"),
        )
        .groupBy("span")
        .agg(F.collect_set("doc_id").alias("ds"))
        .filter(F.size("ds") >= 2)
        .limit(1)
        .collect()
    )
    if not spans:  # corpus without an 8-word shared run: nothing to assert
        return
    a, b = sorted(spans[0]["ds"])[:2]
    shared = {
        r["doc_id"]: r["n_shared_fp"]
        for r in _q("text_winnowing_fingerprint")(spark, SF_ORACLE).collect()
        if r["doc_id"] in (a, b)
    }
    assert shared[a] >= 1 and shared[b] >= 1


def test_phrase_search_docs_contain_phrase(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("text_phrase_search")(spark, SF_ORACLE).collect()
    assert rows
    phrase = rows[0]["phrase"]
    assert len(phrase.split(" ")) == 3
    texts = {
        r["doc_id"]: r["text"].strip().lower()
        for r in load_sf_tables(spark, SF_ORACLE)["documents"].collect()
    }
    for r in rows:
        body = " ".join(texts[r["doc_id"]].split())
        assert phrase in body
        assert r["n_occ"] >= 1


def test_rerank_matches_exact_scores(spark):
    """Reranked sims must equal the exact cosine for the same pairs, and
    recall@10 must clear the gate floor for every query."""
    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"]
    q = queries_from_ids(emb, _ANN_QUERY_IDS)
    exact = {
        (r["query_id"], r["vec_id"]): r["sim"]
        for r in cosine_topk(emb, q, k=10).collect()
    }
    rer = _q("similarity_rerank_topk")(spark, SF_ORACLE).collect()
    assert len(rer) == 10 * len(_ANN_QUERY_IDS)
    for r in rer:
        key = (r["query_id"], r["vec_id"])
        if key in exact:
            assert r["sim"] == exact[key]
    gates = _q("similarity_rerank_recall")(spark, SF_ORACLE).collect()
    assert gates and all(r["recall_ok"] for r in gates)
