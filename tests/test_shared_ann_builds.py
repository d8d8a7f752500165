"""Round-7 optimization pins: the session-shared ANN builds
(`shared_builds.ann_exact_topk` / `mmr_list` / `approx_topk_list` /
`pq_index`) must equal the un-memoized builds they replace, and reuse
must return the memoized frame (no rebuild).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_ann_exact_topk_prefix_matches_direct_topk(spark):
    # The load-bearing claim: the top-10 prefix of the depth-30 cached
    # ranked list is IDENTICAL to a direct k=10 brute-force ranking
    # (total order: sim rounded to 6 desc, vec_id asc).
    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS
    from gemini_data_wrangler_spark.shared_builds import ann_exact_topk
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_SMALL)["embeddings"]
    direct = cosine_topk(emb, queries_from_ids(emb, _ANN_QUERY_IDS), k=10)
    shared = ann_exact_topk(spark, SF_SMALL, reuse=False, k=10)
    cols = ["query_id", "vec_id", "sim", "rank"]
    assert _rows(shared, cols) == _rows(direct, cols)
    # reuse returns the memoized frame, filtered — same rows again
    again = ann_exact_topk(spark, SF_SMALL, reuse=True, k=10)
    assert _rows(again, cols) == _rows(direct, cols)
    with pytest.raises(ValueError):
        ann_exact_topk(spark, SF_SMALL, reuse=True, k=1000)


def test_mmr_list_matches_fresh_mmr_topk(spark):
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS
    from gemini_data_wrangler_spark.queries_ext61 import mmr_topk
    from gemini_data_wrangler_spark.shared_builds import mmr_list
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_SMALL)["embeddings"]
    fresh = mmr_topk(emb, _ANN_QUERY_IDS)
    shared = mmr_list(spark, SF_SMALL, reuse=False)
    cols = ["query_id", "vec_id", "mmr_rank"]
    assert _rows(shared, cols) == _rows(fresh, cols)
    assert mmr_list(spark, SF_SMALL, reuse=True) is shared


@pytest.mark.parametrize("method", ["lsh", "quantized", "rerank"])
def test_approx_topk_list_matches_fresh_search(spark, method):
    from gemini_data_wrangler_spark.operators.similarity import (
        lsh_topk,
        quantized_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS
    from gemini_data_wrangler_spark.queries_ext42 import _rerank_topk
    from gemini_data_wrangler_spark.shared_builds import approx_topk_list
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    builders = {"lsh": lsh_topk, "quantized": quantized_topk, "rerank": _rerank_topk}
    emb = load_sf_tables(spark, SF_SMALL)["embeddings"]
    q = queries_from_ids(emb, _ANN_QUERY_IDS)
    fresh = builders[method](emb, q, k=10)
    shared = approx_topk_list(spark, SF_SMALL, method, reuse=False)
    cols = ["query_id", "vec_id", "rank"]
    assert _rows(shared, cols) == _rows(fresh, cols)
    assert approx_topk_list(spark, SF_SMALL, method, reuse=True) is shared


def test_approx_topk_list_unknown_method_raises(spark):
    from gemini_data_wrangler_spark.shared_builds import approx_topk_list

    with pytest.raises(ValueError):
        approx_topk_list(spark, SF_SMALL, "hnsw", reuse=True)


def test_pq_index_injection_matches_fresh_encode(spark):
    from gemini_data_wrangler_spark.operators.similarity import (
        pq_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS
    from gemini_data_wrangler_spark.shared_builds import pq_index
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_SMALL)["embeddings"]
    q = queries_from_ids(emb, _ANN_QUERY_IDS)
    fresh = pq_topk(emb, q, k=10)
    idx = pq_index(spark, SF_SMALL, reuse=False)
    injected = pq_topk(emb, q, k=10, index=idx)
    cols = ["query_id", "vec_id", "sim", "rank"]
    assert _rows(injected, cols) == _rows(fresh, cols)
    assert pq_index(spark, SF_SMALL, reuse=True) is idx
