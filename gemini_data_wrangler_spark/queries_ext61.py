"""Round-2 extensions, batch 61: MMR diversified retrieval and
embedding split-drift.

Scale notes:
- MMR (Carbonell & Goldstein 1998) diversifies a top-k result:
  iteratively select argmax λ·relevance − (1−λ)·max-similarity-to-
  already-selected. The iteration is inherently sequential IN K but
  bounded: it runs inside a grouped `applyInPandas` over each query's
  candidate pool (≤ the over-fetch size), so the cluster parallelizes
  across queries while each group's O(k·|pool|) loop stays in one
  Arrow batch — the standard shape for bounded per-group algorithms.
- SPLIT DRIFT compares per-label centroids between two deterministic
  halves of the corpus: distance gated against the sampling-noise
  scale √(trace(Σ)·(1/n₁+1/n₂)). Centroids are per-dimension averages
  (explode + aggregate, linear); an honest split should sit within a
  few noise units — a real ingestion drift pushes it out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.queries import register
from gemini_data_wrangler_spark.sources.readers import load_sf_tables


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_sf_tables(spark, sf_dir)[name]


# ---------------------------------------------------------------------------
# MMR diversified top-k
# ---------------------------------------------------------------------------
_MMR_K = 5
_MMR_POOL = 30
_MMR_LAMBDA = 0.7


def mmr_topk(
    emb: DataFrame, query_ids: list[int], k: int = _MMR_K, pool: int = _MMR_POOL,
    lam: float = _MMR_LAMBDA,
) -> DataFrame:
    """Maximal-marginal-relevance top-k: over-fetch a relevance pool via
    exact cosine, then greedily pick items maximizing
    λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s). The greedy loop runs
    per query group in one Arrow batch (pool ≤ {_MMR_POOL}); ties break
    by vec_id so the selection is deterministic."""
    import numpy as np
    import pandas as pd

    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )

    q = queries_from_ids(emb, query_ids)
    cand = cosine_topk(emb, q, k=pool).select("query_id", "vec_id", "sim")
    vecs = emb.select("vec_id", F.col("embedding").alias("_v"))
    pool_df = cand.join(vecs, "vec_id")

    schema = "query_id long, vec_id long, sim double, mmr_rank int"

    def select_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["sim", "vec_id"], ascending=[False, True])
        M = np.array(pdf["_v"].tolist(), dtype=np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = M @ M.T
        rel = pdf["sim"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        chosen: list[int] = []
        for _ in range(min(k, len(pdf))):
            best, best_score = None, None
            for i in range(len(pdf)):
                if i in chosen:
                    continue
                div = max(S[i][j] for j in chosen) if chosen else 0.0
                score = lam * rel[i] - (1 - lam) * div
                key = (score, -ids[i])
                if best is None or key > best_score:
                    best, best_score = i, key
            chosen.append(best)
        out = pdf.iloc[chosen][["query_id", "vec_id", "sim"]].copy()
        out["mmr_rank"] = range(1, len(chosen) + 1)
        return out

    return pool_df.groupBy("query_id").applyInPandas(select_group, schema)


@register("similarity_mmr_topk", None)  # greedy selection: rows-only; gated below
def similarity_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS

    emb = _table(spark, sf_dir, "embeddings")
    return mmr_topk(emb, _ANN_QUERY_IDS)


def _mmr_check_oracle() -> str:
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS

    return (
        "SELECT vec_id AS query_id, TRUE AS diversity_ok, TRUE AS relevance_ok "
        "FROM embeddings WHERE vec_id IN ({ids})"
    ).format(ids=", ".join(str(i) for i in _ANN_QUERY_IDS))


@register("similarity_mmr_check", _mmr_check_oracle())
def similarity_mmr_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated MMR quality contract: per query, the MMR set's
    maximum intra-set similarity must not exceed the plain top-k set's
    (diversity never worse), and the MMR set's top-1 must equal the
    exact top-1 (λ < 1 never displaces the best hit — greedy picks it
    first when nothing is selected yet). Pinned-TRUE oracle: a
    regression in either property becomes a driver hash MISMATCH."""
    from gemini_data_wrangler_spark.functions.vectors import cosine_similarity
    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS

    emb = _table(spark, sf_dir, "embeddings")
    q = queries_from_ids(emb, _ANN_QUERY_IDS)
    mmr = mmr_topk(emb, _ANN_QUERY_IDS).select("query_id", "vec_id", "mmr_rank")
    plain = cosine_topk(emb, q, k=_MMR_K).select("query_id", "vec_id", "rank")
    vecs = emb.select("vec_id", F.col("embedding").alias("_v"))

    def max_intra(df: DataFrame, label: str) -> DataFrame:
        a = df.join(vecs, "vec_id").select(
            "query_id", F.col("vec_id").alias("ia"), F.col("_v").alias("_va")
        )
        b = df.join(vecs, "vec_id").select(
            F.col("query_id").alias("qb"), F.col("vec_id").alias("ib"),
            F.col("_v").alias("_vb"),
        )
        return (
            a.join(b, (F.col("query_id") == F.col("qb")) & (F.col("ia") < F.col("ib")))
            .withColumn("_s", F.round(cosine_similarity(F.col("_va"), F.col("_vb")), 6))
            .groupBy("query_id")
            .agg(F.max("_s").alias(label))
        )

    div = max_intra(mmr, "mmr_max_intra").join(
        max_intra(plain, "plain_max_intra"), "query_id"
    )
    top1 = (
        mmr.filter(F.col("mmr_rank") == 1)
        .select("query_id", F.col("vec_id").alias("mmr_top1"))
        .join(
            plain.filter(F.col("rank") == 1).select(
                "query_id", F.col("vec_id").alias("plain_top1")
            ),
            "query_id",
        )
    )
    return (
        div.join(top1, "query_id")
        .select(
            "query_id",
            (F.col("mmr_max_intra") <= F.col("plain_max_intra") + 1e-9).alias(
                "diversity_ok"
            ),
            (F.col("mmr_top1") == F.col("plain_top1")).alias("relevance_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding split drift: centroid distance between deterministic halves
# ---------------------------------------------------------------------------
@register(
    "embedding_split_drift",
    """
    WITH halves AS (
      SELECT label, embedding,
             CASE WHEN md5(CAST(vec_id AS VARCHAR)) < '8' THEN 'a' ELSE 'b' END AS half
      FROM embeddings
    ), dims AS (
      SELECT label, half, u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS v
      FROM halves, unnest(generate_series(1, len(embedding))) AS u(i)
    ), cent AS (
      SELECT label, half, dim, avg(v) AS c, var_samp(v) AS var_v, count(*) AS n
      FROM dims GROUP BY 1, 2, 3
    ), paired AS (
      SELECT a.label, a.dim, a.c AS ca, b.c AS cb,
             a.var_v AS va, a.n AS na, b.n AS nb
      FROM (SELECT * FROM cent WHERE half = 'a') a
      JOIN (SELECT * FROM cent WHERE half = 'b') b
        ON a.label = b.label AND a.dim = b.dim
    )
    SELECT label,
           round(sqrt(sum((ca - cb) * (ca - cb))), 6) AS centroid_dist,
           round(sqrt(sum(va) * (1.0 / any_value(na) + 1.0 / any_value(nb))), 6)
             AS noise_scale,
           (sqrt(sum((ca - cb) * (ca - cb)))
              <= 4 * sqrt(sum(va) * (1.0 / any_value(na) + 1.0 / any_value(nb))))
             AS within_noise
    FROM paired GROUP BY label
    """,
)
def embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift screen: per label, the distance between the
    centroids of two deterministic md5 halves of the corpus, against
    the sampling-noise scale √(trace(Σ)·(1/n₁+1/n₂)) — an honest random
    split stays within ~4 noise units (`within_noise`); a real
    distribution shift between ingestion batches lands far outside.
    Per-dimension explode + hash aggregate (linear in vectors × dims),
    then a label-bounded reduction — the embedding twin of
    `dq_psi_price_drift`."""
    emb = _table(spark, sf_dir, "embeddings")
    halves = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim0", "v0"),
        F.when(F.md5(F.col("vec_id").cast("string")) < "8", "a")
        .otherwise("b")
        .alias("half"),
    ).select(
        "label", "half", (F.col("dim0") + 1).alias("dim"),
        F.col("v0").cast("double").alias("v"),
    )
    cent = halves.groupBy("label", "half", "dim").agg(
        F.avg("v").alias("c"), F.var_samp("v").alias("var_v"), F.count(F.lit(1)).alias("n")
    )
    a = cent.filter(F.col("half") == "a").select(
        "label", "dim", F.col("c").alias("ca"), F.col("var_v").alias("va"),
        F.col("n").alias("na"),
    )
    b = cent.filter(F.col("half") == "b").select(
        "label", "dim", F.col("c").alias("cb"), F.col("n").alias("nb")
    )
    paired = a.join(b, ["label", "dim"])
    dist = F.sqrt(F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))))
    noise = F.sqrt(
        F.sum("va") * (1.0 / F.first("na") + 1.0 / F.first("nb"))
    )
    return paired.groupBy("label").agg(
        F.round(dist, 6).alias("centroid_dist"),
        F.round(noise, 6).alias("noise_scale"),
        (dist <= 4 * noise).alias("within_noise"),
    )
