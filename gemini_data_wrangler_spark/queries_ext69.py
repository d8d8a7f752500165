"""Round-2 extensions, batch 69: mutual-kNN components (embedding
clustering), leave-one-out target encoding, decision-stump split search,
geometric/harmonic means.

Scale notes:
- kNN COMPONENTS composes two already-scale-proven pieces: the tiled
  exact kNN kernel (O(n·k·blocks) candidates) and the iterative
  min-label CC (rounds = component diameter, `localCheckpoint`
  truncation). Mutual-kNN degree is ≤ k by construction, so components
  stay sparse — the regime CC likes.
- TARGET ENCODING is one grouped aggregate broadcast back over the
  scan with the self-exclusion identity (sum−x)/(n−1) — zero extra
  shuffles beyond the group stats, the leakage-free encode at any n.
- SPLIT SEARCH sweeps candidate thresholds over the DISTINCT-value
  histogram (prefix sums give left/right class counts per cut — the
  same histogram-not-rows move as the AUC sweep), so the ordered pass
  touches |distinct values| rows.
- GEO/HARMONIC means are single hash aggregates of ln(x) and 1/x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.queries import register
from gemini_data_wrangler_spark.sources.readers import load_sf_tables


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_sf_tables(spark, sf_dir)[name]


# ---------------------------------------------------------------------------
# Embedding clustering: connected components of the mutual-kNN graph
# ---------------------------------------------------------------------------
def _knn_cc_oracle() -> str:
    from gemini_data_wrangler_spark.operators.dedup import (
        connected_components_oracle_sql,
    )
    from gemini_data_wrangler_spark.queries_ext67 import _mutual_knn_oracle

    # the mutual-knn oracle already emits vec_u < vec_v pairs
    inner = _mutual_knn_oracle()
    cc = connected_components_oracle_sql(
        f"SELECT vec_u AS doc_a, vec_v AS doc_b FROM ({inner})"
    )
    return f"""
    WITH cc AS ({cc})
    SELECT doc_id AS vec_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM cc
    """


@register("similarity_knn_components", _knn_cc_oracle())
def similarity_knn_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding clustering by connected components over the MUTUAL-kNN
    graph: the parameter-light alternative to DBSCAN (no ε to tune —
    mutuality alone sparsifies hubs) and to k-means (no k — cluster
    count emerges). Output: every vector that has ≥1 mutual neighbor,
    its cluster id (min member id) and cluster size. Tiled exact kNN →
    one self-join for mutuality → large-star/small-star CC (the mutual-kNN
    graph has long chains, so star contraction's O(log² n) rounds beat
    min-label's diameter-many rounds here — measured 5.2→4.6 s at sf0.1
    and the gap widens with chain length)."""
    from gemini_data_wrangler_spark.operators.dedup import (
        connected_components_star,
    )
    from gemini_data_wrangler_spark.operators.similarity import mutual_knn_edges
    from gemini_data_wrangler_spark.shared_builds import knn_table

    emb = _table(spark, sf_dir, "embeddings")
    knn = knn_table(spark, sf_dir, reuse=True, k=5)
    edges = mutual_knn_edges(emb, k=5, knn=knn).select(
        F.col("vec_u").alias("doc_a"), F.col("vec_v").alias("doc_b")
    )
    cc = connected_components_star(edges)
    w = Window.partitionBy("cluster_id")
    return cc.select(
        F.col("doc_id").alias("vec_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding of a categorical feature
# ---------------------------------------------------------------------------
@register(
    "feature_target_encoding",
    """
    WITH g AS (
      SELECT c_nationkey AS cat, sum(c_acctbal) AS s, count(*) AS n
      FROM customer GROUP BY 1
    ), gm AS (SELECT avg(c_acctbal) AS mu FROM customer)
    SELECT c.c_custkey AS custkey, c.c_nationkey AS cat,
           CASE WHEN g.n > 1
                THEN round((g.s - c.c_acctbal) / (g.n - 1), 6)
                ELSE round((SELECT mu FROM gm), 6) END AS target_enc
    FROM customer c JOIN g ON c.c_nationkey = g.cat
    """,
)
def feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: replace each customer's nation with
    the mean account balance of the OTHER customers in that nation —
    (Σ−x)/(n−1), the identity that removes self-leakage without a second
    scan (singleton categories fall back to the global mean). One
    grouped aggregate broadcast back over the scan; the standard
    high-cardinality categorical encode for tree/linear models."""
    cust = _table(spark, sf_dir, "customer")
    g = cust.groupBy(F.col("c_nationkey").alias("cat")).agg(
        F.sum("c_acctbal").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mu = cust.agg(F.avg("c_acctbal").alias("mu"))
    return (
        cust.join(F.broadcast(g), cust["c_nationkey"] == g["cat"])
        .crossJoin(F.broadcast(mu))
        .select(
            F.col("c_custkey").alias("custkey"),
            "cat",
            F.when(
                F.col("n") > 1,
                F.round((F.col("s") - F.col("c_acctbal")) / (F.col("n") - 1), 6),
            )
            .otherwise(F.round(F.col("mu"), 6))
            .alias("target_enc"),
        )
    )


# ---------------------------------------------------------------------------
# Decision-stump split search (weighted Gini over the value histogram)
# ---------------------------------------------------------------------------
@register(
    "feature_best_split_gini",
    """
    WITH v AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS y
      FROM orders
    ), h AS (
      SELECT x, sum(y) AS p_v, count(*) - sum(y) AS n_v FROM v GROUP BY x
    ), sweep AS (
      SELECT x,
             sum(p_v) OVER w AS pl, sum(n_v) OVER w AS nl,
             (SELECT sum(p_v) FROM h) - sum(p_v) OVER w AS pr,
             (SELECT sum(n_v) FROM h) - sum(n_v) OVER w AS nr
      FROM h WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), scored AS (
      SELECT x AS threshold,
             pl + nl AS n_left, pr + nr AS n_right,
             round((
               (pl + nl) * (1 - (pl * pl + CAST(nl AS DOUBLE) * nl) / ((pl + nl) * (pl + nl)))
               + (pr + nr) * (1 - (pr * pr + CAST(nr AS DOUBLE) * nr) / ((pr + nr) * (pr + nr)))
             ) / ((SELECT sum(p_v + n_v) FROM h)), 6) AS weighted_gini
      FROM sweep WHERE pr + nr > 0
    )
    SELECT threshold, n_left, n_right, weighted_gini
    FROM scored
    ORDER BY weighted_gini ASC, threshold ASC LIMIT 1
    """,
)
def feature_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training: the order-value threshold that best
    separates urgent/high orders from the rest by weighted Gini
    impurity. Candidate cuts are swept over the DISTINCT-value histogram
    with prefix sums supplying left/right class counts per cut — one
    ordered pass over |distinct prices|, not rows; the single-feature
    split-finding kernel a distributed decision tree runs per node."""
    orders = _table(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    h = v.groupBy("x").agg(
        F.sum("y").alias("p_v"), (F.count(F.lit(1)) - F.sum("y")).alias("n_v")
    )
    tot = h.agg(
        F.sum("p_v").alias("tp"), F.sum("n_v").alias("tn")
    )
    # Distributed prefix sums (`two_level_cumsum`, block = x/64 price
    # buckets) — the cut sweep stays hash-partitioned as the
    # distinct-price histogram grows.
    from gemini_data_wrangler_spark.operators.window import two_level_cumsum

    sweep = (
        two_level_cumsum(
            h,
            key=F.col("x"),
            tiebreaks=[],
            block=F.floor(F.col("x") / 64).cast("long"),
            sums={"pl": F.col("p_v"), "nl": F.col("n_v")},
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "pl",
            "nl",
            (F.col("tp") - F.col("pl")).alias("pr"),
            (F.col("tn") - F.col("nl")).alias("nr"),
            (F.col("tp") + F.col("tn")).alias("n_all"),
        )
        .filter(F.col("pr") + F.col("nr") > 0)
    )
    nl_ = F.col("pl") + F.col("nl")
    nr_ = F.col("pr") + F.col("nr")
    gini_l = 1 - (
        F.col("pl") * F.col("pl") + F.col("nl").cast("double") * F.col("nl")
    ) / (nl_ * nl_)
    gini_r = 1 - (
        F.col("pr") * F.col("pr") + F.col("nr").cast("double") * F.col("nr")
    ) / (nr_ * nr_)
    scored = sweep.select(
        F.col("x").alias("threshold"),
        nl_.alias("n_left"),
        nr_.alias("n_right"),
        F.round((nl_ * gini_l + nr_ * gini_r) / F.col("n_all"), 6).alias(
            "weighted_gini"
        ),
    )
    return scored.orderBy(
        F.col("weighted_gini").asc(), F.col("threshold").asc()
    ).limit(1)


# ---------------------------------------------------------------------------
# Geometric and harmonic means per group
# ---------------------------------------------------------------------------
@register(
    "agg_geometric_harmonic_mean",
    """
    SELECT o_orderpriority AS grp, count(*) AS n,
           round(exp(avg(ln(o_totalprice))), 6) AS geometric_mean,
           round(count(*) / sum(1.0 / o_totalprice), 6) AS harmonic_mean,
           round(avg(o_totalprice), 6) AS arithmetic_mean
    FROM orders WHERE o_totalprice > 0 GROUP BY 1
    """,
)
def agg_geometric_harmonic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric (exp∘avg∘ln) and harmonic (n/Σ(1/x)) means of order
    value per priority beside the arithmetic mean — the Pythagorean-mean
    bank (GM for multiplicative quantities like growth ratios, HM for
    rate averaging) completing the location-statistic family. Single
    hash aggregate, fully partial-aggregated."""
    orders = _table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.exp(F.avg(F.log("o_totalprice"))), 6).alias("geometric_mean"),
        F.round(
            F.count(F.lit(1)) / F.sum(1.0 / F.col("o_totalprice")), 6
        ).alias("harmonic_mean"),
        F.round(F.avg("o_totalprice"), 6).alias("arithmetic_mean"),
    )
