"""Round-2 extensions, batch 62: Benjamini–Hochberg FDR over per-group
KS tests, Hodges–Lehmann robust location.

Scale notes:
- The BH SCREEN runs 25 two-sample KS tests in ONE plan: a (nation ×
  distinct-value) cumulative grid (bounded by groups × values, built
  with windows — raw rows collapse at the first aggregate) gives every
  group's D simultaneously, and the BH step-up is a window over the 25
  p-values. Multiple-testing control is what makes a 25-group drift
  sweep actionable — without it, α = 0.05 yields ~1 false alarm per
  sweep by construction.
- HODGES–LEHMANN (median of Walsh averages) is quadratic only within
  each nation's own customers — the same bounded-block + pinned-
  repartition shape as Theil–Sen; the median is exact per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.queries import register
from gemini_data_wrangler_spark.sources.readers import load_sf_tables


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_sf_tables(spark, sf_dir)[name]


_BH_ALPHA = 0.05


@register(
    "dq_benjamini_hochberg",
    f"""
    WITH vals AS (
      SELECT c_nationkey AS g, c_acctbal AS v FROM customer
    ), grid AS (
      SELECT g, v, count(*) AS cg FROM vals GROUP BY g, v
    ), axis AS (SELECT DISTINCT v FROM vals),
    pergroup AS (
      SELECT n.g, a.v, COALESCE(x.cg, 0) AS cg
      FROM (SELECT DISTINCT g FROM vals) n
      CROSS JOIN axis a
      LEFT JOIN grid x ON x.g = n.g AND x.v = a.v
    ), gall AS (
      SELECT v, count(*) AS call FROM vals GROUP BY v
    ), cum AS (
      SELECT p.g, p.v,
             sum(p.cg) OVER (PARTITION BY p.g ORDER BY p.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g,
             sum(gl.call) OVER (PARTITION BY p.g ORDER BY p.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
      FROM pergroup p JOIN gall gl ON p.v = gl.v
    ), sizes AS (
      SELECT g, count(*) AS ng FROM vals GROUP BY g
    ), tot AS (SELECT count(*) AS nt FROM vals),
    d AS (
      SELECT c.g, s.ng, t.nt - s.ng AS nc,
             max(abs(c.cum_g / CAST(s.ng AS DOUBLE)
                     - (c.cum_all - c.cum_g) / CAST(t.nt - s.ng AS DOUBLE))) AS ks_d
      FROM cum c JOIN sizes s ON c.g = s.g CROSS JOIN tot t
      GROUP BY c.g, s.ng, t.nt
    ), p AS (
      SELECT g, ks_d,
             least(2 * exp(-2 * power(ks_d * sqrt(ng * CAST(nc AS DOUBLE) / (ng + nc)), 2)), 1.0) AS pval
      FROM d
    ), ranked AS (
      SELECT g, ks_d, pval,
             row_number() OVER (ORDER BY pval, g) AS i,
             count(*) OVER () AS m
      FROM p
    ), cutoff AS (
      SELECT COALESCE(max(i), 0) AS k FROM ranked
      WHERE pval <= {_BH_ALPHA} * i / m
    )
    SELECT g AS nation, round(ks_d, 6) AS ks_d, round(pval, 6) AS p_value,
           i AS p_rank, (i <= (SELECT k FROM cutoff)) AS rejected
    FROM ranked
    """,
)
def dq_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation drift sweep with false-discovery-rate control: a
    two-sample KS test of each nation's account-balance distribution
    against its complement (all 25 tests computed from ONE cumulative
    grid), p ≈ 2·exp(−2λ²), then the Benjamini–Hochberg step-up at
    α = {_BH_ALPHA} — reject the k smallest p-values where k is the
    largest rank with p₍ᵢ₎ ≤ αi/m. Without FDR control a 25-group sweep
    alarms ~once per run at α = 0.05 by construction; with it, the
    expected false-discovery fraction among flags is ≤ α. One grid
    build + per-group windows + a 25-row BH window."""
    cust = _table(spark, sf_dir, "customer")
    # Staged once (round 7): six subtrees read this 2-column projection
    # (grid, axis, groups, global counts, sizes, total).
    vals = cust.select(
        F.col("c_nationkey").alias("g"), F.col("c_acctbal").alias("v")
    ).persist()
    grid = vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cg"))
    axis = vals.select("v").distinct()
    groups = vals.select("g").distinct()
    pergroup = (
        groups.crossJoin(axis)
        .join(grid, ["g", "v"], "left")
        .select("g", "v", F.coalesce("cg", F.lit(0)).alias("cg"))
    )
    glob = vals.groupBy("v").agg(F.count(F.lit(1)).alias("call"))
    w = Window.partitionBy("g").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        pergroup.join(glob, "v")
        .withColumn("cum_g", F.sum("cg").over(w))
        .withColumn("cum_all", F.sum("call").over(w))
    )
    sizes = vals.groupBy("g").agg(F.count(F.lit(1)).alias("ng"))
    tot = vals.agg(F.count(F.lit(1)).alias("nt"))
    d = (
        cum.join(F.broadcast(sizes), "g")
        .crossJoin(F.broadcast(tot))
        .groupBy("g", "ng", "nt")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_g") / F.col("ng").cast("double")
                    - (F.col("cum_all") - F.col("cum_g"))
                    / (F.col("nt") - F.col("ng")).cast("double")
                )
            ).alias("ks_d")
        )
        .withColumn("nc", F.col("nt") - F.col("ng"))
    )
    lam = F.col("ks_d") * F.sqrt(
        F.col("ng") * F.col("nc").cast("double") / (F.col("ng") + F.col("nc"))
    )
    p = d.select(
        "g", "ks_d", F.least(2 * F.exp(-2 * F.pow(lam, 2)), F.lit(1.0)).alias("pval")
    )
    wr = Window.orderBy("pval", "g")
    wm = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = p.withColumn("i", F.row_number().over(wr)).withColumn(
        "m", F.count(F.lit(1)).over(wm)
    )
    cutoff = (
        ranked.filter(F.col("pval") <= _BH_ALPHA * F.col("i") / F.col("m"))
        .agg(F.coalesce(F.max("i"), F.lit(0)).alias("k"))
    )
    return ranked.crossJoin(F.broadcast(cutoff)).select(
        F.col("g").alias("nation"),
        F.round("ks_d", 6).alias("ks_d"),
        F.round("pval", 6).alias("p_value"),
        F.col("i").alias("p_rank"),
        (F.col("i") <= F.col("k")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Hodges–Lehmann estimator per nation
# ---------------------------------------------------------------------------
@register(
    "agg_hodges_lehmann",
    """
    WITH c AS (SELECT c_nationkey AS g, c_custkey AS k, c_acctbal AS x FROM customer),
    walsh AS (
      SELECT a.g, (a.x + b.x) / 2 AS w
      FROM c a JOIN c b ON a.g = b.g AND a.k <= b.k
    )
    SELECT g AS nation, count(*) AS n_walsh,
           round(median(w), 6) AS hodges_lehmann
    FROM walsh GROUP BY g
    """,
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann location estimate per nation: the median of all
    Walsh averages (xᵢ+xⱼ)/2, i ≤ j — the estimator behind the
    Wilcoxon signed-rank interval: ~95% as efficient as the mean on
    clean Gaussian data yet with a 29% breakdown point (the mean's is
    zero — one corrupted balance moves it arbitrarily). The pair join
    is quadratic only WITHIN each nation's block and repartition-pinned
    like the other compute-dense verifies; the median is exact per
    group."""
    cust = _table(spark, sf_dir, "customer")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    c = cust.select(
        F.col("c_nationkey").alias("g"),
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("x"),
    )
    a = c.repartition(n_parts, F.col("k"))
    b = c.select(
        F.col("g").alias("g2"), F.col("k").alias("k2"), F.col("x").alias("x2")
    )
    walsh = a.join(
        F.broadcast(b), (F.col("g") == F.col("g2")) & (F.col("k") <= F.col("k2"))
    ).select("g", ((F.col("x") + F.col("x2")) / 2).alias("w"))
    return walsh.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_walsh"),
        F.round(F.median("w"), 6).alias("hodges_lehmann"),
    ).select(F.col("g").alias("nation"), "n_walsh", "hodges_lehmann")
