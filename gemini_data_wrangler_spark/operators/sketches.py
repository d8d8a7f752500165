"""Mergeable frequency sketches as plain DataFrames.

A count-min sketch here is a ``(row, bucket, cnt)`` DataFrame of at most
``CMS_DEPTH × CMS_WIDTH`` (~14 k) rows regardless of input size. That
representation IS the scale story: per-shard/day sketches are tiny tables
built with one map-side-combined aggregation each, merging is a
``groupBy(row, bucket).sum``, and estimation is a broadcast join — no
driver participation, no opaque binary blobs, trivially storable as
parquet state (which is what the streaming incremental variant does).

Hash family: Kirsch-Mitzenmacher double hashing over ONE md5 digest —
``h_i(x) = (w1 + i * (2*w2 + 1)) mod width`` with ``w1``/``w2`` the
first/second 8-hex-digit words of ``md5(value)`` (the ``2*w2+1`` keeps
the stride odd and nonzero). One digest per value instead of one per
sketch row restores most of xxhash64's speed while staying
engine-portable: any SQL engine with md5 re-derives the exact same
counter table, which is what lets the driver's DuckDB oracle hash-check
the full sketch end-to-end (``sketch_count_min_heavy_hitters``) instead
of trusting it. Kirsch & Mitzenmacher 2006 show two independent hashes
suffice for Bloom-type sketch guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# width = ceil(e / eps) with eps = 0.001 → 2719; depth = 5 → error-bound
# failure prob per query ≤ e^-5 ≈ 0.7% (Cormode & Muthukrishnan 2005).
CMS_DEPTH, CMS_WIDTH = 5, 2719
CMS_EPS = 2.718281828 / CMS_WIDTH


def cms_digest_buckets(df: DataFrame, col: str) -> tuple[DataFrame, F.Column]:
    """Return ``(df', bucket_array_col)`` with the md5 digest and the two
    hash words added as columns in SEPARATE projections. The separation is
    load-bearing: inlining the digest into both words (one expression)
    makes codegen recompute md5 per array element — 10 digests/value
    instead of 1, measured 2.7× slower at sf0.1. CollapseProject keeps
    non-cheap multiply-referenced expressions in their own projection, so
    this shape pins single evaluation."""
    d = df.withColumn("_cms_dg", F.md5(F.col(col).cast("string")))
    d = d.withColumn(
        "_cms_w1", F.conv(F.substring("_cms_dg", 1, 8), 16, 10).cast("long")
    ).withColumn(
        "_cms_w2",
        F.conv(F.substring("_cms_dg", 9, 8), 16, 10).cast("long") * 2 + 1,
    )
    bucket = F.array(
        *[
            ((F.col("_cms_w1") + F.lit(i) * F.col("_cms_w2")) % CMS_WIDTH).cast(
                "int"
            )
            for i in range(CMS_DEPTH)
        ]
    )
    return d, bucket


def cms_counters(values: DataFrame, col: str = "w") -> DataFrame:
    """Build the counter table for one shard/batch of values.

    Output: row int, bucket int, cnt long (≤ depth·width rows)."""
    keyed, bucket = cms_digest_buckets(values, col)
    return (
        keyed.select(F.posexplode(bucket).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge any union of counter tables (shards, days, epochs)."""
    return counters.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(candidates: DataFrame, counters: DataFrame, col: str = "w") -> DataFrame:
    """Point-frequency estimates for a candidate set: min over the value's
    depth buckets. The merged counter table is broadcast (it is ≤ ~14 k
    rows by construction); candidates keep their other columns.

    The candidate side uses the INLINE bucket expression (digest
    recomputed per element) on purpose: candidates are top-k-sized, so
    the extra digests are nothing, while the projection-separated form
    would be pushed below the candidates' orderBy+limit and break its
    TakeOrderedAndProject fusion into a full vocabulary sort
    (plan-pinned in tests/test_plans.py)."""
    digest = F.md5(F.col(col).cast("string"))
    w1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    w2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long") * 2 + 1
    bucket = F.array(
        *[
            ((w1 + F.lit(i) * w2) % CMS_WIDTH).cast("int")
            for i in range(CMS_DEPTH)
        ]
    )
    keyed = candidates.select(
        *candidates.columns, F.posexplode(bucket).alias("row", "bucket")
    )
    others = [c for c in candidates.columns]
    return (
        keyed.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(*others)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
