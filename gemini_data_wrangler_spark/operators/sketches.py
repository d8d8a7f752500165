"""Mergeable frequency sketches as plain DataFrames.

A count-min sketch here is a ``(row, bucket, cnt)`` DataFrame of at most
``CMS_DEPTH × CMS_WIDTH`` (~14 k) rows regardless of input size. That
representation IS the scale story: per-shard/day sketches are tiny tables
built with one map-side-combined aggregation each, merging is a
``groupBy(row, bucket).sum``, and estimation is a broadcast join — no
driver participation, no opaque binary blobs, trivially storable as
parquet state (which is what the streaming incremental variant does).

Hash family: md5(row || value) hex-folded to uint32 (``conv(substr(md5,
1, 8), 16, 10)``) — row-seeded, JVM-evaluated, identical on every
executor and across batch/streaming runs, AND engine-portable: any SQL
engine with md5 re-derives the exact same counter table, which is what
lets the driver's DuckDB oracle hash-check the full sketch end-to-end
(see ``sketch_count_min_heavy_hitters``) instead of trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# width = ceil(e / eps) with eps = 0.001 → 2719; depth = 5 → error-bound
# failure prob per query ≤ e^-5 ≈ 0.7% (Cormode & Muthukrishnan 2005).
CMS_DEPTH, CMS_WIDTH = 5, 2719
CMS_EPS = 2.718281828 / CMS_WIDTH


def cms_buckets(col: str) -> F.Column:
    """Array of the value's bucket index in every sketch row."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(str(i)), F.col(col).cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % CMS_WIDTH
            ).cast("int")
            for i in range(CMS_DEPTH)
        ]
    )


def cms_counters(values: DataFrame, col: str = "w") -> DataFrame:
    """Build the counter table for one shard/batch of values.

    Output: row int, bucket int, cnt long (≤ depth·width rows)."""
    return (
        values.select(F.posexplode(cms_buckets(col)).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge any union of counter tables (shards, days, epochs)."""
    return counters.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(candidates: DataFrame, counters: DataFrame, col: str = "w") -> DataFrame:
    """Point-frequency estimates for a candidate set: min over the value's
    depth buckets. The merged counter table is broadcast (it is ≤ ~14 k
    rows by construction); candidates keep their other columns."""
    keyed = candidates.select(
        "*", F.posexplode(cms_buckets(col)).alias("row", "bucket")
    )
    others = [c for c in candidates.columns]
    return (
        keyed.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(*others)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
