"""Temporal joins over event streams — as-of join and time-range join.

The reference app has no time-series operators at all (SURVEY.md §2.4:
"no semi/anti/theta/range/as-of/interval joins"); these are north-star
extensions for event/time-series pipelines, built scale-first:

* ``asof_join`` — the classic trades⇄quotes join ("for each left row, the
  most recent right row at or before its timestamp, per key"). Implemented
  as a union-tag + single window pass, NOT a per-row subquery: one shuffle
  on (key), sorted once on (ts) — linear at any scale, no range explosion.
* ``range_join_count`` — for each anchor row, aggregate right rows within a
  trailing interval. Implemented by bucketing both sides to interval-sized
  bins and joining each anchor to its own + previous bin (bounded fan-out of
  2) before the exact range filter — the standard bounded-range join that
  avoids the quadratic unconstrained inequality join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same ``on`` key (LEFT semantics: left
    rows with no prior right row keep NULLs).

    Single-pass plan: tag both inputs, union them positionally, and take
    ``last(right value, ignorenulls)`` over a window partitioned by key and
    ordered by (ts, tag) — tag 0 sorts right rows first at equal timestamps,
    so an exactly-simultaneous right row IS visible to the left row,
    matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics.

    At equal (key, ts) on the right side the winner would be tie-ambiguous;
    callers should pre-deduplicate the right side per (key, ts) — e.g. keep
    the max event_id — to make the result deterministic.
    """
    right_cols = right_cols or [c for c in right.columns if c != on]

    # Pack each side's payload into a struct, union by name with the other
    # side's payload nulled — two narrow projections, no per-column padding.
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    l_struct = "struct<" + ",".join(f"`{c}`:{ltypes[c]}" for c in left.columns) + ">"
    r_struct = "struct<" + ",".join(f"`{c}`:{rtypes[c]}" for c in right_cols) + ">"
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_struct).alias("_r"),
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(l_struct).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    unioned = lhs.unionByName(rhs)

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ats").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        unioned.withColumn("_rf", F.last(F.col("_r"), ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    return filled.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rf.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_count(
    anchors: DataFrame,
    events: DataFrame,
    on: str,
    anchor_ts: str = "ts",
    event_ts: str = "ts",
    interval_seconds: int = 300,
    agg_col: str | None = None,
) -> DataFrame:
    """Per anchor row: count (and optionally sum ``agg_col``) of right rows
    in the trailing window ``(anchor.ts - interval, anchor.ts]`` for the
    same key.

    Both sides are bucketed to ``interval_seconds`` bins; each anchor joins
    its own and the previous bin only (a trailing window can span at most
    2 such bins), then the exact range predicate filters. Join fan-out is
    bounded by per-bin density — no quadratic inequality join.

    Output: all anchor columns + n_in_range (+ sum_in_range).
    """
    # cast("timestamp") first: unix_timestamp rejects timestamp_ntz inputs
    # (session tz = UTC makes the NTZ→LTZ cast value-preserving).
    bin_of = lambda c: F.floor(  # noqa: E731
        F.unix_timestamp(c.cast("timestamp")) / F.lit(interval_seconds)
    )

    ev = events.select(
        F.col(on).alias("_k"),
        F.col(event_ts).alias("_ets"),
        *( [F.col(agg_col).alias("_v")] if agg_col else [] ),
        bin_of(F.col(event_ts)).alias("_bin"),
    )
    # Each event is visible to anchors in its own bin and the next one.
    ev2 = ev.withColumn("_abin", F.explode(F.array(F.col("_bin"), F.col("_bin") + 1))).drop("_bin")

    anc = anchors.withColumn("_abin", bin_of(F.col(anchor_ts)))
    lo = F.col(anchor_ts).cast("timestamp") - F.expr(f"INTERVAL {interval_seconds} SECOND")

    joined = (
        anc.join(ev2, (anc[on] == ev2["_k"]) & (anc["_abin"] == ev2["_abin"]), "left")
        .withColumn(
            "_in",
            (F.col("_ets") > lo) & (F.col("_ets") <= F.col(anchor_ts)),
        )
    )
    aggs = [F.sum(F.when(F.col("_in"), 1).otherwise(0)).alias("n_in_range")]
    if agg_col:
        aggs.append(
            F.sum(F.when(F.col("_in"), F.col("_v")).otherwise(F.lit(0.0))).alias("sum_in_range")
        )
    return joined.groupBy(*[anchors[c] for c in anchors.columns]).agg(*aggs)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    tolerance_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join with bounded staleness: like :func:`asof_join`, but a
    match older than ``tolerance_seconds`` is discarded (the matched
    columns go NULL) — pandas ``merge_asof(tolerance=...)`` semantics,
    the standard guard against joining against stale quotes/state.

    Same single-pass union+window plan as ``asof_join``; the tolerance is
    one post-filter projection, so the cost is identical.
    """
    right_cols = right_cols or [c for c in right.columns if c != on]
    joined = asof_join(
        left, right, on=on, left_ts=left_ts, right_ts=right_ts,
        right_cols=right_cols, suffix=suffix,
    )
    ts_r = F.col(f"{right_ts}{suffix}")
    # NTZ-safe staleness check: timestamp subtraction yields a day-time
    # interval (timestamp_ntz has no cast to a numeric epoch in Spark 4).
    within = ts_r.isNotNull() & (
        (F.col(left_ts) - ts_r) <= F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.when(within, F.col(f"{c}{suffix}")).otherwise(F.lit(None)).alias(f"{c}{suffix}")
        for c in right_cols
    ]
    return joined.select(*out_cols)
