"""WINDOW stage — analytic/window functions (engine extension).

The reference's stage algebra has NO window functions (SURVEY.md §2.4 — they
are reachable only through CUSTOM SQL), so this stage type is our extension,
kept in the same closed-IR style:

``data = {table?, partitionBy: [..], orderBy: [{column, direction}],
          functions: [{function, column?, alias, frame?}]}``

``function`` ∈ ROW_NUMBER | RANK | DENSE_RANK | LAG | LEAD | SUM | AVG |
MIN | MAX | COUNT | FIRST_VALUE | LAST_VALUE. ``frame`` (optional, for
aggregates): "rows_unbounded" (ROWS UNBOUNDED PRECEDING..CURRENT ROW,
i.e. running totals) or "range_unbounded" (the SQL default).

Scale note: a window over ``partitionBy`` shuffles once on the partition
keys; Catalyst keeps all functions sharing one (partition, order) spec in a
single Window physical operator — we group specs so that holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

from gemini_data_wrangler_spark.plans.stage import Stage

_RANKING = {
    "ROW_NUMBER": F.row_number,
    "RANK": F.rank,
    "DENSE_RANK": F.dense_rank,
    "PERCENT_RANK": F.percent_rank,
    "CUME_DIST": F.cume_dist,
}
_AGGS = {
    "SUM": F.sum,
    "AVG": F.avg,
    "MIN": F.min,
    "MAX": F.max,
    "COUNT": F.count,
    "FIRST_VALUE": F.first,
    "LAST_VALUE": F.last,
}


def _order_cols(order_by: list[dict]) -> list[Column]:
    cols = []
    for o in order_by:
        c = F.expr(o["column"])
        cols.append(c.desc() if str(o.get("direction", "ASC")).upper() == "DESC" else c.asc())
    return cols


def _window_spec(data: dict, need_order: bool, frame: str | None) -> WindowSpec:
    spec = Window.partitionBy(*[F.expr(p) for p in data.get("partitionBy", [])])
    order_by = data.get("orderBy") or []
    if order_by:
        spec = spec.orderBy(*_order_cols(order_by))
    elif need_order:
        raise ValueError("window function requires orderBy")
    if frame == "rows_unbounded":
        spec = spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    elif frame == "range_unbounded":
        spec = spec.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    elif isinstance(frame, dict):
        # Bounded sliding frame: {mode: rows|range, preceding: int|"unbounded",
        # following: int|"current"} — e.g. a 7-day moving aggregate is
        # {mode: "range", preceding: 6} over a day-index order key. RANGE
        # frames require a single numeric order column (Spark restriction;
        # date arithmetic is done in a prior SELECT stage).
        mode = str(frame.get("mode", "rows")).lower()
        prec = frame.get("preceding", "unbounded")
        start = Window.unboundedPreceding if prec == "unbounded" else -int(prec)
        foll = frame.get("following", "current")
        end = Window.currentRow if foll == "current" else int(foll)
        spec = spec.rangeBetween(start, end) if mode == "range" else spec.rowsBetween(start, end)
    return spec


def compile_window_stage(stage: Stage, df: DataFrame) -> DataFrame:
    d = stage.data
    functions = d.get("functions") or []
    if not functions:
        raise ValueError("WINDOW stage requires functions array")
    out = df
    for fn in functions:
        name = str(fn["function"]).upper()
        alias = fn.get("alias") or name.lower()
        frame = fn.get("frame")
        if name in _RANKING:
            col = _RANKING[name]().over(_window_spec(d, need_order=True, frame=None))
        elif name in ("LAG", "LEAD"):
            offset = int(fn.get("offset", 1))
            maker = F.lag if name == "LAG" else F.lead
            col = maker(F.expr(fn["column"]), offset).over(_window_spec(d, need_order=True, frame=None))
        elif name == "NTILE":
            n = int(fn.get("n", 4))
            col = F.ntile(n).over(_window_spec(d, need_order=True, frame=None))
        elif name in _AGGS:
            col = _AGGS[name](F.expr(fn["column"])).over(_window_spec(d, need_order=False, frame=frame))
        else:
            raise ValueError(f"Unsupported window function: {name}")
        out = out.withColumn(alias, col)
    return out


# ---------------------------------------------------------------------------
# Distributed global ranking (two-level: block-local rank + block carry)
# ---------------------------------------------------------------------------
def two_level_rank(
    df: DataFrame,
    key: Column,
    tiebreaks: list[Column],
    block: Column,
    out_col: str = "_grank",
    parts: list[str] | None = None,
) -> DataFrame:
    """Dense global row_number over (key, *tiebreaks) WITHOUT a
    single-partition window: ``block`` must be an order-preserving
    coarsening of (key, *tiebreaks) (e.g. ``key >> 24``, ``key div 64``,
    or a ``struct(key, coarse_tiebreak)`` when the leading key is heavily
    tied) — every row of a lower block sorts before every row of a higher
    block, so

      global_rank = (# rows in lower blocks) + within-block row_number.

    The within-block window is hash-partitioned on the block (distributed);
    the carry prefix runs over the per-block count table (metadata-sized).
    Same shape as `pack_sequences` / `ops_watermark_sizing`'s prefix sums.

    ``parts`` (optional, column NAMES already on ``df``) restarts the rank
    per group — the distributed equivalent of
    ``row_number() OVER (PARTITION BY parts ORDER BY key, tiebreaks)``:
    the within window partitions on (parts, block) and the carry prefix is
    computed per group over its own block counts.

    Returns ``df`` with ``out_col`` added (cols ``_blk`` consumed).
    """
    parts = parts or []
    # Staged once (round 7): `base` feeds BOTH the within-block window
    # and the per-block count aggregate — unpersisted, every caller's
    # upstream pipeline (often a join or an expression-dense projection)
    # re-ran twice per rank. Lazy persist: the first action populates the
    # blocks, the second subtree reads them; released by the session's
    # per-query cache clear (bench) or cache eviction.
    base = df.withColumn("_blk", block).withColumn("_key", key).persist()
    w_in = Window.partitionBy(*parts, "_blk").orderBy(F.col("_key"), *tiebreaks)
    within = base.withColumn("_wrank", F.row_number().over(w_in))
    counts = base.groupBy(*parts, "_blk").agg(F.count(F.lit(1)).alias("_bn"))
    w_blocks = (
        Window.partitionBy(*parts)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = counts.select(
        *parts, "_blk", F.coalesce(F.sum("_bn").over(w_blocks), F.lit(0)).alias("_carry")
    )
    return (
        within.join(F.broadcast(carry), [*parts, "_blk"])
        .withColumn(out_col, F.col("_carry") + F.col("_wrank"))
        .drop("_blk", "_key", "_wrank", "_carry")
    )


def two_level_cumsum(
    df: DataFrame,
    key: Column,
    tiebreaks: list[Column],
    block: Column,
    sums: dict[str, Column],
    inclusive: bool = True,
) -> DataFrame:
    """Distributed ``sum(col) OVER (ORDER BY key, tiebreaks ROWS BETWEEN
    UNBOUNDED PRECEDING AND {CURRENT ROW | 1 PRECEDING})`` for each
    ``out_name -> col`` in ``sums`` — the prefix-sum sibling of
    `two_level_rank`: within-block running sums are hash-partitioned on
    the block, the cross-block carry is a prefix over the metadata-sized
    per-block totals table, broadcast back. ``block`` must be an
    order-preserving coarsening of the sort key (same contract as
    `two_level_rank`). Use for ECDF / threshold sweeps over
    distinct-value histograms whose cardinality grows with the data.
    """
    # Staged once (round 7): same double-consumption as two_level_rank
    # (within-block window + per-block totals).
    base = df.withColumn("_blk", block).withColumn("_key", key).persist()
    end = 0 if inclusive else -1
    w_in = (
        Window.partitionBy("_blk")
        .orderBy(F.col("_key"), *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    within = base.select(
        "*",
        *[
            F.coalesce(F.sum(col).over(w_in), F.lit(0)).alias(f"_w_{name}")
            for name, col in sums.items()
        ],
    )
    totals = base.groupBy("_blk").agg(
        *[F.sum(col).alias(f"_t_{name}") for name, col in sums.items()]
    )
    w_blocks = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    carry = totals.select(
        "_blk",
        *[
            F.coalesce(F.sum(f"_t_{name}").over(w_blocks), F.lit(0)).alias(
                f"_c_{name}"
            )
            for name in sums
        ],
    )
    out = within.join(F.broadcast(carry), "_blk")
    for name in sums:
        out = out.withColumn(name, F.col(f"_c_{name}") + F.col(f"_w_{name}"))
    return out.drop(
        "_blk", "_key", *[f"_w_{n}" for n in sums], *[f"_c_{n}" for n in sums]
    )


def distributed_ntile(
    df: DataFrame,
    k: int,
    key: Column,
    tiebreaks: list[Column],
    block: Column,
    out_col: str = "_ntile",
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY key, tiebreaks)`` without a single-task
    data-sized window: two-level distributed rank + the closed-form
    `ntile_from_rank` split, with the row count as a broadcast 1-row
    aggregate. Exactly matches SQL ntile (first n mod k buckets get the
    extra row). Returns ``df`` plus ``out_col``; see `two_level_rank` for
    the ``block`` contract (order-preserving coarsening of the sort key).
    """
    # Staged once (round 7): the row count and the rank both consume
    # ``df`` — persist so the count reads the same blocks the rank's
    # staged base derives from instead of re-running the caller's
    # pipeline a third time.
    df = df.persist()
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    ranked = two_level_rank(df, key, tiebreaks, block, out_col="_grank")
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(out_col, ntile_from_rank(F.col("_grank"), F.col("_n"), k))
        .drop("_grank", "_n")
    )


def ntile_from_rank(rank: Column, n_rows: Column, k: int) -> Column:
    """SQL ntile(k) bucket from a 1-based global rank: the first
    ``n_rows mod k`` buckets hold ``ceil(n/k)`` rows, the rest floor —
    exactly the standard ntile split, computable row-locally once the
    global rank exists. Pure bigint arithmetic (div), no doubles."""
    n = n_rows.cast("long")
    sm = F.floor(n / k).cast("long")  # floor bucket size
    big = sm + 1  # first (n mod k) buckets get one extra row
    r = n % k
    boundary = r * big
    in_big = F.floor((rank - 1) / big).cast("long")
    in_small = F.floor((rank - boundary - 1) / sm).cast("long")
    return (
        F.when(rank <= boundary, in_big + 1)
        .otherwise(r + in_small + 1)
        .cast("int")
    )
