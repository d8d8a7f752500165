"""Event-time windowed aggregation — batch and Structured Streaming.

The reference has no streaming at all (SURVEY.md §2.4); this module is the
north-star extension over the driver's ``events`` table. The same builders
work on batch DataFrames and on streaming DataFrames (`readStream`) — Spark
gives identical semantics for ``F.window``/``F.session_window`` in both
modes, so the batch path doubles as the oracle-checkable correctness surface
for the streaming path (tests/test_streaming.py runs the real streaming
engine with watermarks over the same data and asserts equal results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) count + value sum over tumbling windows.

    Output: window_start, event_type, n_events, total_value.
    """
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("_w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("_w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in window/slide windows.

    Output: window_start, n_events, n_users.
    """
    return (
        events.groupBy(F.window(F.col(ts_col), window, slide).alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(F.col("_w.start").alias("window_start"), "n_events", "n_users")
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows (events within ``gap`` of each other merge).

    Output: user_id, session_start, n_events. ``session_window``'s start is
    the first event's timestamp — the same value the classic gaps-and-islands
    SQL (LAG + cumulative sum of gap flags) produces, which is the oracle.
    """
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("_w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("_w.start").alias("session_start"), "n_events")
    )


def session_oracle_sql(table: str = "events", gap_minutes: int = 30) -> str:
    """Gaps-and-islands session equivalent for DuckDB."""
    return f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL {gap_minutes} MINUTE THEN 0 ELSE 1 END AS new_session
      FROM {table}
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """


# ---------------------------------------------------------------------------
# True Structured Streaming path
# ---------------------------------------------------------------------------
def read_events_stream(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a parquet directory (how a 100 TB pipeline
    would tail an ingest location); schema must be supplied for streaming
    reads.

    Watermarks require TIMESTAMP (with local timezone); parquet written with
    ``timestamp_ntz`` would fail ``withWatermark``, so NTZ columns are cast
    on read (session timezone is the implied zone).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(parquet_dir)
    )
    for name, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(name, F.col(name).cast("timestamp"))
    return stream


def streaming_session_stats(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful streaming operator: per-user session statistics via
    ``applyInPandasWithState`` (arbitrary state, not expressible with the
    built-in window aggregations because the emitted record carries
    last-event metadata and a computed duration).

    State per user: (session_start, last_ts, n_events, total_value). An
    incoming batch extends the open session or closes it when the gap
    exceeds ``gap_seconds``; closed sessions are emitted, and state times
    out via ``GroupStateTimeout.EventTimeTimeout`` so memory stays bounded
    under the watermark — the 100 TB requirement for any stateful operator.

    Output: user_id, session_start, session_end, n_events, total_value.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    state_schema = "session_start timestamp, last_ts timestamp, n_events long, total_value double"

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, v = state.get
                rows.append((user_id, s0, s1, n, v))
                state.remove()
        else:
            events = pd.concat(list(pdf_iter)).sort_values("ts")
            if state.exists:
                s0, s1, n, v = state.get
            else:
                s0 = s1 = None
                n, v = 0, 0.0
            for ts, value in zip(events["ts"], events["value"]):
                ts = ts.to_pydatetime()
                if s0 is None:
                    s0, s1, n, v = ts, ts, 1, float(value)
                elif (ts - s1).total_seconds() > gap_seconds:
                    rows.append((user_id, s0, s1, n, v))
                    s0, s1, n, v = ts, ts, 1, float(value)
                else:
                    s1, n, v = ts, n + 1, v + float(value)
            state.update((s0, s1, n, v))
            # Close the open session once the watermark passes the gap.
            state.setTimeoutTimestamp(int(s1.timestamp() * 1000) + gap_seconds * 1000)
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events", "total_value"]
        )

    for name, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(name, F.col(name).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase matched to the
    same user's clicks in the preceding ``max_delay_minutes``. Both sides
    carry watermarks plus the event-time range in the join condition, so
    Spark bounds the buffered state on BOTH sides (without the range, a
    stream-stream join keeps unbounded state — the classic 100 TB footgun).

    Works identically on batch DataFrames (the batch run is the oracle
    surface in tests).

    Output: user_id, click_id, click_ts, purchase_id, purchase_ts, value.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c["user_id"] == p["p_user_id"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {max_delay_minutes} MINUTES"))
    )
    return c.join(p, cond, "inner").select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "value"
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state is evicted instead of growing forever —
    the streaming counterpart of the batch ``exact_dedup`` operator. Batch
    frames take the plain ``dropDuplicates`` path (same result set)."""
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def foreach_batch_parquet_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Exactly-once parquet sink via ``foreachBatch``: each micro-batch
    writes to ``out_dir/epoch=<id>`` with dynamic overwrite, so a replayed
    epoch (failure between write and commit) overwrites its own output
    instead of appending duplicates — idempotence is the sink half of
    exactly-once; the checkpoint (WAL + offsets) is the source half.

    Returns the started ``StreamingQuery`` (availableNow trigger: drains
    the source then stops, the batch-backfill pattern)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_tumbling_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts — late data beyond ``watermark``
    is dropped and state is evicted (bounded state at scale)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("_w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("_w.start").alias("window_start"), "event_type", "n_events")
    )


def streaming_cms_sink(
    words_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    col: str = "w",
):
    """Incremental count-min maintenance over a stream: every micro-batch
    reduces to its own tiny counter table (``operators/sketches.py``) and
    lands at ``out_dir/epoch=<id>`` with epoch-overwrite idempotence (same
    replay contract as ``foreach_batch_parquet_sink``). State growth is
    #epochs × ≤14 k rows — KBs per epoch regardless of stream volume; a
    compaction job can fold old epochs with ``cms_merge`` at any time.

    This is the streaming half of the mergeable-sketch story: the batch
    query answers "heavy hitters over everything", this sink keeps the
    same answer maintainable without re-scanning history.

    Returns the started StreamingQuery (availableNow trigger).
    """
    from gemini_data_wrangler_spark.operators.sketches import cms_counters

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cms_counters(batch_df, col).write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )

    return (
        words_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_read_merged(spark, out_dir: str) -> DataFrame:
    """Fold every epoch's counter table into the current global sketch —
    one scan of KB-sized files + one groupBy-sum."""
    from gemini_data_wrangler_spark.operators.sketches import cms_merge

    return cms_merge(spark.read.parquet(out_dir).select("row", "bucket", "cnt"))


def streaming_hll_daily_sink(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    id_col: str = "user_id",
    lgk: int = 14,
):
    """Incremental distinct-reach maintenance over a stream: every
    micro-batch reduces to per-day Datasketches HLL sketches of the id
    column (KBs per day) and lands at ``out_dir/epoch=<id>`` with
    epoch-overwrite idempotence (same replay contract as the CMS sink).
    Sketches union associatively across epochs AND days, so any window's
    reach is a fold over the tiny sketch files — history is never
    re-scanned. Streaming twin of `events_reach_hll_sliding_check`.

    Returns the started StreamingQuery (availableNow trigger)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(F.to_date(ts_col).alias("d"), id_col)
            .groupBy("d")
            .agg(F.hll_sketch_agg(id_col, F.lit(lgk)).alias("sk"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    return (
        events_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hll_read_sliding_reach(spark, out_dir: str, window_days: int = 7) -> DataFrame:
    """Fold the epoch×day sketch files into per-day sketches (one
    ``hll_union_agg`` groupBy over KB-sized inputs), then answer sliding
    ``window_days`` reach per day via the bounded range join — the
    read side of :func:`streaming_hll_daily_sink`.

    Output: window_end date, est_reach double."""
    daily = (
        spark.read.parquet(out_dir)
        .groupBy("d")
        .agg(F.hll_union_agg("sk", F.lit(True)).alias("sk"))
    )
    days = daily.select(F.col("d").alias("window_end"))
    return (
        days.join(
            F.broadcast(daily),
            (F.col("d") <= F.col("window_end"))
            & (F.col("d") > F.date_sub(F.col("window_end"), window_days)),
        )
        .groupBy("window_end")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias(
                "est_reach"
            )
        )
    )


def streaming_user_lifetime_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user lifetime counters via ``transformWithStateInPandas`` —
    Spark 4's typed successor to ``applyInPandasWithState`` (SPARK-45939
    "State API v2"): a ``StatefulProcessor`` with a named ``ValueState``
    replaces the positional state tuple, state lives in the state store
    keyed by user, and each micro-batch emits that user's updated
    running (event count, total value).

    Scale behavior matches the v1 operator family: state is one fixed-size
    record per key in the HDFS/RocksDB-backed store, input flows through
    Arrow batches, and the watermark keeps the shuffle bounded. Use TTL
    (``getValueState(..., ttlDurationMs=...)``) when keys churn — lifetime
    counters here deliberately never expire.

    Runtime requirement: the State-API-v2 Python worker speaks protobuf to
    the JVM state server, so ``google.protobuf`` must be importable on the
    workers (it ships with any ``pyspark[connect]`` install). Environments
    without it should use ``streaming_session_stats``'s
    ``applyInPandasWithState`` v1 path — same bounded-state semantics.

    Output (Update mode): user_id, n_events, total_value.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = "user_id long, n_events long, total_value double"

    class LifetimeStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", "n long, v double")

        def handleInputRows(self, key, rows, timerValues):
            got = self._acc.get()
            n, v = (got[0], got[1]) if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._acc.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
            )

        def close(self) -> None:
            pass

    for name, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(name, F.col(name).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=LifetimeStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="EventTime",
        )
    )


def streaming_user_lifetime_stats_v1(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Semantic twin of `streaming_user_lifetime_stats` on the State-API-v1
    operator (``applyInPandasWithState``): same per-user lifetime
    (event count, value total) counters, same Update-mode output schema,
    but the v1 Python worker speaks Spark's plain Arrow state channel and
    needs NO google.protobuf — so this path runs everywhere, while the v2
    path additionally requires protobuf on the workers (its state server
    protocol is protobuf-framed). Tests exercise this twin unconditionally
    and the v2 operator where protobuf is importable; both must converge
    to the batch per-user totals.

    Scale behavior is identical: one fixed-size state record per key in
    the state store, Arrow-batched input, watermark-bounded shuffle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, v double"

    def update(key, pdf_iter, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    for name, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(name, F.col(name).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ewma_anomaly(
    stream: DataFrame,
    alpha: float = 0.1,
    k_sigma: float = 4.0,
    min_n: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming anomaly detector: per event type, an EWMA of the
    event value and an exponentially-weighted variance, updated in event
    order; an event is flagged when it lands more than ``k_sigma``·σ away
    from the PRE-UPDATE mean (after a ``min_n`` warm-up so early noise
    doesn't alert). The state is three numbers per key — (ewma, ewvar, n)
    — the bounded-memory recurrence shape that built-in windowed
    aggregations cannot express (each event's baseline depends on every
    prior event through the decay, not on a fixed window).

    West (1979)-style EW update: d = v − ewma; incr = alpha·d;
    ewma += incr; ewvar = (1 − alpha)·(ewvar + d·incr).

    Output (append mode): event_id, event_type, ts, value, baseline,
    sigma, zscore — flagged events only. State never times out (|types|
    keys is bounded); for unbounded key spaces pair with an event-time
    timeout like `streaming_session_stats`.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "event_id long, event_type string, ts timestamp, value double, "
        "baseline double, sigma double, zscore double"
    )
    state_schema = "ewma double, ewvar double, n long"

    def update(key, pdf_iter, state: GroupState):
        (etype,) = key
        rows = []
        pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        if state.exists:
            ewma, ewvar, n = state.get
        else:
            ewma, ewvar, n = 0.0, 0.0, 0
        for eid, ts, v in zip(pdf["event_id"], pdf["ts"], pdf["value"]):
            v = float(v)
            if n >= min_n:
                sigma = max(ewvar, 0.0) ** 0.5
                if sigma > 0 and abs(v - ewma) > k_sigma * sigma:
                    rows.append(
                        (
                            int(eid),
                            etype,
                            ts.to_pydatetime(),
                            v,
                            ewma,
                            sigma,
                            (v - ewma) / sigma,
                        )
                    )
            d = v - ewma
            incr = alpha * d
            ewma = ewma + incr
            ewvar = (1 - alpha) * (ewvar + d * incr)
            n += 1
        state.update((ewma, ewvar, n))
        yield pd.DataFrame(
            rows,
            columns=[
                "event_id", "event_type", "ts", "value",
                "baseline", "sigma", "zscore",
            ],
        )

    for name, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(name, F.col(name).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
