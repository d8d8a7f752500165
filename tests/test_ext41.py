"""Property tests for extension batch 41: backtest error sanity,
compression signal exact-equality and repetition cross-check."""

from __future__ import annotations

import zlib

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_backtest_errors_positive_and_beat_nothing_trivially(spark):
    r = _q("forecast_holt_backtest")(spark, SF_ORACLE).collect()[0]
    assert r["n_evaluated"] == 29  # 30 days, first has no prior forecast
    assert 0.0 < r["mape"] < 1.0  # forecasting daily totals, not noise
    assert r["rmse"] > 0.0


def test_compression_signal_equals_direct_zlib(spark):
    from gemini_data_wrangler_spark.queries_ext41 import compression_signal_frame
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    table = load_sf_tables(spark, SF_ORACLE)["documents"]
    rows = {
        r["doc_id"]: r
        for r in compression_signal_frame(table.select("doc_id", "text")).collect()
    }
    docs = table.collect()
    assert len(rows) == len(docs)
    for d in docs:
        raw = d["text"].encode("utf-8")
        r = rows[d["doc_id"]]
        assert r["raw_bytes"] == len(raw)
        assert r["compressed_bytes"] == len(zlib.compress(raw, 6))
        assert 0.0 < r["ratio"] < 1.5
    # Cross-check: the corpus is whitespace-joined words from a tiny
    # vocabulary — ratios must sit well below incompressible (≈1.0).
    import statistics

    assert statistics.mean(r["ratio"] for r in rows.values()) < 0.6
    # The registered bound-gate projection must pin TRUE on every row
    # (what the DuckDB oracle asserts).
    gated = _q("text_compression_signal")(spark, SF_ORACLE).collect()
    assert len(gated) == len(docs)
    assert all(r["bound_ok"] for r in gated)


def test_compression_bound_holds_for_large_incompressible_text(spark):
    """The bound_ok envelope is size-proportional (zlib's deflateBound:
    raw + raw/4096 + raw/16384 + 13, plus 64 headroom): zlib level-6 on
    incompressible input above ~760 KB exceeds the old flat raw+64
    envelope, so a large low-compressibility document must still gate
    TRUE."""
    import random
    import zlib

    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.queries_ext41 import compression_signal_frame

    rng = random.Random(41)
    # True random bytes are the worst case: zlib stores them with
    # per-window overhead, violating the old flat raw+64 envelope above
    # ~760 KB. (Valid UTF-8 text caps at ~7 bits/byte of entropy so a
    # string column alone can't quite reach it — the formula is pinned
    # against raw zlib here, the Spark gate against a large doc below.)
    def envelope(n: int) -> int:
        return n + n // 4096 + n // 16384 + 77

    blob = rng.randbytes(900_000)
    comp_blob = len(zlib.compress(blob, 6))
    assert comp_blob > len(blob) + 64  # the flat envelope really breaks
    assert comp_blob <= envelope(len(blob))
    # every level, since the operator's level choice is an impl detail
    for lvl in (0, 1, 6, 9):
        assert len(zlib.compress(blob, lvl)) <= envelope(len(blob)), lvl

    # printable ASCII, high-entropy: the hardest realistic string input
    big = "".join(chr(rng.randint(33, 126)) for _ in range(900_000))
    raw = big.encode("utf-8")
    comp = len(zlib.compress(raw, 6))
    assert comp <= envelope(len(raw))

    df = spark.createDataFrame([(1, big)], "doc_id bigint, text string")
    out = compression_signal_frame(df).select(
        "doc_id",
        "raw_bytes",
        (
            (F.col("compressed_bytes") > 0)
            & (
                F.col("compressed_bytes")
                <= F.col("raw_bytes")
                + F.floor(F.col("raw_bytes") / F.lit(4096))
                + F.floor(F.col("raw_bytes") / F.lit(16384))
                + 77
            )
        ).alias("bound_ok"),
    ).collect()[0]
    assert out["raw_bytes"] == len(raw)
    assert out["bound_ok"] is True
