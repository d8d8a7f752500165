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
