"""Property tests for extension batch 25 (beyond oracle parity):
band-join equivalence to the naive form, normalization invariants,
privacy-gate soundness, fit-quality bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_seasonal_anomaly_covers_every_day(spark):
    rows = _q("timeseries_seasonal_anomaly")(spark, SF_ORACLE).collect()
    assert len(rows) == 30  # one row per day of the events month
    flagged = [r for r in rows if r["is_anomaly"]]
    # 2σ against a same-weekday baseline: most days are NOT anomalous.
    assert len(flagged) < len(rows) // 2


def test_quantile_normalize_equalizes_source_marginals(spark):
    df = _q("feature_quantile_normalize")(spark, SF_ORACLE)
    rows = df.collect()
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    assert len(rows) == docs.count()  # total function: every doc normalized
    # After normalization, per-source medians collapse toward the global
    # median (raw medians differ across sources by construction or not —
    # either way the normalized spread must not exceed the raw spread).
    import statistics

    by_src_norm: dict[str, list] = {}
    by_src_raw: dict[str, list] = {}
    for r in rows:
        by_src_norm.setdefault(r["source"], []).append(r["normalized"])
        by_src_raw.setdefault(r["source"], []).append(r["n_chars"])
    med_norm = [statistics.median(v) for v in by_src_norm.values()]
    med_raw = [statistics.median(v) for v in by_src_raw.values()]
    assert max(med_norm) - min(med_norm) <= max(med_raw) - min(med_raw)
    # Values come from the global distribution.
    global_vals = {r["n_chars"] for r in docs.select("n_chars").collect()}
    assert {r["normalized"] for r in rows} <= global_vals


def test_l_diversity_flags_match_distinct_counts(spark):
    rows = _q("dq_l_diversity")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["l_distinct"] <= 3
        assert r["l_diverse"] == (r["l_distinct"] >= 3)
        assert r["group_size"] >= r["l_distinct"]


def test_zipf_fit_is_decreasing_power_law(spark):
    r = _q("text_zipf_fit")(spark, SF_ORACLE).collect()[0]
    # Frequency falls with rank: slope strictly negative; R² in [0, 1].
    assert r["zipf_slope"] < 0
    assert 0.0 <= r["zipf_r2"] <= 1.0
    assert r["n_ranks"] > 0


def test_band_join_matches_naive_cross_join(spark):
    got = {
        (r["s_suppkey"], r["c_custkey"])
        for r in _q("join_band_acctbal")(spark, SF_ORACLE).collect()
    }
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    t = load_sf_tables(spark, SF_ORACLE)
    naive = {
        (r["s_suppkey"], r["c_custkey"])
        for r in t["supplier"]
        .crossJoin(t["customer"])
        .filter(F.abs(F.col("s_acctbal") - F.col("c_acctbal")) <= 10.0)
        .select("s_suppkey", "c_custkey")
        .collect()
    }
    assert got == naive and got
