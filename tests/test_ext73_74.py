"""Property tests for extension batches 73-74 (oracle hash parity is in
test_oracle_parity; these check semantics against independent references)."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_sequential_pairs_subset_of_cooccurrence(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("events_sequential_pairs")(spark, SF_ORACLE).collect()
    assert rows
    ev = load_sf_tables(spark, SF_ORACLE)["events"].collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    for r in rows[:10]:
        expect = 0
        for seq in by_user.values():
            ts_a = [t for t, e in seq if e == r["type_a"]]
            ts_b = [t for t, e in seq if e == r["type_b"]]
            if ts_a and ts_b and min(ts_a) < max(ts_b):
                expect += 1
        assert r["n_users"] == expect


def test_max_drawdown_nonnegative_and_spotcheck(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("running_max_drawdown")(spark, SF_ORACLE).collect()
    assert all(r["max_drawdown"] >= 0 for r in rows)
    orders = load_sf_tables(spark, SF_ORACLE)["orders"].collect()
    series: dict = {}
    for o in sorted(orders, key=lambda o: (o["o_orderdate"], o["o_orderkey"])):
        series.setdefault(o["o_custkey"], []).append(o["o_totalprice"])
    got = {r["o_custkey"]: r["max_drawdown"] for r in rows}
    for ck in list(series)[:20]:
        bal = np.cumsum(series[ck])
        dd = float(np.max(np.maximum.accumulate(bal) - bal))
        assert abs(got[ck] - round(dd, 6)) < 1e-6


def test_rising_streak_vs_python(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables
    import collections

    r = _q("timeseries_rising_streak")(spark, SF_ORACLE).collect()[0]
    orders = load_sf_tables(spark, SF_ORACLE)["orders"].collect()
    daily = collections.defaultdict(float)
    for o in orders:
        daily[o["o_orderdate"].date() if hasattr(o["o_orderdate"], "date") else o["o_orderdate"]] += o["o_totalprice"]
    vals = [daily[d] for d in sorted(daily)]
    longest = cur = 0
    for prev, nxt in zip(vals, vals[1:]):
        cur = cur + 1 if nxt > prev else 0
        longest = max(longest, cur)
    assert r["longest_rising_streak"] == longest


def test_ols_matches_numpy(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    r = _q("stats_ols_two_features")(spark, SF_ORACLE).collect()[0]
    li = (
        load_sf_tables(spark, SF_ORACLE)["lineitem"]
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    X = np.array([[1.0, q, d] for q, d, _ in li])
    y = np.array([p for _, _, p in li])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(r["intercept"] - beta[0]) < 1e-2
    assert abs(r["beta_quantity"] - beta[1]) < 1e-4
    assert abs(r["beta_discount"] - beta[2]) < 1e-2
    resid = y - X @ beta
    r2 = 1 - resid @ resid / ((y - y.mean()) @ (y - y.mean()))
    assert abs(r["r2"] - r2) < 1e-5


def test_durbin_watson_in_range(spark):
    r = _q("stats_durbin_watson")(spark, SF_ORACLE).collect()[0]
    assert 0.0 <= r["durbin_watson"] <= 4.0
    assert r["n_days"] > 100


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        _q("vocab_coverage_curve")(spark, SF_ORACLE).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == [100, 500, 1000, 5000]
    cov = [r["coverage"] for r in rows]
    assert all(a <= b for a, b in zip(cov, cov[1:]))
    assert 0 < cov[0] <= cov[-1] <= 1.0
