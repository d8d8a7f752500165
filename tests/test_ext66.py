"""Property tests for extension batch 66: Croston forecast, token
entropy, deterministic mode, moment statistics."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_croston_matches_python_recursion(spark):
    rows = sorted(
        _q("forecast_croston")(spark, SF_ORACLE).collect(), key=lambda r: r["d"]
    )
    assert len(rows) == 30  # full date spine, zero-filled
    a = 0.2
    z = p = q = 0.0
    started = False
    for r in rows:
        x = r["demand"]
        if x > 0:
            if not started:
                z, p, started = x, q + 1, True
            else:
                z = a * x + (1 - a) * z
                p = a * (q + 1) + (1 - a) * p
            q = 0.0
        else:
            q += 1
        assert abs(r["size_smooth"] - z) < 1e-5, r
        assert abs(r["interval_smooth"] - p) < 1e-5, r
        if started:
            assert abs(r["forecast"] - z / p) < 1e-5
        else:
            assert r["forecast"] is None
    assert started  # the cohort actually purchased
    # intermittency: the series must contain zero days
    assert any(r["demand"] == 0 for r in rows)


def test_token_entropy_matches_python(spark):
    import math
    from collections import Counter

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"].collect()
    got = {r["doc_id"]: r for r in _q("text_token_entropy")(spark, SF_ORACLE).collect()}
    assert len(got) == len(docs)
    import random

    for r in random.Random(7).sample(docs, 25):
        c = Counter(r["text"].strip().split())
        n = sum(c.values())
        h = -sum(v / n * math.log(v / n) for v in c.values())
        g = got[r["doc_id"]]
        assert g["n_tokens"] == n
        assert g["n_distinct"] == len(c)
        assert abs(g["entropy"] - h) < 1e-5
        if len(c) > 1:
            assert abs(g["entropy_norm"] - h / math.log(len(c))) < 1e-5
        assert 0 <= g["entropy_norm"] <= 1 + 1e-9


def test_mode_deterministic_tiebreak(spark):
    from collections import Counter

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"].collect()
    by = {}
    for r in orders:
        by.setdefault(r["o_orderpriority"], Counter())[r["o_orderdate"].month] += 1
    got = {r["grp"]: r for r in _q("agg_mode_deterministic")(spark, SF_ORACLE).collect()}
    assert set(got) == set(by)
    for g, cnt in by.items():
        best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
        assert got[g]["mode_month"] == best[0]
        assert got[g]["mode_count"] == best[1]


def test_moments_match_python(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"].collect()
    vals = {}
    for r in orders:
        vals.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    got = {
        r["grp"]: r for r in _q("stats_skewness_kurtosis")(spark, SF_ORACLE).collect()
    }
    for g, xs in vals.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        assert got[g]["n"] == n
        assert abs(got[g]["skewness"] - m3 / m2**1.5) < 1e-4
        assert abs(got[g]["excess_kurtosis"] - (m4 / m2**2 - 3)) < 1e-4
