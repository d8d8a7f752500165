"""Property tests for extension batch 76 against numpy references."""

from __future__ import annotations

import math

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def _balances(spark, seg):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    return np.array(
        [
            r["c_acctbal"]
            for r in load_sf_tables(spark, SF_ORACLE)["customer"]
            .filter(f"c_mktsegment = '{seg}'")
            .collect()
        ]
    )


def test_welch_matches_numpy(spark):
    r = _q("stats_welch_ttest")(spark, SF_ORACLE).collect()[0]
    a, b = _balances(spark, "BUILDING"), _balances(spark, "MACHINERY")
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r["n1"] == len(a) and r["n2"] == len(b)
    assert abs(r["t_stat"] - t) < 1e-5
    assert abs(r["df_welch"] - df) < 1e-2


def test_jarque_bera_matches_numpy(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = {r["grp"]: r for r in _q("stats_jarque_bera")(spark, SF_ORACLE).collect()}
    orders = load_sf_tables(spark, SF_ORACLE)["orders"].collect()
    by_grp: dict = {}
    for o in orders:
        by_grp.setdefault(o["o_orderpriority"], []).append(o["o_totalprice"])
    for grp, vals in by_grp.items():
        x = np.array(vals)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        s = m3 / m2**1.5
        k = m4 / m2**2 - 3
        jb = len(x) / 6 * (s**2 + k**2 / 4)
        r = rows[grp]
        assert abs(r["skewness"] - s) < 1e-4
        assert abs(r["excess_kurtosis"] - k) < 1e-4
        assert abs(r["jarque_bera"] - jb) < max(1e-2, abs(jb) * 1e-4)
        assert r["jarque_bera"] > 5.99  # uniform-ish prices reject normality


def test_woe_iv_consistency(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("feature_woe_iv")(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    n_cust = load_sf_tables(spark, SF_ORACLE)["customer"].count()
    assert sum(r["n_good"] + r["n_bad"] for r in rows) == n_cust
    for r in rows:
        pg = r["n_good"] / sum(x["n_good"] for x in rows)
        pb = r["n_bad"] / sum(x["n_bad"] for x in rows)
        assert abs(r["woe"] - math.log(pg / pb)) < 1e-5
        assert r["iv_term"] >= 0  # (pg−pb) and ln(pg/pb) share sign
