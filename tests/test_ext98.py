"""Property tests for extension batch 98: Breusch-Pagan vs numpy,
readability and Atkinson invariants."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_breusch_pagan_matches_numpy(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = _q("stats_breusch_pagan")(spark, SF_ORACLE).collect()[0]
    li = load_sf_tables(spark, SF_ORACLE)["lineitem"].select(
        "l_quantity", "l_extendedprice"
    ).collect()
    x = np.array([r["l_quantity"] for r in li], dtype=float)
    y = np.array([r["l_extendedprice"] for r in li], dtype=float)
    b, a = np.polyfit(x, y, 1)
    e2 = (y - a - b * x) ** 2
    g, c = np.polyfit(x, e2, 1)
    ss_exp = g * g * ((x - x.mean()) ** 2).sum()
    ss_tot = ((e2 - e2.mean()) ** 2).sum()
    lm = len(x) * ss_exp / ss_tot
    assert row["n"] == len(x)
    assert abs(row["lm_stat"] - lm) / max(lm, 1) < 1e-3, (row["lm_stat"], lm)
    assert 0 <= row["p_value"] <= 1.0001


def test_readability_sane(spark):
    rows = _q("text_readability_scores")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows[:50]:
        assert r["words"] >= 1
        assert r["sentences"] >= 1
        assert r["syllables"] >= 1
        # Flesch is unbounded below but capped above by its constant
        assert r["flesch"] <= 206.835


def test_atkinson_between_zero_and_one(spark):
    row = _q("agg_atkinson_index")(spark, SF_ORACLE).collect()[0]
    assert 0 <= row["atkinson_1"] < 1
    # AM-GM: geometric mean never exceeds arithmetic mean
    assert row["geomean_balance"] <= row["mean_balance"] + 1e-6
