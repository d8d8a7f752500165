"""Property tests for extension batch 95: Simpson screen consistency,
elasticity vs numpy."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_simpsons_screen_consistent(spark):
    rows = _q("dq_simpsons_paradox_screen")(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    pooled = {r["pooled_diff"] for r in rows}
    assert len(pooled) == 1
    # pooled equals recomputation from the strata
    n1 = sum(r["n1"] for r in rows)
    k1 = sum(r["k1"] for r in rows)
    n0 = sum(r["n0"] for r in rows)
    k0 = sum(r["k0"] for r in rows)
    assert abs(pooled.pop() - (k1 / n1 - k0 / n0)) < 1e-5
    for r in rows:
        assert abs(r["stratum_diff"] - (r["k1"] / r["n1"] - r["k0"] / r["n0"])) < 1e-5


def test_elasticity_matches_numpy(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("sales_price_elasticity")(spark, SF_ORACLE).collect()
    assert rows
    t = load_sf_tables(spark, SF_ORACLE)
    data = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 0)
        .join(t["part"].select("p_partkey", "p_brand"),
              t["lineitem"]["l_partkey"] == F.col("p_partkey"))
        .select("p_brand", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_brand = {}
    for r in data:
        by_brand.setdefault(r["p_brand"], []).append(
            (np.log(r["l_extendedprice"] / r["l_quantity"]), np.log(r["l_quantity"]))
        )
    for r in rows[:5]:
        xy = np.array(by_brand[r["p_brand"]])
        b, a = np.polyfit(xy[:, 0], xy[:, 1], 1)
        assert abs(r["elasticity"] - b) < 1e-3, (r["p_brand"], r["elasticity"], b)
