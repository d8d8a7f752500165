"""Property tests for extension batch 92: regression discontinuity vs a
numpy local-linear reference."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def test_rdd_matches_numpy(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.queries import registry
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = registry()["ab_regression_discontinuity"][0](spark, SF_ORACLE).collect()[0]

    orders = load_sf_tables(spark, SF_ORACLE)["orders"].select(
        "o_totalprice", "o_orderstatus"
    ).collect()
    C, H = 200000.0, 100000.0
    xs = np.array([o["o_totalprice"] - C for o in orders])
    ys = np.array([1.0 if o["o_orderstatus"] == "F" else 0.0 for o in orders])
    m = (xs >= -H) & (xs < H)
    xs, ys = xs[m], ys[m]
    effects = {}
    for side, sel in ((0, xs < 0), (1, xs >= 0)):
        b, a = np.polyfit(xs[sel], ys[sel], 1)
        effects[side] = (a, b, int(sel.sum()))
    assert row["n_left"] == effects[0][2]
    assert row["n_right"] == effects[1][2]
    assert abs(row["intercept_left"] - effects[0][0]) < 1e-3
    assert abs(row["intercept_right"] - effects[1][0]) < 1e-3
    assert abs(row["rd_effect"] - (effects[1][0] - effects[0][0])) < 1e-3
