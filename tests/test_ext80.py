"""Property tests for extension batch 80: logistic regression vs numpy
IRLS, RANSAC sanity, b-bit calibration."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_logistic_matches_numpy_irls(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = _q("stats_logistic_regression")(spark, SF_ORACLE).collect()[0]

    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    grid = (
        orders.groupBy(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("x1"),
            F.floor(F.col("o_totalprice") / 50000).cast("int").alias("x2"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("k"),
        )
        .collect()
    )
    X = np.array([[1.0, g["x1"], g["x2"]] for g in grid])
    n = np.array([float(g["n"]) for g in grid])
    k = np.array([float(g["k"]) for g in grid])
    beta = np.zeros(3)
    for _ in range(8):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = n * p * (1 - p)
        H = X.T @ (X * w[:, None])
        g = X.T @ (k - n * p)
        beta = beta + np.linalg.solve(H, g)
    assert abs(row["b0"] - beta[0]) < 1e-4, (row, beta)
    assert abs(row["b1"] - beta[1]) < 1e-4
    assert abs(row["b2"] - beta[2]) < 1e-4
    # deviance non-negative, cells sane
    assert row["deviance"] >= 0
    assert row["n_cells"] == len(grid)


def test_ransac_line_sane(spark):
    row = _q("stats_ransac_line")(spark, SF_ORACLE).collect()[0]
    assert 1 <= row["sample_id"] <= 32
    assert row["n_inliers"] >= 1
    assert 0 < row["inlier_frac"] <= 1


def test_bbit_bound_holds(spark):
    rows = _q("sketch_bbit_minhash_check")(spark, SF_ORACLE).collect()
    assert rows and all(r["bound_ok"] for r in rows)
    assert all(r["exact_jaccard"] >= 0.8 for r in rows)
