"""Property tests for extension batch 96: permutation-test validity,
CvM vs scipy-free reference."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_permutation_test_valid(spark):
    row = _q("stats_permutation_test")(spark, SF_ORACLE).collect()[0]
    assert row["n_permutations"] == 96
    assert 0 <= row["n_as_extreme"] <= 96
    # add-one p-value bounds
    assert 1 / 97 <= row["p_value"] <= 1.0
    expected_p = (1 + row["n_as_extreme"]) / 97
    assert abs(row["p_value"] - expected_p) < 1e-5


def test_cvm_matches_numpy(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = _q("stats_cramer_von_mises")(spark, SF_ORACLE).collect()[0]
    cust = load_sf_tables(spark, SF_ORACLE)["customer"].select(
        "c_acctbal", "c_mktsegment"
    ).collect()
    xs = np.array([c["c_acctbal"] for c in cust if c["c_mktsegment"] == "BUILDING"])
    ys = np.array([c["c_acctbal"] for c in cust if c["c_mktsegment"] != "BUILDING"])
    n, m = len(xs), len(ys)
    assert row["n"] == n and row["m"] == m
    pooled = np.sort(np.concatenate([xs, ys]))
    fx = np.searchsorted(np.sort(xs), pooled, side="right") / n
    fy = np.searchsorted(np.sort(ys), pooled, side="right") / m
    t = n * m / (n + m) ** 2 * np.sum((fx - fy) ** 2)
    assert abs(row["cvm_t"] - t) < 1e-4, (row["cvm_t"], t)
