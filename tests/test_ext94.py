"""Property tests for extension batch 94: rich-club vs brute force, MDE
monotonicity, tail-dependence bounds."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_rich_club_matches_bruteforce(spark):
    from gemini_data_wrangler_spark.operators.dedup import minhash_lsh_pairs
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = {r["k"]: r for r in _q("graph_rich_club")(spark, SF_ORACLE).collect()}
    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    pairs = [
        (p["doc_a"], p["doc_b"])
        for p in minhash_lsh_pairs(docs, "doc_id", "text", n=5, threshold=0.8).collect()
    ]
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    for k, r in rows.items():
        club = {n for n, d in deg.items() if d > k}
        m = sum(1 for a, b in pairs if a in club and b in club)
        assert r["n_nodes"] == len(club), (k, r)
        assert r["n_edges"] == m
        possible = len(club) * (len(club) - 1) / 2
        assert abs(r["phi"] - m / possible) < 1e-5


def test_mde_curve_monotone(spark):
    rows = sorted(_q("ab_mde_curve")(spark, SF_ORACLE).collect(), key=lambda r: r["day"])
    assert rows
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns)
    # MDE shrinks as accrual grows (allowing small base-rate drift wiggle)
    assert rows[-1]["mde_abs"] < rows[0]["mde_abs"]
    for r in rows:
        assert 0 < r["mde_abs"] < 2
        assert 0 < r["base_rate"] < 1


def test_tail_dependence_bounds(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = _q("stats_tail_dependence")(spark, SF_ORACLE).collect()[0]
    assert 0 <= row["lambda_upper"] <= 1
    assert row["n_joint"] <= row["n_x_tail"]
    # brute-force recomputation from the joined rows
    import numpy as np

    t = load_sf_tables(spark, SF_ORACLE)
    o = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .groupBy(t["orders"]["o_orderkey"], F.col("o_totalprice").alias("x"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    xs = np.array([r["x"] for r in o])
    ys = np.array([float(r["y"]) for r in o])
    tx = np.percentile(xs, 90)
    ty = np.percentile(ys, 90)
    n_x = int((xs > tx).sum())
    n_j = int(((xs > tx) & (ys > ty)).sum())
    assert row["n_x_tail"] == n_x
    assert row["n_joint"] == n_j
    assert abs(row["lambda_upper"] - n_j / n_x) < 1e-5
