"""Property tests for extension batch 68: kNN outliers, personalized
PageRank, VARIANT access."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_knn_outlier_zscores(spark):
    rows = _q("similarity_knn_outlier")(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    n_out = sum(1 for r in rows if r["is_outlier"])
    # 2σ gate: some but few outliers
    assert 0 < n_out < 50
    import statistics

    d = [r["knn_dist"] for r in rows]
    mu, sd = statistics.mean(d), statistics.pstdev(d)
    for r in rows[:50]:
        assert abs(r["z"] - (r["knn_dist"] - mu) / sd) < 1e-4
        assert r["is_outlier"] == (round(r["knn_dist"] - (mu + 2 * sd), 6) > 0)


def test_personalized_pagerank_numpy_reference(spark):
    """PPR must match a dense power iteration with seeded restart."""
    import numpy as np

    from gemini_data_wrangler_spark.operators.graphs import personalized_pagerank
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables
    import pyspark.sql.functions as F

    li = (
        load_sf_tables(spark, SF_ORACLE)["lineitem"]
        .filter(F.col("l_shipdate").between("1995-01-01", "1995-12-31"))
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = li.union(li.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pairs = {(r["src"], r["dst"]) for r in edges.collect()}
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[b], idx[a]] = 1.0
    outdeg = A.sum(axis=0)
    P = A / outdeg
    s = np.array([1.0 if node % 20 == 0 else 0.0 for node in nodes])
    s /= s.sum()
    r = s.copy()
    for _ in range(5):
        r = 0.15 * s + 0.85 * (P @ r)
    seeds = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct().filter(F.col("node") % 20 == 0)
    got = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(edges, seeds, iterations=5).collect()
    }
    assert set(got) == set(nodes)
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-9
    # proximity semantics: total mass conserved, seeds hold extra mass
    assert abs(sum(got.values()) - 1.0) < 1e-9
    seed_mass = sum(v for k, v in got.items() if k % 20 == 0)
    n_seed = sum(1 for k in got if k % 20 == 0)
    assert seed_mass / n_seed > (1 - seed_mass) / (n - n_seed)


def test_variant_bank_matches_json_strings(spark):
    rows = _q("scalar_variant_functions")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["k_val"] == r["event_id"] % 100
        assert r["second_tag"] == "x"
        assert abs(r["price"] - (r["event_id"] % 7 + 0.5)) < 1e-12
        assert r["ok_flag"] == (r["event_id"] % 2 == 0)
        assert r["missing_val"] is None
