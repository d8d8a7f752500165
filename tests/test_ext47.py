"""Property tests for extension batch 47: DBSCAN, Theil–Sen."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_dbscan_roles_partition_and_invariants(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("embedding_dbscan")(spark, SF_ORACLE).collect()
    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"]
    assert len(rows) == emb.count()
    roles = {r["vec_id"]: r for r in rows}
    n_core = sum(1 for r in rows if r["role"] == "core")
    n_border = sum(1 for r in rows if r["role"] == "border")
    n_noise = sum(1 for r in rows if r["role"] == "noise")
    assert n_core + n_border + n_noise == len(rows)
    assert n_core > 0  # tau=0.35/minPts=3 yields clusters on this corpus
    for r in rows:
        if r["role"] == "noise":
            assert r["cluster_id"] is None
        else:
            assert r["cluster_id"] is not None
            # cluster label is the min member id -> label <= member ids of
            # the labelled point only when the point IS in that cluster;
            # at minimum the label refers to an existing core point.
            assert roles[r["cluster_id"]]["role"] == "core"


def test_dbscan_against_sklearn_style_reference(spark):
    """Brute-force python DBSCAN (same tau/minPts/labeling rules) must
    produce the same core set and the same core partition."""
    import numpy as np

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"].orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in emb]
    M = np.array([r["embedding"] for r in emb], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(Mn @ Mn.T, 6)
    np.fill_diagonal(S, -2)
    adj = S >= 0.35
    deg = adj.sum(axis=1)
    core = {ids[i] for i in range(len(ids)) if deg[i] >= 3}
    got = {r["vec_id"]: r for r in _q("embedding_dbscan")(spark, SF_ORACLE).collect()}
    assert {v for v, r in got.items() if r["role"] == "core"} == core
    # connected components over core-core edges via union-find
    parent = {v: v for v in core}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    idx = {v: i for i, v in enumerate(ids)}
    for u in core:
        for w in core:
            if u < w and adj[idx[u]][idx[w]]:
                ru, rw = find(u), find(w)
                if ru != rw:
                    parent[max(ru, rw)] = min(ru, rw)
    expected_label = {v: find(v) for v in core}
    for v in core:
        assert got[v]["cluster_id"] == expected_label[v]


def test_theil_sen_robust_to_outlier(spark):
    """For the reported customers, the Theil-Sen slope must equal the
    numpy median of pairwise slopes."""
    import numpy as np

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables
    from pyspark.sql import functions as F

    rows = _q("customer_theil_sen_slopes")(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    top = rows[0]
    pts = (
        orders.filter(F.col("o_custkey") == top["o_custkey"])
        .select(
            F.datediff(
                F.to_date(F.date_trunc("day", "o_orderdate")),
                F.lit("1995-01-01").cast("date"),
            ).cast("double").alias("x"),
            F.col("o_totalprice").alias("y"),
            F.col("o_orderkey").alias("k"),
        )
        .collect()
    )
    slopes = [
        (b["y"] - a["y"]) / (b["x"] - a["x"])
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if a["x"] != b["x"] and ((a["k"] < b["k"]) or (b["k"] < a["k"]))
    ]
    # recompute with the same pair rule (k ordering picks each pair once;
    # slope is symmetric so orientation does not matter)
    assert top["n_pairs"] == len(slopes)
    assert abs(top["theil_sen_slope"] - round(float(np.median(slopes)), 4)) < 0.01
