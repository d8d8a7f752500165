"""Property tests for extension batch 67: mutual-kNN graph, QQ deciles,
hapax ratio."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_knn_directed_matches_bruteforce(spark):
    """The tiled-pruned kNN must equal full brute-force numpy kNN."""
    import numpy as np

    from gemini_data_wrangler_spark.operators.similarity import knn_directed
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"]
    # tiny blocks force many tiles — exercises the superset-pruning logic
    got = knn_directed(emb, k=5, block_rows=120).collect()
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    expect = {}
    for i, qid in enumerate(ids):
        order = sorted(
            range(len(ids)),
            key=lambda j: (-round(sims[i, j], 6), ids[j]),
        )[:5]
        expect[qid] = [(ids[j], round(sims[i, j], 6)) for j in order]
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["sim"]))
    assert set(by_q) == set(ids.tolist())
    for qid, lst in by_q.items():
        lst.sort()
        assert [(v, s) for _, v, s in lst] == [
            (v, s) for v, s in expect[qid]
        ], qid


def test_mutual_knn_edges_are_mutual(spark):
    rows = _q("similarity_mutual_knn")(spark, SF_ORACLE).collect()
    assert rows, "synthetic clusters should produce mutual edges"
    for r in rows:
        assert r["vec_u"] < r["vec_v"]
        assert 1 <= r["rank_uv"] <= 5 and 1 <= r["rank_vu"] <= 5
        assert -1.0 <= r["sim"] <= 1.0


def test_qq_deciles_monotone(spark):
    rows = sorted(_q("stats_qq_deciles")(spark, SF_ORACLE).collect(), key=lambda r: r["p"])
    assert [round(r["p"], 1) for r in rows] == [round(0.1 * i, 1) for i in range(1, 10)]
    for a, b in zip(rows, rows[1:]):
        assert b["q_a"] >= a["q_a"] and b["q_b"] >= a["q_b"]
    for r in rows:
        assert abs(r["qq_gap"] - (r["q_b"] - r["q_a"])) < 1e-6


def test_hapax_ratio_matches_python(spark):
    from collections import Counter

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"].collect()
    wf = {}
    for r in docs:
        c = wf.setdefault(r["source"], Counter())
        c.update(r["text"].strip().lower().split())
    got = {r["source"]: r for r in _q("text_hapax_ratio")(spark, SF_ORACLE).collect()}
    assert set(got) == set(wf)
    for s, c in wf.items():
        g = got[s]
        assert g["n_tokens"] == sum(c.values())
        assert g["vocab"] == len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        assert g["hapax"] == hapax
        assert abs(g["hapax_ratio"] - hapax / len(c)) < 1e-6
