"""Property tests for extension batch 61: MMR, split drift."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_mmr_matches_python_reference(spark):
    """Grouped-pandas MMR must equal a standalone Python greedy MMR."""
    import numpy as np

    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"]
    q = queries_from_ids(emb, [0, 1, 2, 3, 4])
    pool = cosine_topk(emb, q, k=30).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    got = {}
    for r in _q("similarity_mmr_topk")(spark, SF_ORACLE).collect():
        got.setdefault(r["query_id"], []).append((r["mmr_rank"], r["vec_id"]))
    for qid in (0, 1, 2, 3, 4):
        cands = sorted(
            [(r["sim"], -r["vec_id"]) for r in pool if r["query_id"] == qid],
            reverse=True,
        )
        ids = [-c[1] for c in cands]
        rel = {vid: s for s, nv in cands for vid in [-nv]}
        M = np.array([vecs[v] / np.linalg.norm(vecs[v]) for v in ids])
        S = M @ M.T
        idx = {v: i for i, v in enumerate(ids)}
        chosen = []
        for _ in range(5):
            best, bkey = None, None
            for v in ids:
                if v in chosen:
                    continue
                div = max(S[idx[v]][idx[c]] for c in chosen) if chosen else 0.0
                key = (0.7 * rel[v] - 0.3 * div, -v)
                if bkey is None or key > bkey:
                    best, bkey = v, key
            chosen.append(best)
        expected = [(i + 1, v) for i, v in enumerate(chosen)]
        assert sorted(got[qid]) == sorted(expected), qid


def test_mmr_gates_green(spark):
    rows = _q("similarity_mmr_check")(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    assert all(r["diversity_ok"] and r["relevance_ok"] for r in rows)


def test_split_drift_within_noise(spark):
    rows = _q("embedding_split_drift")(spark, SF_ORACLE).collect()
    assert len(rows) == 10  # one row per label
    for r in rows:
        assert r["centroid_dist"] >= 0
        assert r["noise_scale"] > 0
        # honest hash split: no label should drift beyond 4 noise units
        assert r["within_noise"] is True
