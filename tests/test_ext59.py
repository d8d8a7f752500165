"""Property tests for extension batch 59: modularity, dispersion."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_modularity_of_cc_partition(spark):
    r = _q("graph_modularity")(spark, SF_ORACLE).collect()[0]
    assert r["n_clusters"] >= 1 and r["n_edges"] >= 1
    # CC partition: every edge internal -> Q = 1 - sum (d_c/2m)^2, so
    # 0 < Q < 1 unless the graph is a single component (then Q = 0).
    assert -0.5 <= r["modularity"] < 1.0
    if r["n_clusters"] > 1:
        assert r["modularity"] > 0


def test_modularity_matches_python(spark):
    """Recompute Q from the pair set + labels with plain Python."""
    from gemini_data_wrangler_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", n=5, threshold=0.8).collect()
    ]
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            minhash_lsh_pairs(docs, "doc_id", "text", n=5, threshold=0.8)
        ).collect()
    }
    m = len(pairs)
    from collections import Counter

    mc, dc = Counter(), Counter()
    for a, b in pairs:
        if labels[a] == labels[b]:
            mc[labels[a]] += 1
        dc[labels[a]] += 1
        dc[labels[b]] += 1
    q = sum(mc[c] / m - (dc[c] / (2 * m)) ** 2 for c in dc)
    got = _q("graph_modularity")(spark, SF_ORACLE).collect()[0]
    assert got["n_edges"] == m
    assert abs(got["modularity"] - q) < 1e-4


def test_dispersion_index_by_type(spark):
    rows = _q("events_dispersion_index")(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_hours"] > 24
        assert r["mean_per_hour"] > 0
        assert r["dispersion_index"] > 0
        assert r["poisson_like"] in (True, False)
