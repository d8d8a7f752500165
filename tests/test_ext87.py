"""Property tests for extension batch 87: HITS vs numpy SVD direction,
funnel significance sanity."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_hits_matches_numpy_svd(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("graph_hits_top")(spark, SF_ORACLE).collect()
    hubs = {r["node_id"]: r["score"] for r in rows if r["side"] == "hub"}
    auths = {r["node_id"]: r["score"] for r in rows if r["side"] == "authority"}
    assert len(hubs) == 10 and len(auths) == 10
    assert all(0 <= v <= 1 for v in list(hubs.values()) + list(auths.values()))

    t = load_sf_tables(spark, SF_ORACLE)
    edges = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .collect()
    )
    cs = sorted({e["c"] for e in edges})
    ss = sorted({e["s"] for e in edges})
    ci = {c: i for i, c in enumerate(cs)}
    si = {s: i for i, s in enumerate(ss)}
    A = np.zeros((len(cs), len(ss)))
    for e in edges:
        A[ci[e["c"]], si[e["s"]]] = 1.0
    # HITS fixed point = principal left/right singular vectors of A
    u, sv, vt = np.linalg.svd(A, full_matrices=False)
    hub_ref = np.abs(u[:, 0])
    auth_ref = np.abs(vt[0])
    top_hub_ref = [cs[i] for i in np.argsort(-hub_ref)[:10]]
    top_auth_ref = [ss[i] for i in np.argsort(-auth_ref)[:10]]
    # 12 iterations approximate the fixed point: demand >= 7/10 overlap
    assert len(set(hubs) & set(top_hub_ref)) >= 7, (sorted(hubs), top_hub_ref)
    assert len(set(auths) & set(top_auth_ref)) >= 7


def test_funnel_significance_shape(spark):
    rows = sorted(
        _q("events_funnel_significance")(spark, SF_ORACLE).collect(),
        key=lambda r: r["step"],
    )
    assert [r["transition"] for r in rows] == [
        "view->click",
        "click->signup",
        "signup->purchase",
    ]
    for r in rows:
        assert 0 <= r["conv"] <= 1
        assert r["n_to"] <= r["n_from"]
        assert 0 <= r["p_two_sided"] <= 1.0001
