"""Property tests for extension batch 75: interval merge, randomized
response, BFS hops (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_interval_merge_vs_python(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    tables = load_sf_tables(spark, SF_ORACLE)
    orders = {o["o_orderkey"]: o for o in tables["orders"].collect()}
    ends: dict = {}
    for l in tables["lineitem"].collect():
        ok = l["l_orderkey"]
        ends[ok] = max(ends.get(ok, l["l_shipdate"]), l["l_shipdate"])
    ivs: dict = {}
    for ok, e in ends.items():
        o = orders[ok]
        s = o["o_orderdate"]
        ivs.setdefault(o["o_custkey"], []).append((s, max(s, e)))
    got = {
        r["o_custkey"]: (r["n_merged_intervals"], r["covered_days"])
        for r in _q("ops_interval_merge")(spark, SF_ORACLE).collect()
    }
    for ck in list(ivs)[:40]:
        merged = []
        for s, e in sorted(ivs[ck]):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum((e - s).days + 1 for s, e in merged)
        assert got[ck] == (len(merged), covered)


def test_randomized_response_debias_near_truth(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    r = _q("privacy_randomized_response")(spark, SF_ORACLE).collect()[0]
    cust = load_sf_tables(spark, SF_ORACLE)["customer"].collect()
    true_rate = sum(1 for c in cust if c["c_mktsegment"] == "BUILDING") / len(cust)
    # debias recovers the true rate within sampling noise of the coin
    # (sd ≈ sqrt(p(1-p)/n)/(2p-1) ≈ 0.025 at n=1500) — 5σ bound
    assert abs(r["debiased_rate"] - true_rate) < 0.13
    assert r["n"] == len(cust)


def test_bfs_hops_vs_python(spark):
    import collections

    from gemini_data_wrangler_spark.operators.graphs import bfs_hops
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    # tiny adversarial long-chain graph: hop counts must equal the index
    chain = [(i, i + 1) for i in range(12)] + [(3, 7)]  # one shortcut
    edges = spark.createDataFrame(chain, ["src", "dst"])
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, 0).collect()}
    adj = collections.defaultdict(set)
    for a, b in chain:
        adj[a].add(b)
        adj[b].add(a)
    dist = {0: 0}
    frontier = [0]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    assert got == dist
    # corpus query sanity: every hop value ≤ max bound, seed at 0
    rows = _q("graph_bfs_hops")(spark, SF_ORACLE).collect()
    hops = {r["node"]: r["hops"] for r in rows}
    assert min(hops.values()) == 0 and max(hops.values()) <= 20


def test_bfs_route_equivalence_and_validation(spark):
    """Round-7: the bounded driver walk and the distributed Pregel loop
    must emit the identical distance table (same contract as the CC route
    pins), the auto route must fall back below a tiny forced bound, and a
    route typo must raise."""
    import pytest

    from gemini_data_wrangler_spark.operators.graphs import bfs_hops, multi_bfs_hops

    chain = [(i, i + 1) for i in range(12)] + [(3, 7), (20, 21)]
    edges = spark.createDataFrame(chain, ["src", "dst"])

    drv = {(r["node"], r["hops"]) for r in bfs_hops(edges, 0, route="auto").collect()}
    dist = {
        (r["node"], r["hops"])
        for r in bfs_hops(edges, 0, route="distributed").collect()
    }
    assert drv == dist
    # Auto with an over-tight bound must take the distributed loop and
    # still agree.
    fallback = {
        (r["node"], r["hops"])
        for r in bfs_hops(edges, 0, route="auto", max_edges=3).collect()
    }
    assert fallback == dist

    seeds = [0, 20]
    mdrv = {
        (r["seed"], r["node"], r["hops"])
        for r in multi_bfs_hops(edges, seeds, route="auto").collect()
    }
    mdist = {
        (r["seed"], r["node"], r["hops"])
        for r in multi_bfs_hops(edges, seeds, route="distributed").collect()
    }
    assert mdrv == mdist
    # Disconnected seed 20 reaches only its own 2-node component.
    assert {(n, h) for s, n, h in mdrv if s == 20} == {(20, 0), (21, 1)}

    with pytest.raises(ValueError, match="route"):
        bfs_hops(edges, 0, route="driverr")
    with pytest.raises(ValueError, match="route"):
        multi_bfs_hops(edges, seeds, route="driverr")


def test_bfs_corpus_route_equivalence(spark):
    """The registered distributed sibling and the auto-routed query agree
    on the full corpus graph (the same equivalence the shared oracle
    enforces in the driver, pinned locally too)."""
    auto = {
        (r["node"], r["hops"]) for r in _q("graph_bfs_hops")(spark, SF_ORACLE).collect()
    }
    forced = {
        (r["node"], r["hops"])
        for r in _q("graph_bfs_hops_distributed")(spark, SF_ORACLE).collect()
    }
    assert auto == forced


def test_closeness_matches_bfs_memo(spark):
    """graph_closeness_seeds reuses the co-order memo graph_bfs_hops
    publishes; its per-seed rollup must agree with independent single-seed
    BFS runs over the same published edges."""
    from gemini_data_wrangler_spark.operators.graphs import bfs_hops
    from gemini_data_wrangler_spark.queries_ext75 import _co_order_edges

    rows = _q("graph_closeness_seeds")(spark, SF_ORACLE).collect()
    edges = _co_order_edges(spark, SF_ORACLE, reuse=True)
    for r in sorted(rows, key=lambda x: x["seed"])[:2]:
        single = bfs_hops(edges, r["seed"]).collect()
        n_reach = len(single) - 1
        total = sum(x["hops"] for x in single)
        assert (r["n_reachable"], r["total_hops"]) == (n_reach, total)
