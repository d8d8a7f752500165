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
