"""Property tests for extension batch 86: FS-EM vs a pure-Python EM on
the same histogram, 4-cycle count vs brute force."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_fs_em_matches_python(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = _q("er_fellegi_sunter_em")(spark, SF_ORACLE).collect()[0]

    cust = load_sf_tables(spark, SF_ORACLE)["customer"].select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    by_nation = defaultdict(list)
    for c in cust:
        by_nation[c["c_nationkey"]].append(c)
    hist = defaultdict(int)
    for grp in by_nation.values():
        for x, y in combinations(sorted(grp, key=lambda c: c["c_custkey"]), 2):
            g = (
                int(x["c_mktsegment"] == y["c_mktsegment"]),
                int(abs(x["c_acctbal"] - y["c_acctbal"]) <= 500),
                int(x["c_acctbal"] // 1000 == y["c_acctbal"] // 1000),
            )
            hist[g] += 1
    p, m, u = 0.1, [0.8] * 3, [0.2] * 3
    eps = 1e-6
    for _ in range(15):
        wn = n = 0.0
        a = [0.0] * 3
        b = [0.0] * 3
        for g, cnt in sorted(hist.items()):
            pm = p
            pu = 1 - p
            for i in range(3):
                pm *= m[i] if g[i] else 1 - m[i]
                pu *= u[i] if g[i] else 1 - u[i]
            w = pm / (pm + pu)
            wn += cnt * w
            n += cnt
            for i in range(3):
                a[i] += cnt * w * g[i]
                b[i] += cnt * (1 - w) * g[i]
        clamp = lambda x: max(eps, min(1 - eps, x))
        p = clamp(wn / n)
        m = [clamp(a[i] / wn) for i in range(3)]
        u = [clamp(b[i] / (n - wn)) for i in range(3)]
    assert abs(row["p_match"] - p) < 1e-3, (row["p_match"], p)
    for got, want in zip(
        [row["m_segment"], row["m_acctbal"], row["m_balbucket"]], m
    ):
        assert abs(got - want) < 1e-3
    for got, want in zip(
        [row["u_segment"], row["u_acctbal"], row["u_balbucket"]], u
    ):
        assert abs(got - want) < 1e-3


def test_four_cycles_matches_bruteforce(spark):
    from gemini_data_wrangler_spark.operators.dedup import minhash_lsh_pairs
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = _q("graph_four_cycles")(spark, SF_ORACLE).collect()[0]

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=5, threshold=0.8).collect()
    adj = defaultdict(set)
    for p in pairs:
        adj[p["doc_a"]].add(p["doc_b"])
        adj[p["doc_b"]].add(p["doc_a"])
    c4 = 0
    nodes = sorted(adj)
    for u, v in combinations(nodes, 2):
        q = len(adj[u] & adj[v])
        c4 += q * (q - 1) // 2
    assert row["n_four_cycles"] == c4 // 2, (row["n_four_cycles"], c4 // 2)
    assert row["max_codegree"] >= 1 or row["n_coconnected_pairs"] == 0
