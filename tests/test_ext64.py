"""Property tests for extension batch 64: average precision, Spearman,
Adamic–Adar."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_average_precision_against_direct_recompute(spark):
    """Recompute AP with a direct Python descending-threshold sweep."""
    from gemini_data_wrangler_spark.queries_ext44 import _scored

    rows = _scored(spark, SF_ORACLE).collect()
    from collections import defaultdict

    by = defaultdict(lambda: [0, 0])
    for r in rows:
        by[r["score"]][0] += r["pos"]
        by[r["score"]][1] += 1 - r["pos"]
    n_pos = sum(v[0] for v in by.values())
    tp = n = ap = 0
    for s in sorted(by, reverse=True):
        np_s, nf_s = by[s]
        tp += np_s
        n += np_s + nf_s
        ap += np_s * (tp / n)
    ap /= n_pos
    got = _q("quality_pr_auc")(spark, SF_ORACLE).collect()[0]
    assert got["n_pos"] == n_pos
    assert abs(got["average_precision"] - ap) < 1e-5
    # random-score baseline would be prevalence; sanity: AP within [prev, 1]
    prevalence = n_pos / (got["n_pos"] + got["n_neg"])
    assert prevalence - 1e-9 <= got["average_precision"] <= 1.0


def test_spearman_matches_python_midranks(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"].collect()
    import statistics
    from collections import defaultdict

    groups = defaultdict(list)
    for r in docs:
        groups[r["lang"]].append((r["n_chars"], len(r["text"].strip().split())))

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = avg
            i = j + 1
        return ranks

    got = {r["grp"]: r for r in _q("stats_spearman_corr")(spark, SF_ORACLE).collect()}
    assert set(got) == set(groups)
    for g, pairs in groups.items():
        rx = midranks([p[0] for p in pairs])
        ry = midranks([p[1] for p in pairs])
        rho = statistics.correlation(rx, ry)
        assert got[g]["n"] == len(pairs)
        assert abs(got[g]["spearman_rho"] - rho) < 1e-5
        # quantity ⟂ price component is strongly positive in TPC-H data
        assert got[g]["spearman_rho"] > 0.5


def test_adamic_adar_excludes_edges_and_scores_positive(spark):
    from gemini_data_wrangler_spark.operators.dedup import minhash_lsh_pairs
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    edges = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", n=5, threshold=0.8).collect()
    }
    got = _q("graph_adamic_adar")(spark, SF_ORACLE).collect()
    import math

    # direct wedge recompute
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {}
    nodes = sorted(nbrs)
    for w in nodes:
        ns = sorted(nbrs[w])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                u, v = ns[i], ns[j]
                if (u, v) in edges:
                    continue
                key = (u, v)
                c, s = expect.get(key, (0, 0.0))
                expect[key] = (c + 1, s + 1.0 / math.log(len(nbrs[w])))
    assert {(r["doc_u"], r["doc_v"]) for r in got} == set(expect)
    for r in got:
        c, s = expect[(r["doc_u"], r["doc_v"])]
        assert r["n_common"] == c
        assert abs(r["aa_score"] - s) < 1e-5
        assert (r["doc_u"], r["doc_v"]) not in edges
