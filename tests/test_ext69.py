"""Property tests for extension batch 69: kNN components, target
encoding, Gini split search, Pythagorean means."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_knn_components_valid_partition(spark):
    from gemini_data_wrangler_spark.operators.similarity import mutual_knn_edges
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"]
    edges = [(r["vec_u"], r["vec_v"]) for r in mutual_knn_edges(emb, k=5).collect()]
    # union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for n in parent:
        expect.setdefault(find(n), set()).add(n)
    got = _q("similarity_knn_components")(spark, SF_ORACLE).collect()
    got_clusters = {}
    for r in got:
        got_clusters.setdefault(r["cluster_id"], set()).add(r["vec_id"])
        assert r["cluster_size"] >= 2  # every member has a mutual neighbor
    assert {frozenset(v) for v in got_clusters.values()} == {
        frozenset(v) for v in expect.values()
    }
    for cid, members in got_clusters.items():
        assert cid == min(members)
    sizes = {r["vec_id"]: r["cluster_size"] for r in got}
    for members in got_clusters.values():
        for m in members:
            assert sizes[m] == len(members)


def test_target_encoding_identity(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    cust = load_sf_tables(spark, SF_ORACLE)["customer"].collect()
    from collections import defaultdict

    g = defaultdict(lambda: [0.0, 0])
    for r in cust:
        g[r["c_nationkey"]][0] += r["c_acctbal"]
        g[r["c_nationkey"]][1] += 1
    got = {r["custkey"]: r for r in _q("feature_target_encoding")(spark, SF_ORACLE).collect()}
    assert len(got) == len(cust)
    for r in cust[:200]:
        s, n = g[r["c_nationkey"]]
        if n > 1:
            expect = (s - r["c_acctbal"]) / (n - 1)
            assert abs(got[r["c_custkey"]]["target_enc"] - expect) < 1e-4


def test_best_split_minimizes_gini(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"].collect()
    data = sorted(
        (r["o_totalprice"], 1 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0)
        for r in orders
    )
    n = len(data)
    total_p = sum(y for _, y in data)
    best = None
    pl = nl = 0
    i = 0
    while i < n:
        j = i
        while j + 1 < n and data[j + 1][0] == data[i][0]:
            j += 1
        for k in range(i, j + 1):
            pl += data[k][1]
            nl += 1 - data[k][1]
        n_left, n_right = pl + nl, n - pl - nl
        if n_right > 0:
            pr, nr = total_p - pl, (n - total_p) - nl
            gl = 1 - (pl * pl + nl * nl) / (n_left * n_left)
            gr = 1 - (pr * pr + nr * nr) / (n_right * n_right)
            wg = (n_left * gl + n_right * gr) / n
            cand = (round(wg, 6), data[i][0])
            if best is None or cand < best:
                best = cand
        i = j + 1
    r = _q("feature_best_split_gini")(spark, SF_ORACLE).collect()[0]
    assert abs(r["weighted_gini"] - best[0]) < 1e-6
    assert r["threshold"] == best[1]
    assert r["n_left"] + r["n_right"] == n


def test_pythagorean_mean_ordering(spark):
    rows = _q("agg_geometric_harmonic_mean")(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        # HM ≤ GM ≤ AM, strict for non-constant data
        assert r["harmonic_mean"] < r["geometric_mean"] < r["arithmetic_mean"]
