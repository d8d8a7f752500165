"""Property tests for extension batch 78: multi-seed closeness vs a
pure-Python BFS, CUPED invariants vs numpy."""

from __future__ import annotations

import collections
import hashlib

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_closeness_matches_python_bfs(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_ORACLE}/lineitem.parquet'"
    )
    edges = con.execute(
        """
        WITH li AS (SELECT DISTINCT l_orderkey ok, l_suppkey s FROM lineitem),
        co AS (SELECT a.s sa, b.s sb, count(*) c FROM li a JOIN li b
               ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2),
        ranked AS (SELECT sa, sb, row_number() OVER (ORDER BY c DESC, sa, sb) r
                   FROM co)
        SELECT sa, sb FROM ranked WHERE r <= 2000
        """
    ).fetchall()
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = sorted(adj)[:5]
    got = {r["seed"]: r for r in _q("graph_closeness_seeds")(spark, SF_ORACLE).collect()}
    assert set(got) == set(seeds)
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        n_reach = len(dist) - 1
        total = sum(dist.values())
        assert got[s]["n_reachable"] == n_reach
        assert got[s]["total_hops"] == total
        assert abs(got[s]["closeness"] - round(n_reach / total, 6)) < 1e-9


def test_cuped_reduces_variance_and_preserves_means(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = {r["arm"]: r for r in _q("ab_cuped_adjustment")(spark, SF_ORACLE).collect()}
    assert set(rows) == {0, 1}
    ev = load_sf_tables(spark, SF_ORACLE)["events"].collect()
    import datetime

    split = datetime.datetime(2024, 1, 16)
    per_user: dict = {}
    for e in ev:
        u = per_user.setdefault(e["user_id"], [0.0, 0.0])
        u[0 if e["ts"] < split else 1] += e["value"]
    pre = np.array([v[0] for v in per_user.values()])
    post = np.array([v[1] for v in per_user.values()])
    th = np.cov(pre, post, ddof=0)[0, 1] / pre.var()
    adj = post - th * (pre - pre.mean())
    # CUPED must not inflate variance, and the pooled adjusted mean equals
    # the pooled raw mean (the defining unbiasedness identity)
    assert adj.var() <= post.var() + 1e-9
    assert abs(adj.mean() - post.mean()) < 1e-9
    arms = {
        uid: int(hashlib.md5(f"AB{uid}".encode()).hexdigest()[:8], 16) % 2
        for uid in per_user
    }
    for arm in (0, 1):
        uids = [u for u, a in arms.items() if a == arm]
        sel = [i for i, u in enumerate(per_user) if arms[u] == arm]
        assert rows[arm]["n_users"] == len(uids)
        assert abs(rows[arm]["mean_post"] - post[sel].mean()) < 1e-3
        assert abs(rows[arm]["mean_cuped"] - adj[sel].mean()) < 1e-3
    assert abs(rows[0]["theta"] - th) < 1e-3
