"""Property tests for extension batch 93: absorption probabilities vs a
pure-Python chain simulation, newsvendor coverage property."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_absorption_monotone_and_bounded(spark):
    rows = _q("events_absorption_prob")(spark, SF_ORACLE).collect()
    assert {r["start_state"] for r in rows} == {"view", "click", "signup", "error"}
    for r in rows:
        assert 0.0 <= r["p_absorbed_k"] <= 1.0

    # independent check: rebuild the chain in Python and propagate
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    events = load_sf_tables(spark, SF_ORACLE)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).collect()
    states = ["view", "click", "signup", "error", "purchase"]
    idx = {s: i for i, s in enumerate(states)}
    C = defaultdict(int)
    for r in seq:
        if r["nxt"] is not None and r["cur"] != "purchase":
            C[(r["cur"], r["nxt"])] += 1
    P = [[0.0] * 5 for _ in range(5)]
    P[4][4] = 1.0
    for i, s in enumerate(states[:4]):
        tot = sum(C[(s, t)] for t in states)
        for j, t in enumerate(states):
            P[i][j] = C[(s, t)] / tot if tot else 0.0
    D = [[1.0 if i == j else 0.0 for j in range(5)] for i in range(5)]
    for _ in range(8):
        D = [[sum(D[s][m] * P[m][j] for m in range(5)) for j in range(5)] for s in range(5)]
    got = {r["start_state"]: r["p_absorbed_k"] for r in rows}
    for i, s in enumerate(states[:4]):
        assert abs(got[s] - D[i][4]) < 1e-5, (s, got[s], D[i][4])


def test_newsvendor_quantile_covers_ratio(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("inventory_newsvendor_quantile")(spark, SF_ORACLE).collect()
    assert rows
    t = load_sf_tables(spark, SF_ORACLE)
    demand = (
        t["lineitem"]
        .join(t["part"].select("p_partkey", "p_brand"),
              t["lineitem"]["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", F.to_date("l_shipdate").alias("day"))
        .agg(F.sum("l_quantity").alias("d"))
        .collect()
    )
    by_brand = defaultdict(list)
    for r in demand:
        by_brand[r["p_brand"]].append(float(r["d"]))
    for r in rows:
        ds = sorted(by_brand[r["p_brand"]])
        n = len(ds)
        assert r["n_days"] == n
        # q* must cover at least ~75% of observed days (interpolated
        # quantile property)
        covered = sum(1 for d in ds if d <= r["q_star"] + 1e-9) / n
        assert covered >= 0.70, (r, covered)
        assert r["q_star"] >= ds[0] and r["q_star"] <= ds[-1]
