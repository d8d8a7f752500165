"""Property tests for extension batch 89: Shapley efficiency/symmetry,
Qini consistency."""

from __future__ import annotations

from itertools import combinations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_shapley_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("attribution_shapley_channels")(spark, SF_ORACLE).collect()
    phi = {r["channel"]: r["shapley_value"] for r in rows}
    assert set(phi) == {"view", "click", "signup", "error"}

    # independent brute-force Shapley from the raw events
    events = load_sf_tables(spark, SF_ORACLE)["events"].select(
        "user_id", "event_type", F.to_date("ts").alias("d")
    ).collect()
    first = {}
    for e in events:
        first[e["user_id"]] = min(first.get(e["user_id"], e["d"]), e["d"])
    chans = ["view", "click", "signup", "error"]
    cells = {}
    conv = {}
    for e in events:
        if e["d"] != first[e["user_id"]]:
            continue
        m = cells.setdefault(e["user_id"], set())
        if e["event_type"] in chans:
            m.add(e["event_type"])
        if e["event_type"] == "purchase":
            conv[e["user_id"]] = 1
    users = set(first)
    nt = len(users)

    def v(S):
        tot = 0
        for uid in users:
            if cells.get(uid, set()) <= S and conv.get(uid):
                tot += 1
        return tot / nt

    import math

    n = 4
    ref = {}
    for ch in chans:
        others = [c for c in chans if c != ch]
        tot = 0.0
        for k in range(len(others) + 1):
            for S in combinations(others, k):
                Sset = set(S)
                w = (
                    math.factorial(len(Sset))
                    * math.factorial(n - 1 - len(Sset))
                    / math.factorial(n)
                )
                tot += w * (v(Sset | {ch}) - v(Sset))
        ref[ch] = tot
    for ch in chans:
        assert abs(phi[ch] - ref[ch]) < 1e-4, (ch, phi[ch], ref[ch])
    # efficiency: total equals v(full) - v(empty)
    total = rows[0]["total_attributed"]
    assert abs(total - (v(set(chans)) - v(set()))) < 1e-4


def test_qini_deciles_consistent(spark):
    rows = sorted(
        _q("ab_qini_uplift_deciles")(spark, SF_ORACLE).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 10
    run = 0.0
    for r in rows:
        assert r["n1"] > 0 and r["n0"] > 0
        run += r["y1"] - r["y0"] * r["n1"] / r["n0"]
        assert abs(r["qini"] - run) < 1e-3, (r["qini"], run)
