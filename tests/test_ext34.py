"""Property tests for extension batch 34: decomposition reconstruction
identity, entropy-rate bounds vs a direct computation."""

from __future__ import annotations

import collections
import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_decomposition_reconstructs_observed(spark):
    rows = _q("timeseries_decompose_classical")(spark, SF_ORACLE).collect()
    # 30 days minus 3-day edges on each side.
    assert len(rows) == 24
    for r in rows:
        # Additive identity holds by construction (to rounding).
        assert abs(
            r["observed"] - (r["trend"] + r["seasonal"] + r["residual"])
        ) < 5e-6
    # The trend explains most variance: residual spread < observed spread.
    import statistics

    assert statistics.pstdev([r["residual"] for r in rows]) < statistics.pstdev(
        [r["observed"] for r in rows]
    )


def test_entropy_rate_matches_direct_python(spark):
    r = _q("events_entropy_rate")(spark, SF_ORACLE).collect()[0]
    assert 0.0 < r["entropy_rate_nats"] <= r["max_entropy_nats"] + 1e-9
    assert 0.0 < r["normalized"] <= 1.0 + 1e-9
    # Direct recomputation from collected events.
    from pyspark.sql import functions as F
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    events = (
        load_sf_tables(spark, SF_ORACLE)["events"]
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict = collections.defaultdict(list)
    for e in events:
        by_user[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"]))
    trans: collections.Counter = collections.Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, s), (_, _, t) in zip(seq, seq[1:]):
            trans[(s, t)] += 1
    n_s: collections.Counter = collections.Counter()
    for (s, _), n in trans.items():
        n_s[s] += n
    total = sum(n_s.values())
    rate = 0.0
    for s, ns in n_s.items():
        h = -sum(
            (n / ns) * math.log(n / ns)
            for (s2, _), n in trans.items()
            if s2 == s
        )
        rate += (ns / total) * h
    assert abs(r["entropy_rate_nats"] - round(rate, 6)) < 1e-5
