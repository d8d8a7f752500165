"""Property tests for extension batch 84: Cox PH vs a subject-level
Python reference, propensity stratification invariants."""

from __future__ import annotations

import math
from collections import defaultdict

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_cox_matches_subject_level_newton(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = _q("customer_cox_hazard")(spark, SF_ORACLE).collect()[0]

    t = load_sf_tables(spark, SF_ORACLE)
    ship = t["lineitem"].groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("ship")
    )
    subj = (
        t["orders"]
        .join(ship, t["orders"]["o_orderkey"] == ship["l_orderkey"])
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            t["orders"]["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            F.datediff("ship", F.to_date("o_orderdate")).alias("t"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("x"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
        )
        .collect()
    )
    # Build the event-time grid independently, subject-by-subject.
    d = defaultdict(lambda: [0, 0])  # t -> [d0, d1]
    n_at = defaultdict(lambda: [0, 0])  # t -> [n0, n1]
    for r in subj:
        n_at[r["t"]][r["x"]] += 1
        if r["ev"]:
            d[r["t"]][r["x"]] += 1
    times = sorted(n_at)
    r0 = r1 = 0
    risk = {}
    for tt in reversed(times):
        r0 += n_at[tt][0]
        r1 += n_at[tt][1]
        risk[tt] = (r0, r1)
    b = 0.0
    for _ in range(8):
        U = I = 0.0
        for tt in times:
            dd = d[tt][0] + d[tt][1]
            if dd == 0:
                continue
            rr0, rr1 = risk[tt]
            num = rr1 * math.exp(b)
            den = rr0 + num
            U += d[tt][1] - dd * num / den
            I += dd * rr0 * num / (den * den)
        b += U / I
    assert abs(row["beta"] - b) < 1e-4, (row["beta"], b)
    assert abs(row["hazard_ratio"] - math.exp(b)) < 1e-3


def test_propensity_strata_consistent(spark):
    rows = _q("ab_propensity_stratified_effect")(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    ates = {r["ate_stratified"] for r in rows}
    assert len(ates) == 1
    total = sum(r["n"] for r in rows)
    weighted = sum(r["stratum_effect"] * r["n"] for r in rows) / total
    assert abs(weighted - ates.pop()) < 1e-4
    for r in rows:
        assert r["n1"] > 0 and r["n0"] > 0
        assert -1.0 <= r["stratum_effect"] <= 1.0
