"""Property tests for extension batch 91: replay evaluation invariants,
boxplot fences vs numpy."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_offpolicy_replay_invariants(spark):
    rows = _q("rec_offpolicy_replay")(spark, SF_ORACLE).collect()
    assert rows
    overall = {r["overall_value"] for r in rows}
    assert len(overall) == 1
    tot_r = sum(r["reward"] for r in rows)
    tot_n = sum(r["n_matched"] for r in rows)
    assert abs(overall.pop() - tot_r / tot_n) < 1e-5
    for r in rows:
        assert 0 <= r["value_estimate"] <= 1
        assert r["reward"] <= r["n_matched"]
        assert r["policy_arm"] in {
            "1-URGENT",
            "2-HIGH",
            "3-MEDIUM",
            "4-NOT SPECIFIED",
            "5-LOW",
        }


def test_boxplot_fences_match_numpy(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("profile_boxplot_fences")(spark, SF_ORACLE).collect()
    cust = load_sf_tables(spark, SF_ORACLE)["customer"].select(
        "c_mktsegment", "c_acctbal"
    ).collect()
    by_seg = {}
    for c in cust:
        by_seg.setdefault(c["c_mktsegment"], []).append(c["c_acctbal"])
    for r in rows:
        xs = np.array(by_seg[r["c_mktsegment"]])
        q1, med, q3 = np.percentile(xs, [25, 50, 75])
        assert abs(r["q1"] - q1) < 1e-3, (r, q1)
        assert abs(r["median"] - med) < 1e-3
        assert abs(r["q3"] - q3) < 1e-3
        lo = q1 - 1.5 * (q3 - q1)
        hi = q3 + 1.5 * (q3 - q1)
        assert r["n_outliers"] == int(((xs < lo) | (xs > hi)).sum())
