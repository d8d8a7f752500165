"""Property tests for extension batch 37: estimator calibration really
binds, SRM split math."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_minhash_calibration_holds_everywhere(spark):
    rows = _q("sketch_minhash_estimate_check")(spark, SF_ORACLE).collect()
    assert rows
    assert all(r["bound_ok"] for r in rows)
    assert all(0.5 <= r["exact_jaccard"] <= 1.0 for r in rows)


def test_srm_split_matches_md5_and_is_balanced(spark):
    r = _q("dq_srm_check")(spark, SF_ORACLE).collect()[0]
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    users = [
        x["user_id"]
        for x in load_sf_tables(spark, SF_ORACLE)["events"]
        .select("user_id")
        .distinct()
        .collect()
    ]
    n_a = sum(
        1
        for u in users
        if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 0
    )
    assert (r["n_a"], r["n_b"]) == (n_a, len(users) - n_a)
    # An honest hash split must not trip SRM on organic ids.
    assert not r["srm_detected"]
    half = (r["n_a"] + r["n_b"]) / 2
    chi2 = (r["n_a"] - half) ** 2 / half + (r["n_b"] - half) ** 2 / half
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-9
