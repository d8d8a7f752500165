"""Property tests for extension batch 46: Neyman sampling, LLR
collocations, ACF, Cramér's V."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_neyman_allocation_sums_to_budget(spark):
    rows = _q("sample_neyman_allocation")(spark, SF_ORACLE).collect()
    assert rows
    total_alloc = sum(r["allocated"] for r in rows)
    assert abs(total_alloc - 2000) < 1.0  # allocations sum to the budget
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["nh"]
        # achieved size within 5 sigma of the binomial expectation
        rate = r["allocated"] / r["nh"]
        sd = math.sqrt(max(r["nh"] * rate * (1 - rate), 1.0))
        assert abs(r["n_sampled"] - r["allocated"]) <= 5 * sd


def test_llr_nonnegative_and_ordered(spark):
    rows = _q("text_collocation_llr")(spark, SF_ORACLE).collect()
    assert len(rows) == 15
    llrs = [r["llr"] for r in rows]
    assert llrs == sorted(llrs, reverse=True)
    assert all(v >= 0 for v in llrs)  # G² is nonnegative
    assert all(r["n_cooc"] >= 1 for r in rows)


def test_llr_against_scipy_style_formula(spark):
    """Spot-check the top collocation's G² with an independent Python
    computation from raw bigram counts."""
    from collections import Counter

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"].collect()
    bigrams = Counter()
    for r in docs:
        ws = r["text"].strip().lower().split()
        bigrams.update(zip(ws, ws[1:]))
    n = sum(bigrams.values())
    c1, c2 = Counter(), Counter()
    for (a, b), k in bigrams.items():
        c1[a] += k
        c2[b] += k
    top = _q("text_collocation_llr")(spark, SF_ORACLE).collect()[0]
    k11 = bigrams[(top["w1"], top["w2"])]
    ca, cb = c1[top["w1"]], c2[top["w2"]]
    cells = [
        (k11, ca * cb / n),
        (ca - k11, ca * (n - cb) / n),
        (cb - k11, (n - ca) * cb / n),
        (n - ca - cb + k11, (n - ca) * (n - cb) / n),
    ]
    g2 = 2 * sum(o * math.log(o / e) for o, e in cells if o > 0)
    assert abs(top["llr"] - round(g2, 4)) < 0.01
    assert top["n_cooc"] == k11


def test_acf_bounds_and_lag_count(spark):
    rows = _q("timeseries_acf")(spark, SF_ORACLE).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0


def test_cramers_v_consistent_with_chi2(spark):
    r = _q("dq_cramers_v")(spark, SF_ORACLE).collect()[0]
    assert r["chi2"] >= 0
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["dof"] >= 1
    # Independent columns in the generator: association should be weak.
    assert r["cramers_v"] < 0.2
