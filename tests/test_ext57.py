"""Property tests for extension batch 57: sorted-neighborhood, rank
join, Gini mean difference."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_sorted_neighborhood_vs_attribute_blocking(spark):
    sn = _q("er_sorted_neighborhood")(spark, SF_ORACLE).collect()[0]
    assert sn["n_true_found"] <= sn["n_true"]
    assert 0.0 <= sn["pairs_completeness"] <= 1.0
    # n*w candidate bound
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    n = (
        load_sf_tables(spark, SF_ORACLE)["customer"]
        .filter("c_custkey <= 4000")
        .count()
    )
    assert sn["n_candidates"] <= n * 4
    # far fewer candidates than nation blocking
    eb = _q("er_blocking_quality")(spark, SF_ORACLE).collect()[0]
    assert sn["n_candidates"] < eb["n_cand"]


def test_rank_join_certificate_and_exactness(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("join_rank_topk_certified")(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    assert all(r["certified"] for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # exactness: the certified top-1 must equal the true global top-1.
    # Over a CROSS join every (order, customer) pair exists, so
    # max(o_totalprice + 100·c_acctbal) = max(o_totalprice) +
    # 100·max(c_acctbal), and round(·, 6) is monotone — identical value
    # without materializing the 22.5M-row cross join (38 s of the pytest
    # window; round-8 ask #7).
    t = load_sf_tables(spark, SF_ORACLE)
    mx_o = t["orders"].agg(F.max("o_totalprice")).collect()[0][0]
    mx_c = t["customer"].agg(F.max("c_acctbal")).collect()[0][0]
    true_top = (
        t["orders"]
        .sparkSession.range(1)
        .select(F.round(F.lit(mx_o) + 100 * F.lit(mx_c), 6).alias("s"))
        .collect()[0]["s"]
    )
    assert scores[0] == true_top


def test_gini_mean_difference_equals_bruteforce(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    got = {
        r["grp"]: r for r in _q("agg_gini_mean_difference")(spark, SF_ORACLE).collect()
    }
    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    # brute force one group
    grp = sorted(got)[0]
    xs = [
        r["o_totalprice"]
        for r in orders.filter(F.col("o_orderpriority") == grp).collect()
    ]
    n = len(xs)
    brute = sum(abs(a - b) for i, a in enumerate(xs) for b in xs[i + 1 :]) * 2 / (
        n * (n - 1)
    )
    assert got[grp]["n"] == n
    assert abs(got[grp]["gini_mean_diff"] - brute) / brute < 1e-6
