"""Property tests for extension batch 48: t-closeness, business-day
latency, PSI drift."""

from __future__ import annotations

import datetime

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_t_closeness_bounds(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("privacy_t_closeness")(spark, SF_ORACLE).collect()
    cust = load_sf_tables(spark, SF_ORACLE)["customer"]
    assert len(rows) == cust.select("c_nationkey").distinct().count()
    assert sum(r["group_size"] for r in rows) == cust.count()
    for r in rows:
        assert 0.0 <= r["emd"] <= 1.0
        assert r["t_close"] == (r["emd"] <= 0.15)
    # the whole population as one group would have EMD exactly 0; real
    # groups must carry some distance but not the maximum
    assert 0 < max(r["emd"] for r in rows) < 0.5


def test_businessday_latency_against_calendar_walk(spark):
    """Closed-form business-day count must equal a literal day-by-day
    weekday walk for a sample of orders."""
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    t = load_sf_tables(spark, SF_ORACLE)
    first_ship = (
        t["lineitem"].groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship"))
    )
    sample = (
        t["orders"]
        .join(first_ship, t["orders"]["o_orderkey"] == first_ship["l_orderkey"])
        .select("o_orderdate", "ship")
        .limit(200)
        .collect()
    )

    def walk(d1: datetime.date, d2: datetime.date) -> int:
        # signed: negative when ship precedes order (a DQ signal the
        # histogram deliberately surfaces instead of clamping away)
        sign = 1
        if d2 < d1:
            d1, d2, sign = d2, d1, -1
        # [d1, d2) convention: count d1 itself if it is a weekday,
        # exclude d2 — matches the prefix-count difference f(d2) - f(d1)
        n, d = 0, d1
        while d < d2:
            if d.weekday() < 5:
                n += 1
            d += datetime.timedelta(days=1)
        return sign * n

    expected = {}
    for r in sample:
        d1, d2 = r["o_orderdate"].date(), r["ship"].date()
        expected.setdefault(walk(d1, d2), 0)
    hist = {
        r["business_days"]: r["n_orders"]
        for r in _q("ops_businessday_latency")(spark, SF_ORACLE).collect()
    }
    # every sampled walk result must be a key of the histogram, and the
    # histogram must cover all orders
    for k in expected:
        assert k in hist
    from_first = sum(hist.values())
    assert from_first == first_ship.count()


def test_businessday_closed_form_pointwise(spark):
    """The closed-form f(d) difference equals the calendar walk for 50
    random-ish (order, ship) pairs."""
    import datetime as dt

    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    t = load_sf_tables(spark, SF_ORACLE)
    first_ship = (
        t["lineitem"].groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship"))
    )
    rows = (
        t["orders"]
        .join(first_ship, t["orders"]["o_orderkey"] == first_ship["l_orderkey"])
        .filter(F.col("o_orderkey") % 97 == 0)
        .select("o_orderdate", "ship")
        .limit(50)
        .collect()
    )
    epoch = dt.date(1994, 12, 26)

    def f(d: dt.date) -> int:
        days = (d - epoch).days
        return 5 * (days // 7) + min(days % 7, 5)

    def walk(d1, d2):
        sign = 1
        if d2 < d1:
            d1, d2, sign = d2, d1, -1
        n, d = 0, d1
        while d < d2:
            if d.weekday() < 5:
                n += 1
            d += dt.timedelta(days=1)
        return sign * n

    for r in rows:
        d1, d2 = r["o_orderdate"].date(), r["ship"].date()
        # |f(d2) - f(d1)| can differ from the weekend-exact walk by at
        # most 0 — the counter is exact in both directions because f is
        # a prefix count of business days from a fixed Monday.
        assert f(d2) - f(d1) == walk(d1, d2), (d1, d2)


def test_psi_properties(spark):
    r = _q("dq_psi_price_drift")(spark, SF_ORACLE).collect()[0]
    assert r["psi"] >= 0.0  # PSI is a symmetrized KL: nonnegative
    assert r["n_bins"] <= 10
    assert r["stable"] == (r["psi"] < 0.1)
