"""Property tests for extension batch 65: Poisson bootstrap CI,
Kendall tau-b, calibration error."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_bootstrap_ci_brackets_sample_mean(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    import pyspark.sql.functions as F

    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    sample_mean = orders.agg(F.avg("o_totalprice")).collect()[0][0]
    r = _q("stats_bootstrap_ci_mean")(spark, SF_ORACLE).collect()[0]
    assert r["n_replicates"] == 100
    assert r["ci_lo"] < r["boot_mean"] < r["ci_hi"]
    # the CI must bracket the point estimate and be sane-width
    assert r["ci_lo"] < sample_mean < r["ci_hi"]
    width = r["ci_hi"] - r["ci_lo"]
    n = orders.count()
    sd = orders.agg(F.stddev("o_totalprice")).collect()[0][0]
    se = sd / n**0.5
    # normal-theory width is ~3.92·se; bootstrap should land within 2x
    assert 0.5 * 3.92 * se < width < 2.0 * 3.92 * se


def test_poisson_weight_distribution(spark):
    """Hash-derived weights must follow Poisson(1) frequencies."""
    import math

    from gemini_data_wrangler_spark.queries_ext65 import _POIS_CUM

    # ladder itself must encode the CDF
    acc = 0.0
    for k, t in enumerate(_POIS_CUM):
        acc += math.exp(-1.0) / math.factorial(k)
        assert t == f"{int(acc * 16**8):08x}"
    # empirical check over a fixed id range
    import hashlib

    counts = {}
    n = 20000
    for i in range(n):
        h = hashlib.md5(f"{i}:1".encode()).hexdigest()[:8]
        k = next((k for k, t in enumerate(_POIS_CUM) if h < t), 7)
        counts[k] = counts.get(k, 0) + 1
    for k in (0, 1, 2):
        expect = math.exp(-1.0) / math.factorial(k)
        assert abs(counts[k] / n - expect) < 0.02


def test_kendall_tau_matches_python(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"].collect()
    from collections import Counter

    grid = Counter(
        (int(r["o_totalprice"] // 10000), int(r["o_orderpriority"][0]))
        for r in orders
    )
    cells = list(grid.items())
    conc = disc = 0
    for i, ((x1, y1), c1) in enumerate(cells):
        for (x2, y2), c2 in cells[i + 1 :]:
            if (x2 > x1 and y2 > y1) or (x2 < x1 and y2 < y1):
                conc += c1 * c2
            elif (x2 > x1 and y2 < y1) or (x2 < x1 and y2 > y1):
                disc += c1 * c2
    n = sum(grid.values())
    n0 = n * (n - 1) / 2
    tx_marg = Counter()
    ty_marg = Counter()
    for (x, y), c in grid.items():
        tx_marg[x] += c
        ty_marg[y] += c
    tx = sum(c * (c - 1) / 2 for c in tx_marg.values())
    ty = sum(c * (c - 1) / 2 for c in ty_marg.values())
    tau = (conc - disc) / ((n0 - tx) * (n0 - ty)) ** 0.5
    got = _q("stats_kendall_tau")(spark, SF_ORACLE).collect()[0]
    assert got["concordant"] == conc
    assert got["discordant"] == disc
    assert abs(got["kendall_tau_b"] - tau) < 1e-5
    # value and priority are independent in the synthetic data
    assert abs(got["kendall_tau_b"]) < 0.05


def test_ece_consistent_with_bins(spark):
    bins = _q("quality_calibration_bins")(spark, SF_ORACLE).collect()
    got = _q("quality_ece")(spark, SF_ORACLE).collect()[0]
    assert got["n_bins"] == len(bins)
    n_total = sum(b["n"] for b in bins)
    # recompute from the (rounded) bin table — agreement within rounding slop
    ece = sum(b["n"] * abs(b["pos_rate"] - b["mean_score"]) for b in bins) / n_total
    mce = max(abs(b["pos_rate"] - b["mean_score"]) for b in bins)
    assert abs(got["ece"] - ece) < 1e-4
    assert abs(got["mce"] - mce) < 1e-4
    assert 0 <= got["ece"] <= got["mce"] <= 1
