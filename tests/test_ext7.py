"""Unit tests for the ext7 scale-pattern operators: triangle counting,
binned interval-overlap join, bloom-prefiltered join, exact distributed
equi-depth histogram (the registered queries are also hash-checked against
DuckDB by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL
from gemini_data_wrangler_spark.operators.graphs import triangle_stats
from gemini_data_wrangler_spark.queries_ext7 import (
    equidepth_histogram,
    join_bloom_prefilter,
    join_interval_overlap,
)


def test_triangle_k4_with_noisy_input(spark):
    """K4 has 4 triangles and 12 wedges (clustering 1.0); duplicate,
    reversed, and self-loop edges must not change the answer."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(1, 1), (0, 1), (2, 3)]
    edges = spark.createDataFrame(noisy, "src bigint, dst bigint")
    row = triangle_stats(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (4, 6, 12, 4)
    assert row.clustering == 1.0


def test_triangle_star_graph_has_none(spark):
    """A 5-leaf star: 10 wedges at the hub, zero triangles — exercises the
    degree-orientation path where the hub gets all in-edges."""
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src bigint, dst bigint")
    row = triangle_stats(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (6, 5, 10, 0)
    assert row.clustering == 0.0


def _ntile_stats(vals: list[float], k: int) -> dict[int, tuple[int, float, float]]:
    vals = sorted(vals)
    n = len(vals)
    q, r = divmod(n, k)
    out, i = {}, 0
    for b in range(1, k + 1):
        size = q + (1 if b <= r else 0)
        chunk = vals[i : i + size]
        i += size
        if chunk:
            out[b] = (len(chunk), min(chunk), max(chunk))
    return out


def test_equidepth_matches_ntile_with_boundary_ties(spark):
    """Heavy ties spanning bucket boundaries + uneven n % k — the
    distributed rank-range mapping must reproduce exact NTILE stats."""
    vals = [1.0] * 7 + [2.0] * 8 + [3.0] * 5 + [4.0] * 3  # n=23
    for k in (4, 5, 10):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {
            r.bucket: (r.cnt, r.lo, r.hi)
            for r in equidepth_histogram(df, "x", k, coarse_width=1.0).collect()
        }
        assert got == _ntile_stats(vals, k), k


def test_equidepth_fewer_rows_than_buckets(spark):
    """n < k: first n buckets get one row each (ANSI-safe division)."""
    df = spark.createDataFrame([(5.0,), (1.0,), (3.0,)], "x double")
    got = {
        r.bucket: (r.cnt, r.lo, r.hi)
        for r in equidepth_histogram(df, "x", 10, coarse_width=100.0).collect()
    }
    assert got == {1: (1, 1.0, 1.0), 2: (1, 3.0, 3.0), 3: (1, 5.0, 5.0)}


def test_interval_overlap_matches_bruteforce(spark):
    """The binned equi-join (with its cross-bucket dedup) must equal the
    naive inequality join on the same data."""
    iv = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select(
            F.col("o_custkey").alias("c"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").alias("s"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("e"),
        )
    )
    a = iv.select("c", F.col("k").alias("ka"), F.col("s").alias("sa"), F.col("e").alias("ea"))
    b = iv.select("c", F.col("k").alias("kb"), F.col("s").alias("sb"), F.col("e").alias("eb"))
    brute = {
        (r.c, r.ka, r.kb)
        for r in a.join(b, "c")
        .filter((F.col("ka") < F.col("kb")) & (F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
        .collect()
    }
    got = {
        (r.o_custkey, r.okey_a, r.okey_b)
        for r in join_interval_overlap(spark, SF_SMALL).collect()
    }
    assert got == brute and len(got) > 0


def test_bloom_prefilter_equals_plain_join(spark):
    """Bloom false positives must be fully removed by the trailing exact
    join: result identical to the un-prefiltered join."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_SMALL}/part.parquet").filter(F.col("p_size") >= 48)
    plain = {
        (r.p_brand, r.n_items)
        for r in li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .collect()
    }
    got = {
        (r.p_brand, r.n_items) for r in join_bloom_prefilter(spark, SF_SMALL).collect()
    }
    assert got == plain and len(got) > 0


def test_skyline_matches_bruteforce_dominance(spark):
    """Two-level prefix-min skyline must equal the quadratic NOT-EXISTS
    dominance definition (including ties on either dimension)."""
    from gemini_data_wrangler_spark.queries_ext8 import skyline_price_date

    pts = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select(F.col("o_totalprice").alias("p"), F.col("o_orderdate").alias("d"))
        .distinct()
    )
    a, b = pts.alias("a"), pts.alias("b")
    dominated = a.join(
        b,
        (F.col("b.p") >= F.col("a.p"))
        & (F.col("b.d") <= F.col("a.d"))
        & ((F.col("b.p") > F.col("a.p")) | (F.col("b.d") < F.col("a.d"))),
        "left_semi",
    )
    brute = {(r.p, r.d) for r in pts.exceptAll(dominated).collect()}
    got = {
        (r.o_totalprice, r.o_orderdate)
        for r in skyline_price_date(spark, SF_SMALL).collect()
    }
    assert got == brute and len(got) > 0


def test_weighted_sample_overrepresents_heavy_rows(spark):
    """A-ES with weight = o_totalprice: the sampled mean totalprice must
    exceed the population mean (size-biased sampling), and the sample is
    exactly k distinct orders."""
    from gemini_data_wrangler_spark.queries_ext8 import _WRS_K, sample_weighted_reservoir

    s = sample_weighted_reservoir(spark, SF_SMALL).collect()
    assert len(s) == len({r.o_orderkey for r in s}) == _WRS_K
    pop_mean = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    samp_mean = sum(r.o_totalprice for r in s) / len(s)
    assert samp_mean > pop_mean * 1.1
