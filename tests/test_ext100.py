"""Property tests for extension batch 100: RBO vs a pure-Python
reference."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_rbo_matches_python(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.queries import registry
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    row = registry()["rec_rank_biased_overlap"][0](spark, SF_ORACLE).collect()[0]
    assert 0 <= row["rbo_min"] <= 1
    assert 0 <= row["overlap_at_k"] <= 1

    t = load_sf_tables(spark, SF_ORACLE)
    rev = (
        t["lineitem"]
        .join(t["part"].select("p_partkey", "p_brand"),
              t["lineitem"]["l_partkey"] == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.when(F.to_date("l_shipdate") < "1996-01-01", 0).otherwise(1).alias("period"),
        )
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cents"))
        .collect()
    )
    lists = {0: [], 1: []}
    for r in rev:
        lists[r["period"]].append((-r["cents"], r["p_brand"]))
    rank_a = [b for _, b in sorted(lists[0])]
    rank_b = [b for _, b in sorted(lists[1])]
    p, k = 0.9, 20
    rbo = 0.0
    for d in range(1, k + 1):
        agree = len(set(rank_a[:d]) & set(rank_b[:d]))
        rbo += p ** (d - 1) * agree / d
    rbo *= 1 - p
    assert abs(row["rbo_min"] - rbo) < 1e-5, (row["rbo_min"], rbo)
    assert abs(
        row["overlap_at_k"] - len(set(rank_a[:k]) & set(rank_b[:k])) / k
    ) < 1e-6
