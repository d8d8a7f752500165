"""Property tests for extension batch 24 (beyond oracle parity):
layout-plan invariants, sketch-algebra identities, retrieval-score bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_zorder_files_partition_all_rows(spark):
    rows = _q("layout_zorder_plan")(spark, SF_ORACLE).collect()
    assert len(rows) == 64
    # ntile: file sizes differ by at most 1, zones are valid intervals.
    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert r["ck_min"] <= r["ck_max"] and r["dy_min"] <= r["dy_max"]


def test_zorder_prunes_better_than_single_column_sort(spark):
    """The point of Z-order: a predicate on the SECOND dimension still
    prunes most files. Under a single-column (custkey) sort, a day-range
    predicate touches every file; under Z-order, day zones stay narrow
    enough that at least half the files are prunable for a 30-day window."""
    rows = _q("layout_zorder_plan")(spark, SF_ORACLE).collect()
    lo, hi = 400, 430
    scanned = [r for r in rows if not (r["dy_max"] < lo or r["dy_min"] > hi)]
    assert len(scanned) <= len(rows) // 2, (
        f"{len(scanned)}/{len(rows)} files overlap a 30-day window — "
        "Z-interleave is not clustering the day dimension"
    )


def test_zonemap_scan_decision_is_sound(spark):
    """No false pruning: every zone containing a row inside the predicate
    range must be marked scanned (the inverse — scanning a zone with no
    matching rows — is allowed; min/max stats are conservative)."""
    zones = {r["zone"]: r for r in _q("layout_zonemap_prune")(spark, SF_ORACLE).collect()}
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    hits = (
        orders.filter(F.col("o_totalprice").between(100000.0, 150000.0))
        .groupBy(F.date_trunc("month", F.to_date("o_orderdate")).cast("date").alias("zone"))
        .count()
        .collect()
    )
    assert hits
    for h in hits:
        assert zones[h["zone"]]["scanned"], h["zone"]


def test_compaction_plan_is_contiguous_and_full(spark):
    rows = _q("layout_compaction_plan")(spark, SF_ORACLE).collect()
    by_part: dict[str, list] = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r)
    for part, files in by_part.items():
        files.sort(key=lambda r: r["file_idx"])
        # Contiguous file indices from 0; all files except the last full.
        assert [f["file_idx"] for f in files] == list(range(len(files)))
        for f in files[:-1]:
            assert f["n_rows"] == 500
        # Key ranges must not overlap between consecutive files.
        for a, b in zip(files, files[1:]):
            assert a["key_max"] < b["key_min"]


def test_hll_intersection_identity_and_bound(spark):
    r = _q("sketch_hll_intersection_check")(spark, SF_ORACLE).collect()[0]
    assert r["exact_a"] + r["exact_b"] - r["exact_union"] == r["exact_intersection"]
    assert r["exact_intersection"] > 0
    assert r["bound_ok"]


def test_bm25_scores_positive_and_ranked(spark):
    rows = _q("text_bm25_rank")(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, 21)
    )
    scores = [r["bm25"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_containment_bounded_and_asymmetric(spark):
    rows = _q("text_containment_pairs")(spark, SF_ORACLE).collect()
    assert rows
    seen = {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}
    for (a, b), c in seen.items():
        assert 0.6 <= c <= 1.0
    # Asymmetry is the point: the two directions divide by different
    # denominators, so A→B and B→A must disagree somewhere (on this corpus
    # both directions clear 0.6, but never with equal values), else this
    # is just Jaccard again.
    asym = [
        k
        for k, c in seen.items()
        if (k[1], k[0]) in seen and abs(c - seen[(k[1], k[0])]) > 1e-9
    ]
    assert asym


def test_two_level_rank_equals_global_window(spark):
    """The distributed two-level rank must equal a naive global
    row_number for every row, and the derived ntile must equal SQL
    ntile — on an adversarial size (not divisible by k, duplicate keys)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.operators.window import (
        ntile_from_rank,
        two_level_rank,
    )
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    orders = load_sf_tables(spark, SF_ORACLE)["orders"].select(
        "o_orderkey", (F.col("o_custkey") % 97).alias("k")
    )
    got = {
        r["o_orderkey"]: (r["_grank"], r["nt"])
        for r in two_level_rank(
            orders, key=F.col("k"), tiebreaks=[F.col("o_orderkey")],
            block=F.expr("k div 8"),
        )
        .crossJoin(F.broadcast(orders.agg(F.count(F.lit(1)).alias("_n"))))
        .withColumn("nt", ntile_from_rank(F.col("_grank"), F.col("_n"), 7))
        .collect()
    }
    w = Window.orderBy("k", "o_orderkey")
    naive = {
        r["o_orderkey"]: (r["rn"], r["nt"])
        for r in orders.withColumn("rn", F.row_number().over(w))
        .withColumn("nt", F.ntile(7).over(w))
        .collect()
    }
    assert got == naive
