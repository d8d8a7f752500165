"""Property tests for extension batches 16–20 (beyond oracle parity):
probability-mass invariants, metric bounds, reconstruction checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_markov_rows_normalize(spark):
    rows = _q("events_markov_transitions")(spark, SF_ORACLE).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["prob"]
        assert 0.0 <= r["prob"] <= 1.0
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-4, ft


def test_js_divergence_bounds(spark):
    import math

    rows = _q("corpus_source_divergence")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # JS divergence (natural log) lies in [0, ln 2].
        assert -1e-9 <= r["js_divergence"] <= math.log(2) + 1e-9


def test_rfm_scores_in_range_and_balanced(spark):
    rows = _q("customer_rfm_segments")(spark, SF_ORACLE).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        vals = [r[col] for r in rows]
        assert set(vals) <= {1, 2, 3, 4, 5}
        # ntile quintiles differ by at most 1 in size.
        for q in range(1, 6):
            c = vals.count(q)
            assert abs(c - n / 5) <= 1


def test_attribution_last_touch_dominates(spark):
    rows = _q("attribution_time_decay")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["last_touch_share"] <= 1.0
        assert r["n_touches"] >= 1
        # max weight ≥ mean weight ⇒ share ≥ 1/n.
        assert r["last_touch_share"] * r["n_touches"] >= 0.999


def test_winsorize_clamps_within_bounds(spark):
    rows = _q("dq_winsorize")(spark, SF_ORACLE).collect()
    clamped = [r for r in rows if r["clamped"]]
    for r in rows:
        if not r["clamped"]:
            assert abs(r["winsorized"] - round(r["l_extendedprice"], 6)) < 1e-6
    # p01/p99 clamping touches roughly 2% of rows.
    assert 0 < len(clamped) < 0.1 * len(rows)


def test_interpolation_is_between_neighbors(spark):
    rows = _q("timeseries_interpolate")(spark, SF_ORACLE).orderBy("d").collect()
    observed = [(i, r) for i, r in enumerate(rows) if r["observed"] is not None]
    assert observed
    for i, r in enumerate(rows):
        if r["observed"] is not None:
            assert r["interpolated"] == r["observed"]
        else:
            prevs = [x[1]["observed"] for x in observed if x[0] < i]
            nexts = [x[1]["observed"] for x in observed if x[0] > i]
            lo_candidates = ([prevs[-1]] if prevs else []) + ([nexts[0]] if nexts else [])
            lo, hi = min(lo_candidates), max(lo_candidates)
            assert lo - 1e-6 <= r["interpolated"] <= hi + 1e-6


def test_novelty_consistent_with_duplicated_spans(spark):
    nov = {r["doc_id"]: r for r in _q("text_ngram_novelty")(spark, SF_ORACLE).collect()}
    dup_docs = set()
    spans_df = _q("text_duplicated_spans")(spark, SF_ORACLE)
    assert spans_df.count() > 0
    for r in nov.values():
        assert 0.0 <= r["novelty_ratio"] <= 1.0
        assert r["n_shared"] <= r["n_spans"]


def test_fingerprint_detects_any_change(spark):
    """Mutating one row's status flips the digest sum (order-independent
    but content-sensitive)."""
    from gemini_data_wrangler_spark.queries import registry
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    base = _q("table_fingerprint")(spark, SF_ORACLE).collect()[0]
    orders = load_sf_tables(spark, SF_ORACLE)["orders"]
    mutated = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 1, F.lit("X")).otherwise(F.col("o_orderstatus")),
    )
    mutated.createOrReplaceTempView("_fp_mutated")
    # Recompute the same digest over the mutated frame.
    hexd = "0123456789abcdef"
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            "o_orderstatus",
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
    )
    nib = lambda i, mult: F.expr(  # noqa: E731
        f"(locate(substr(_h, {i}, 1), '{hexd}') - 1) * {mult}"
    )
    d = nib(1, 4096) + nib(2, 256) + nib(3, 16) + nib(4, 1)
    got = (
        mutated.withColumn("_h", h)
        .withColumn("_d", d)
        .agg(F.sum("_d").alias("digest_sum"))
        .collect()[0]
    )
    assert got["digest_sum"] != base["digest_sum"]


def test_behavior_segments_partition_users(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("users_behavior_segments")(spark, SF_ORACLE).collect()
    total = sum(r["n_users"] for r in rows)
    n_users = (
        load_sf_tables(spark, SF_ORACLE)["events"].select("user_id").distinct().count()
    )
    assert total == n_users


def test_scaling_bank_bounds(spark):
    rows = _q("feature_scaling_bank")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        if r["minmax_qty"] is not None:
            assert -1e-9 <= r["minmax_qty"] <= 1 + 1e-9


def test_new_query_plan_shapes(spark):
    """Pin the load-bearing physical shapes of batch 16–19 queries: group
    stats broadcast into map-side scaling/clamping; the cardinality
    forecast's top-5 is a TakeOrderedAndProject, not a global sort."""
    for name, marker in [
        ("feature_scaling_bank", "BroadcastHashJoin"),
        ("dq_winsorize", "BroadcastHashJoin"),
        ("diag_join_cardinality", "TakeOrderedAndProject"),
    ]:
        plan = (
            _q(name)(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
        )
        assert marker in plan, name
