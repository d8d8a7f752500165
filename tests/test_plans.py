"""Physical-plan assertions — the scale contract.

These tests pin the *plan shapes* that make the engine viable at 100 TB:
filters and projections must reach the parquet scan, small dims must
broadcast, top-k must never be a global sort. A refactor that silently
regresses one of these still passes value-correctness tests, so the plans
themselves are asserted here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gemini_data_wrangler_spark.queries import registry
from tests.conftest import SF_ORACLE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    b, _ = registry()["tpch_q6_forecast_revenue"]
    df = b(spark, SF_ORACLE)
    plan = _plan(df)
    # The shipdate/discount/quantity predicates must appear as pushed
    # filters on the scan node, not only as a post-scan Filter.
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_projection_prunes_scan_columns(spark):
    b, _ = registry()["select_projection"]
    df = b(spark, SF_ORACLE)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_partkey" in read_schema and "p_name" in read_schema
    # part has 6 columns; the scan must read only the 3 projected ones.
    assert "p_brand" not in read_schema and "p_type" not in read_schema


def test_dim_join_broadcasts(spark):
    b, _ = registry()["join_inner_diff_keys"]
    df = b(spark, SF_ORACLE)
    assert "BroadcastHashJoin" in _plan(df)


def test_topk_is_take_ordered_not_global_sort(spark):
    b, _ = registry()["topk_expensive_orders"]
    df = b(spark, SF_ORACLE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_flagship_aggregates_partially_before_shuffle(spark):
    b, _ = registry()["flagship_segment_sales"]
    df = b(spark, SF_ORACLE)
    plan = _plan(df)
    # Two HashAggregate nodes (partial + final) around the exchange =
    # map-side combine; a single aggregate would shuffle raw rows.
    assert plan.count("HashAggregate") >= 2


def test_stage_chain_fuses_into_one_plan(spark):
    """FILTER→GROUP→SORT stage chains must NOT materialize between stages:
    the optimized plan keeps the filter adjacent to the scan (fused), with
    no intermediate exchange-per-stage."""
    b, _ = registry()["tpch_q1_pricing_summary"]
    df = b(spark, SF_ORACLE)
    opt = _optimized(df)
    # One relation scan; the filter fused into the same tree.
    assert opt.count("Relation") == 1
    assert "Filter" in opt or "PushedFilters" in _plan(df)


def test_whole_stage_codegen_covers_core_query(spark):
    b, _ = registry()["group_all_agg_functions"]
    df = b(spark, SF_ORACLE)
    # Codegen spans only appear in the FINAL adaptive plan — run it first.
    # They print as `*(n)` operator prefixes (simpleString form).
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan  # at least one whole-stage-codegen span
    # both aggregate halves are inside codegen spans
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_custom_sql_broadcast_of_small_dims(spark):
    # nation (25 rows) joined in CUSTOM SQL must auto-broadcast via AQE or
    # static planning — never a shuffle-both-sides sort-merge join.
    b, _ = registry()["tpch_q10_returned_items"]
    df = b(spark, SF_ORACLE)
    assert "BroadcastHashJoin" in _plan(df)


# ---------------------------------------------------------------------------
# Chart-config pass-through (plans/chart.py)
# ---------------------------------------------------------------------------
def test_chart_config_normalize_and_validate(spark):
    from gemini_data_wrangler_spark.plans.chart import (
        chart_payload,
        normalize_chart_config,
        validate_chart_config,
    )

    df = spark.createDataFrame([(1, "a", 2.0)], "id int, name string, score double")

    cfg = normalize_chart_config({"chartType": "bar", "xAxis": "name", "yAxis": "score"})
    assert cfg.type == "bar"
    assert validate_chart_config(cfg, df) == []

    # Unknown type degrades to none (best-effort, never fails the query).
    assert normalize_chart_config({"chartType": "piechart"}).type == "none"
    assert normalize_chart_config({}).type == "none"

    # Missing column yields the reference's error string.
    bad = normalize_chart_config({"type": "line", "xAxis": "nope", "yAxis": "score"})
    errs = validate_chart_config(bad, df)
    assert errs == ['Column "nope" not found in data']

    # Case-insensitive resolution, like spark.sql.caseSensitive=false.
    ci = normalize_chart_config({"type": "scatter", "xAxis": "NAME", "yAxis": "SCORE"})
    assert validate_chart_config(ci, df) == []

    # 3-D z-axis validated only for 3-D chart types.
    three = normalize_chart_config(
        {"type": "3d-scatter", "xAxis": "id", "yAxis": "score", "zAxis": "missing"}
    )
    assert validate_chart_config(three, df) != []

    payload = chart_payload(cfg, df)
    assert payload["errors"] == []
    assert payload["rows"] == [{"name": "a", "score": 2.0}]


def test_corpus_topk_bigrams_is_take_ordered(spark):
    b, _ = registry()["text_top_bigrams"]
    df = b(spark, SF_ORACLE)
    assert "TakeOrderedAndProject" in _plan(df)


def test_hash_sample_is_shuffle_free(spark):
    # Deterministic hash sampling is a pure filter + projection: the plan
    # must contain NO exchange at all.
    b, _ = registry()["sample_deterministic_hash"]
    df = b(spark, SF_ORACLE)
    assert "Exchange" not in _plan(df)


def test_pii_scrub_is_shuffle_free(spark):
    b, _ = registry()["text_pii_scrub"]
    df = b(spark, SF_ORACLE)
    assert "Exchange" not in _plan(df)


def test_cosine_topk_broadcasts_queries(spark):
    # The query side must broadcast: candidate scan stays shuffle-free until
    # the ranking window. Pinned on the kernel directly — the registry query
    # publishes the session-shared ranked list since round 7, so its returned
    # plan is the localCheckpoint scan, not the build.
    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries_ext import _ANN_QUERY_IDS
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"]
    df = cosine_topk(emb, queries_from_ids(emb, _ANN_QUERY_IDS), k=10)
    assert "BroadcastNestedLoopJoin" in _plan(df) or "BroadcastExchange" in _plan(df)


def test_decontam_eval_side_broadcasts(spark):
    # The eval n-gram set is tiny (benchmarks are KBs vs a TB corpus); the
    # probe against the train side must be a broadcast hash join, never a
    # shuffle of the full corpus n-gram explosion on the join key.
    b, _ = registry()["decontam_ngram_overlap"]
    df = b(spark, SF_ORACLE)
    assert "BroadcastHashJoin" in _plan(df)


def test_pack_sequences_has_no_global_data_window(spark):
    # The prefix sum must be two-level: per-bucket windows over the data,
    # and a global window ONLY over the one-row-per-bucket totals. A plan
    # whose data-side window has an empty partition spec would serialize
    # 100 TB onto one task.
    b, _ = registry()["pack_sequences"]
    df = b(spark, SF_ORACLE)
    plan = _plan(df)
    # The per-doc cumsum window (over n_tokens) must carry a bucket
    # partition spec; only the bucket-totals window (over bucket_total,
    # one row per bucket) may be unpartitioned.
    data_windows = [
        ln for ln in plan.splitlines() if "Window [sum(n_tokens" in ln
    ]
    assert data_windows, plan
    for ln in data_windows:
        assert "windowspecdefinition(bucket" in ln, ln


def test_ngram_rank_window_needs_no_exchange(spark):
    # With the shingle-frequency table broadcast, the doc-keyed partitioning
    # from the persisted shingle frame survives explode + join, so the
    # prefix-rank window must sit on a local Sort directly over the
    # BroadcastHashJoin — no Exchange between them. This removes the two
    # full-stream shuffles that would dominate at corpus scale.
    b, _ = registry()["dedup_ngram_jaccard"]
    df = b(spark, SF_ORACLE)
    lines = _plan(df).splitlines()
    seen = 0
    for i, ln in enumerate(lines):
        if "Window [row_number" not in ln:
            continue
        if "doc_id" not in ln:
            # The bitmap verify's vocabulary→bit-index window is UNpartitioned
            # by design (bounded ≤ _BITMAP_MAX_VOCAB rows by its gate); only
            # the doc-partitioned prefix-rank window carries the full shingle
            # stream and must stay exchange-free.
            continue
        seen += 1
        for nxt in lines[i + 1 :]:
            if "BroadcastHashJoin" in nxt:
                break
            assert "Exchange" not in nxt, nxt
    assert seen >= 1


def test_vocab_encode_broadcasts_vocabulary(spark):
    # The token stream must never shuffle on the word key: the ranked
    # vocabulary broadcasts back, so the only data exchange is the final
    # doc_id aggregation.
    b, _ = registry()["vocab_encode_docs"]
    df = b(spark, SF_ORACLE)
    assert "BroadcastHashJoin" in _plan(df)


def test_tfidf_broadcasts_df_table(spark):
    """tf-idf: the document-frequency table (vocabulary-sized) must
    broadcast back over the (doc, word) stream — the corpus side must not
    shuffle on words."""
    b, _ = registry()["text_tfidf_top_terms"]
    assert "BroadcastHashJoin" in _plan(b(spark, SF_ORACLE))


def test_unigram_lm_broadcasts_frequency_table(spark):
    b, _ = registry()["text_unigram_logprob"]
    assert "BroadcastHashJoin" in _plan(b(spark, SF_ORACLE))


def test_count_min_candidates_take_ordered(spark):
    """Heavy-hitter candidates must come from a distributed top-k
    (TakeOrderedAndProject), never a global sort or a driver-side
    vocabulary collect; the merged counter table must broadcast back."""
    b, _ = registry()["sketch_count_min_heavy_hitters"]
    plan = _plan(b(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_capped_sample_single_window_pass(spark):
    """Per-source capping is one ranking window over (source) — no join,
    no second scan."""
    b, _ = registry()["sample_capped_per_source"]
    plan = _plan(b(spark, SF_ORACLE))
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "Join" not in plan


def test_band_join_is_hash_join_not_cartesian(spark):
    """The δ-bucket quantization must turn the |a−b|≤δ band predicate
    into an equi-join: no BroadcastNestedLoopJoin/CartesianProduct."""
    b, _ = registry()["join_band_acctbal"]
    plan = _plan(b(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_bm25_filters_terms_before_shuffle(spark):
    """The query-term filter must prune the exploded token stream before
    any aggregation exchange — tf shuffles |query terms| rows, not the
    whole corpus."""
    b, _ = registry()["text_bm25_rank"]
    opt = _optimized(b(spark, SF_ORACLE))
    # The IN-filter on the three query terms sits under the aggregate.
    assert "vector" in opt and "merge" in opt
    assert opt.index("Aggregate") < opt.index("vector")


def test_zorder_interleave_stays_in_jvm(spark):
    """The Morton interleave is expression-only: no Python workers in
    the plan (BatchEvalPython / ArrowEvalPython / FlatMapsInPandas)."""
    b, _ = registry()["layout_zorder_plan"]
    plan = _plan(b(spark, SF_ORACLE))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas", "MapInPandas"):
        assert marker not in plan


def test_peak_concurrency_has_no_global_raw_window(spark):
    """The two-level carry keeps the running sum partitioned by hour:
    the only unpartitioned window runs over the per-hour table (tiny),
    never over the raw ±1 point stream. Assert the hour-partitioned
    window exists and the carry side is broadcast."""
    b, _ = registry()["events_peak_concurrency"]
    plan = _plan(b(spark, SF_ORACLE))
    # The raw-point window must be hash-partitioned on h.
    assert "hashpartitioning(h" in plan.replace(" ", "").lower()
    assert "BroadcastExchange" in plan


def test_stickiness_dedups_before_range_join(spark):
    """DAU/WAU/MAU must aggregate the deduped (user, day) table — the
    raw events relation is scanned, deduped, and only then range-joined;
    no nested-loop join over raw events."""
    b, _ = registry()["events_stickiness_ratios"]
    plan = _plan(b(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan


def test_rrf_both_branches_broadcast_queries(spark):
    # RRF's two candidate scans (lexical shingle Jaccard + cosine) must
    # each broadcast the query rows — the corpus side streams without a
    # join shuffle; only the bounded per-query rankings and the
    # |queries| x 2k fusion join may exchange.
    b, _ = registry()["rec_reciprocal_rank_fusion"]
    plan = _plan(b(spark, SF_ORACLE))
    assert plan.count("BroadcastExchange") >= 2 or (
        "BroadcastNestedLoopJoin" in plan and "BroadcastExchange" in plan
    )


def test_simhash_bits_stays_jvm_side(spark):
    """The md5-nibble SimHash bit source must compile to built-in
    expressions (md5/conv/substring/shift) — no Python UDF anywhere in
    the plan (the engine-neutral hash switch must not cost the
    whole-stage-codegen path) — and the 64 bit votes must partial-
    aggregate before the exchange (one HashAggregate pair, map-side
    combine), not shuffle the exploded shingle stream."""
    from gemini_data_wrangler_spark.operators.dedup import simhash_bits
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    df = simhash_bits(docs, "doc_id", "text", n=5)
    plan = _plan(df)
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # partial aggregation: both the partial and final HashAggregate
    # appear (map-side combine of the 64 sums before the exchange)
    assert plan.count("HashAggregate") >= 2


def test_profile_columns_distinct_agg_is_hash_based(spark):
    """profile_orders_columns (round 7): min/max over STRING columns in
    the same agg() as the multi-column DISTINCTs forced the whole Expand
    stream through SortAggregate — a 6-key sort of rows x #distinct-cols.
    Split into a hash-friendly distinct pass + a keyless min/max pass,
    the plan must carry the Expand into HashAggregate and need NO Sort
    node anywhere (a keyless SortAggregate for the string min/max is
    sort-free)."""
    import re

    b, _ = registry()["profile_orders_columns"]
    plan = _plan(b(spark, SF_ORACLE))
    assert "Expand" in plan and "HashAggregate" in plan
    assert re.search(r"(?m)^\s*[+:]- Sort\b", plan) is None


def test_sorted_neighborhood_candidates_use_lead_window(spark):
    """er_sorted_neighborhood (round 7): the w-nearest-neighbor candidate
    set must come from lead() windows over the sort order (n·w rows, one
    window pass), not the rank-band self-join the before-plan shows as a
    BroadcastNestedLoopJoin comparing every rank pair (n² comparisons).
    The remaining NLJs are the bounded all-pairs TRUTH side (consumed by
    two count branches) and the two 1-row final cross joins — the before
    plan carries 7 NLJ nodes (candidate band join in 3 consumer subtrees
    on top of these 4)."""
    b, _ = registry()["er_sorted_neighborhood"]
    df = b(spark, SF_ORACLE)
    plan = _plan(df)
    assert "lead(" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 4
