"""Unit + plan-shape tests for the batch-11/12 corpus-hygiene operators
(boilerplate bigrams, inverted index, shard assignment, prefix-block
dedup, time-decayed aggregates). Oracle parity for all five runs in
tests/test_oracle_parity.py; these pin the scale-relevant properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_boilerplate_threshold_is_broadcast(spark):
    from gemini_data_wrangler_spark.queries_ext11 import text_boilerplate_bigrams

    df = text_boilerplate_bigrams(spark, SF_SMALL)
    # the one-row n_docs scalar must join as a broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in _plan(df) or "BroadcastExchange" in _plan(df)
    rows = df.collect()
    assert rows, "non-degenerate: corpus has boilerplate bigrams"
    for r in rows:
        assert 0 <= r.n_boilerplate <= r.n_grams
        assert abs(r.boilerplate_ratio - r.n_boilerplate / r.n_grams) < 1e-12


def test_inverted_index_posting_head_bounded(spark):
    from gemini_data_wrangler_spark.queries_ext11 import text_inverted_index

    rows = text_inverted_index(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # posting_head is serialized to a comma-joined string (scalar-only
        # output contract for the driver's canonicalizer)
        head = [int(x) for x in r.posting_head.split(",")] if r.posting_head else []
        assert len(head) <= 100
        assert head == sorted(head)
        assert r.df >= len(head) if r.df > 100 else r.df == len(head)
        assert r.cf >= r.df


def test_shard_assignment_positions_contiguous(spark):
    from gemini_data_wrangler_spark.queries_ext11 import shard_assignment

    df = shard_assignment(spark, SF_SMALL)
    rows = df.collect()
    n_docs = len(rows)
    assert len({r.doc_id for r in rows}) == n_docs  # every doc exactly once
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard <= 15
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic: a second run assigns identical (doc, shard, pos)
    again = {(r.doc_id, r.shard, r.pos) for r in shard_assignment(spark, SF_SMALL).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}


def test_prefix_block_pairs_share_opening(spark):
    from gemini_data_wrangler_spark.queries_ext12 import dedup_prefix_block
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    pairs = dedup_prefix_block(spark, SF_SMALL).collect()
    assert pairs, "non-degenerate: corpus has shared 5-word openings"
    docs = {
        r.doc_id: r.text
        for r in load_sf_tables(spark, SF_SMALL)["documents"].collect()
    }
    for p in pairs:
        assert p.a_id < p.b_id
        a5 = " ".join(docs[p.a_id].split(" ")[:5])
        b5 = " ".join(docs[p.b_id].split(" ")[:5])
        assert a5 == b5
        assert p.is_prefix_dup == (
            docs[p.a_id].startswith(docs[p.b_id])
            or docs[p.b_id].startswith(docs[p.a_id])
        )


def test_mixing_plan_hits_target(spark):
    from gemini_data_wrangler_spark.queries_ext12 import corpus_mixing_plan

    rows = corpus_mixing_plan(spark, SF_SMALL).collect()
    assert {r.lang for r in rows} == {"en", "zh", "de", "fr", "es"}
    total = sum(r.lang_tokens for r in rows)
    for r in rows:
        # applying the rate reproduces the target share exactly
        assert abs(r.lang_tokens * r.sample_rate / total - r.target_share) < 1e-9
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9


def test_mad_outlier_screen_properties(spark):
    from gemini_data_wrangler_spark.queries_ext12 import dq_outlier_mad

    rows = dq_outlier_mad(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0
        assert 0 <= r.n_outliers < r.n_events  # median can't be an outlier


def test_time_decay_weights_bounded_and_anchored(spark):
    from gemini_data_wrangler_spark.queries_ext12 import events_time_decayed_value

    rows = events_time_decayed_value(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # each event contributes a weight in (0, 1]; the anchor row (age 0)
        # guarantees at least one full-weight event overall
        assert 0 < r.decayed_weight <= r.n_events
    assert any(r.decayed_weight > 0.999 for r in rows) or len(rows) == 1
