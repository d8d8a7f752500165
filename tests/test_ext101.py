"""Property tests for extension batch 101: reciprocal-rank fusion vs a
pure-Python recomputation from the two input rankings."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_rrf_matches_python(spark):
    from pyspark.sql import functions as F

    from gemini_data_wrangler_spark.operators.similarity import (
        cosine_topk,
        queries_from_ids,
    )
    from gemini_data_wrangler_spark.queries import registry
    from gemini_data_wrangler_spark.queries_ext101 import (
        _RRF_K,
        _RRF_LIST_K,
        _RRF_QUERY_IDS,
        _RRF_TOP,
    )
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    t = load_sf_tables(spark, SF_ORACLE)

    # Reference lexical ranking: 5-gram Jaccard in plain Python.
    docs = {
        r["doc_id"]: r["text"]
        for r in t["documents"].select("doc_id", "text").collect()
    }

    def shingles(s):
        return {s[i : i + 5] for i in range(max(len(s) - 4, 1))}

    lex_ranks = {}
    for qid in _RRF_QUERY_IDS:
        qs = shingles(docs[qid])
        scored = sorted(
            (
                (-round(len(qs & shingles(tx)) / len(qs | shingles(tx)), 6), did)
                for did, tx in docs.items()
                if did != qid
            ),
        )
        for rank, (_, did) in enumerate(scored[:_RRF_LIST_K], start=1):
            lex_ranks[(qid, did)] = rank

    vec_ranks = {
        (r["query_id"], r["vec_id"]): r["rank"]
        for r in cosine_topk(
            t["embeddings"],
            queries_from_ids(t["embeddings"], _RRF_QUERY_IDS),
            k=_RRF_LIST_K,
        ).collect()
    }

    expected = {}
    for qid in _RRF_QUERY_IDS:
        fused = {}
        for (q, d), r in list(lex_ranks.items()) + list(vec_ranks.items()):
            if q != qid:
                continue
            fused.setdefault(d, 0.0)
        for d in fused:
            s = 0.0
            if (qid, d) in lex_ranks:
                s += 1.0 / (_RRF_K + lex_ranks[(qid, d)])
            if (qid, d) in vec_ranks:
                s += 1.0 / (_RRF_K + vec_ranks[(qid, d)])
            fused[d] = round(s, 9)
        top = sorted(((-s, d) for d, s in fused.items()))[:_RRF_TOP]
        for rank, (negs, d) in enumerate(top, start=1):
            expected[(qid, d)] = (-negs, rank)

    rows = registry()["rec_reciprocal_rank_fusion"][0](spark, SF_ORACLE).collect()
    assert len(rows) == len(_RRF_QUERY_IDS) * _RRF_TOP
    got = {
        (r["query_id"], r["vec_id"]): (r["rrf_score"], r["fused_rank"])
        for r in rows
    }
    assert got == expected

    # every fused row must come from at least one input list
    for qid, did in got:
        assert (qid, did) in lex_ranks or (qid, did) in vec_ranks

    # fused scores are monotone in fused_rank per query
    for qid in _RRF_QUERY_IDS:
        seq = sorted(
            ((rk, sc) for (q, _), (sc, rk) in got.items() if q == qid)
        )
        scores = [sc for _, sc in seq]
        assert scores == sorted(scores, reverse=True)


def test_temperature_sampling_properties(spark):
    from gemini_data_wrangler_spark.queries import registry

    rows = registry()["corpus_temperature_sampling"][0](spark, SF_ORACLE).collect()
    nat = [r["natural_p"] for r in rows]
    samp = [r["sampled_p"] for r in rows]
    assert abs(sum(nat) - 1.0) < 1e-4
    assert abs(sum(samp) - 1.0) < 1e-4
    # alpha < 1 flattens: the head shrinks, the tail grows
    assert max(samp) <= max(nat) + 1e-9
    assert min(samp) >= min(nat) - 1e-9
    # epochs_per_pass is the sampled/natural ratio
    for r in rows:
        if r["natural_p"] > 0:
            assert abs(
                r["epochs_per_pass"] - r["sampled_p"] / r["natural_p"]
            ) < 1e-3


def test_repeated_window_rate_properties(spark):
    from collections import defaultdict

    from gemini_data_wrangler_spark.queries import registry
    from gemini_data_wrangler_spark.queries_ext101 import _RW_S, _RW_W
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = registry()["dedup_repeated_window_rate"][0](spark, SF_ORACLE)
    data = {r["doc_id"]: r for r in rows.collect()}
    for r in data.values():
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]

    # Full pure-Python recomputation of the window duplication counts.
    docs = {
        r["doc_id"]: r["text"]
        for r in load_sf_tables(spark, SF_ORACLE)["documents"]
        .select("doc_id", "text")
        .collect()
    }
    owners = defaultdict(set)
    windows = {}
    for did, tx in docs.items():
        if len(tx) < _RW_W:
            continue
        ws = [
            tx[i : i + _RW_W]
            for i in range(0, len(tx) - _RW_W + 1, _RW_S)
        ]
        windows[did] = ws
        for w in set(ws):
            owners[w].add(did)
    dup = {w for w, ds in owners.items() if len(ds) >= 2}
    assert dup, "fixture corpus should contain cross-doc repeated windows"
    assert set(data) == set(windows)
    some_positive = False
    for did, ws in windows.items():
        n_dup = sum(1 for w in ws if w in dup)
        assert data[did]["n_windows"] == len(ws), did
        assert data[did]["n_dup_windows"] == n_dup, did
        assert abs(data[did]["dup_rate"] - round(n_dup / len(ws), 6)) < 1e-9
        some_positive = some_positive or n_dup > 0
    assert some_positive
