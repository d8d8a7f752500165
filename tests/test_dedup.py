"""Dedup-operator behavior beyond the oracle queries: LSH recall against the
exact pair set, synthetic duplicate handling, determinism across runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from gemini_data_wrangler_spark.sources.readers import load_sf_tables
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def documents(spark):
    return load_sf_tables(spark, SF_ORACLE)["documents"]


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_exact_dedup_finds_planted_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        "doc_id int, text string",
    )
    out = {(r.text, r.keep_id, r.copies) for r in exact_dedup(df, ["text"], "doc_id").collect()}
    assert out == {("same text", 1, 3), ("other", 3, 1)}


def test_lsh_recall_matches_exact_pairs(spark, documents):
    """The LSH parameters must catch every pair the exact operator finds on
    the driver corpus (this is what licenses sharing the oracle)."""
    exact = _pairs(ngram_jaccard_pairs(documents, "doc_id", "text", n=5, threshold=0.8))
    lsh = _pairs(minhash_lsh_pairs(documents, "doc_id", "text", n=5, threshold=0.8))
    assert len(exact) > 0  # the corpus has planted near-dups
    assert lsh == exact


def test_bitmap_verify_equals_hashset_verify(spark, documents, monkeypatch):
    """The dense-bitmap verify (small-vocabulary fast path) must return the
    exact pair set AND bit-identical jaccard values of the hash-set
    ``array_intersect`` verify it replaces — same integers, same double
    division, different physical evaluation only."""
    import gemini_data_wrangler_spark.operators.dedup as dd

    def _full(df):
        return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}

    bitmap = _full(ngram_jaccard_pairs(documents, "doc_id", "text", n=5, threshold=0.8))
    monkeypatch.setattr(dd, "_BITMAP_MAX_VOCAB", 0)  # force the hash-set path
    hashset = _full(ngram_jaccard_pairs(documents, "doc_id", "text", n=5, threshold=0.8))
    assert len(bitmap) > 0
    assert bitmap == hashset


def test_simhash_gate_exactly_defined(spark, documents):
    """simhash_pairs' contract is gate-defined, not recall-defined: with
    max_hamming ≤ chunks-1 the pigeonhole candidates are complete, so the
    output must equal EXACTLY {exact near-dup pairs whose simhash hamming
    ≤ 7} — independently recomputed here from simhash_bits — and be a
    subset of the exact pair set (jaccard verification is sound)."""
    from gemini_data_wrangler_spark.operators.dedup import simhash_bits

    exact = _pairs(ngram_jaccard_pairs(documents, "doc_id", "text", n=5, threshold=0.8))
    sim = _pairs(simhash_pairs(documents, "doc_id", "text", n=5, jaccard_threshold=0.8))
    assert sim <= exact
    bits = {
        r["doc_id"]: r["_simhash"]
        for r in simhash_bits(documents, "doc_id", "text", n=5).collect()
    }
    gated = {
        (a, b)
        for a, b in exact
        if bin((bits[a] ^ bits[b]) & ((1 << 64) - 1)).count("1") <= 7
    }
    assert sim == gated
    # the gate passes the overwhelming share of true near-dups on this
    # corpus (near-identical docs sit at tiny hamming distances)
    assert len(sim) >= 0.8 * len(exact)


def test_minhash_deterministic_across_runs(spark, documents):
    a = _pairs(minhash_lsh_pairs(documents, "doc_id", "text"))
    b = _pairs(minhash_lsh_pairs(documents, "doc_id", "text"))
    assert a == b


def test_near_dup_detected_verbatim_edit(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = base.replace("lazy", "sleepy", 1)
    different = "completely unrelated content with nothing shared here at all " * 6
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, different)], "doc_id int, text string"
    )
    pairs = _pairs(ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.7))
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_connected_components_chains_and_singletons(spark):
    from gemini_data_wrangler_spark.operators.dedup import connected_components

    # Two components: a 4-chain {1,2,3,4} (transitive, needs propagation)
    # and a pair {10, 11}. Vertex 7 appears only as doc_b.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (6, 7)], "doc_a int, doc_b int"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (6, 6), (7, 6)}


def test_connected_components_star_and_cycle(spark):
    from gemini_data_wrangler_spark.operators.dedup import connected_components

    # Star around 100 plus a cycle 1-2-3-1; min label must win everywhere.
    pairs = spark.createDataFrame(
        [(100, 5), (100, 50), (100, 2), (1, 2), (2, 3), (3, 1)],
        "doc_a int, doc_b int",
    )
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    # 2 bridges the star and the cycle: everything is one component, min id 1.
    assert got == {(v, 1) for v in (1, 2, 3, 5, 50, 100)}


def test_pair_candidate_tiers_agree(spark):
    """The tiled distributed kernel must produce the IDENTICAL candidate set
    at any block granularity (exactness can't depend on tiling); the LSH
    tier must be a subset of it (approximate-by-contract) that still
    catches the real dups."""
    from gemini_data_wrangler_spark.operators.similarity import cosine_pair_candidates

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"]
    coarse = _pairs(cosine_pair_candidates(emb, route="tiled", threshold=0.45))
    fine = _pairs(
        cosine_pair_candidates(emb, route="tiled", threshold=0.45, block_rows=200)
    )
    assert len(coarse) > 0
    assert fine == coarse
    lsh = _pairs(cosine_pair_candidates(emb, route="lsh", threshold=0.45))
    # Hyperplane buckets at the default (4 planes × 12 tables) catch every
    # >=0.45 pair on the driver corpus; at minimum they must catch most.
    assert len(lsh & coarse) >= 0.9 * len(coarse)


def test_star_contraction_matches_propagation(spark):
    from gemini_data_wrangler_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (6, 7), (100, 5), (100, 50), (3, 1)],
        "doc_a int, doc_b int",
    )
    prop = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    star = {(r.doc_id, r.cluster_id) for r in connected_components_star(pairs).collect()}
    assert star == prop


def test_cc_driver_route_matches_distributed(spark):
    """The auto-routed driver-side union-find must reproduce BOTH
    distributed loops exactly — including the self-edge semantics they
    disagree on (min-label emits a self-only vertex, star drops it) —
    and must decline (return the distributed result) past the edge bound."""
    from gemini_data_wrangler_spark.operators.dedup import (
        _cc_driver_route,
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (6, 7), (100, 5), (100, 50), (3, 1), (77, 77)],
        "doc_a int, doc_b int",
    )
    auto_prop = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    dist_prop = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, route="distributed").collect()
    }
    assert auto_prop == dist_prop
    assert (77, 77) in auto_prop  # min-label keeps self-only vertices

    auto_star = {
        (r.doc_id, r.cluster_id) for r in connected_components_star(pairs).collect()
    }
    dist_star = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(pairs, route="distributed").collect()
    }
    assert auto_star == dist_star
    assert (77, 77) not in auto_star  # star contraction drops them

    # Past the bound the probe must decline so the distributed loop runs.
    assert _cc_driver_route(pairs, "doc_a", "doc_b", max_edges=3) is None


def test_star_contraction_long_chain_bounded_rounds(spark):
    """Adversarial diameter: a 400-vertex chain needs ~400 propagation hops
    but must collapse within O(log^2 n) star rounds — 12 is generous."""
    from gemini_data_wrangler_spark.operators.dedup import connected_components_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "doc_a int, doc_b int"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(chain, max_iter=12).collect()
    }
    assert got == {(i, 0) for i in range(401)}


def test_simhash_bits_match_pure_python_md5_definition(spark):
    """Pin the engine-neutral bit definition: bit j of a shingle's
    contribution = (md5 hex nibble at string position 1 + j//4) >> (j%4)
    & 1, ±1-voted per doc with ties to 0. Recomputed here in pure Python
    (hashlib) — a drift in the Spark conv/substring/shift pipeline or in
    the utf-8 encoding of non-ASCII shingles is a bit-exact failure."""
    import hashlib

    from gemini_data_wrangler_spark.operators.dedup import simhash_bits

    texts = [
        (1, "hello world of simhash"),
        (2, "héllo wörld — naïve café"),  # multi-byte utf-8
        (3, "aaaaa"),  # single shingle
        (4, "ab"),  # shorter than n: one truncated shingle
    ]
    n = 5

    def py_simhash(text: str) -> int:
        grams = []
        for i in range(max(len(text) - n + 1, 1)):
            g = text[i : i + n]
            if g not in grams:
                grams.append(g)
        votes = [0] * 64
        for g in grams:
            m = hashlib.md5(g.encode("utf-8")).hexdigest()
            for j in range(64):
                nib = int(m[j // 4], 16)
                votes[j] += (nib >> (j % 4)) & 1
        out = 0
        for j in range(64):
            if 2 * votes[j] > len(grams):
                out |= 1 << j
        return out

    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["_simhash"] & ((1 << 64) - 1)
        for r in simhash_bits(df, "doc_id", "text", n=n).collect()
    }
    for doc_id, text in texts:
        assert got[doc_id] == py_simhash(text), (doc_id, text)


def test_simhash_oracle_parity_random_corpora(spark):
    """Property-style parity: simhash_pairs must equal simhash_oracle_sql
    on randomized synthetic corpora (planted near-dups + unicode noise) —
    the fixed testdata corpus alone can't exercise every chunk/hamming
    boundary."""
    import random

    import duckdb

    from gemini_data_wrangler_spark.operators.dedup import (
        simhash_oracle_sql,
        simhash_pairs,
    )
    from gemini_data_wrangler_spark.parity import compare

    rng = random.Random(5005)
    words = ["alpha", "béta", "gamma", "δelta", "epsilon", "zeta", "ηta"]
    for trial in range(3):
        rows = []
        doc_id = 0
        for base in range(8):
            text = " ".join(rng.choice(words) for _ in range(rng.randint(6, 30)))
            rows.append((doc_id, text))
            doc_id += 1
            # planted near-dup: mutate a few characters
            if rng.random() < 0.7:
                chars = list(text)
                for _ in range(rng.randint(0, 4)):
                    chars[rng.randrange(len(chars))] = rng.choice("xyz ")
                rows.append((doc_id, "".join(chars)))
                doc_id += 1
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        con = duckdb.connect()
        con.register("documents_arrow", df.toPandas())
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_arrow")
        diag = compare(
            simhash_pairs(df, "doc_id", "text", n=5, jaccard_threshold=0.5),
            con,
            simhash_oracle_sql(
                "documents", "doc_id", "text", n=5, jaccard_threshold=0.5
            ),
        )
        assert diag["ok"], (trial, diag)
        con.close()


def test_cc_unknown_route_raises(spark):
    """A typo'd route must raise instead of silently forcing a path
    (round-5 ADVICE: cosine_pair_candidates validates, CC did not)."""
    import pytest

    from gemini_data_wrangler_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame([(1, 2)], "doc_a int, doc_b int")
    with pytest.raises(ValueError, match="route"):
        connected_components(pairs, route="driverr")
    with pytest.raises(ValueError, match="route"):
        connected_components_star(pairs, route="drv")


def test_cc_auto_fallback_scans_pairs_once(spark):
    """route="auto" past the edge bound: the limit-probe executes the
    pair-producing upstream, and without the pre-probe persist the
    distributed loop would execute it AGAIN from scratch (round-5 ADVICE,
    medium). Instrument the upstream with an accumulator-counting UDF:
    every source row must be computed exactly once — probe partitions
    land in the cache, the fallback replays them.
    """
    from pyspark.sql.types import IntegerType

    from gemini_data_wrangler_spark.operators.dedup import connected_components

    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    bump_udf = F.udf(bump, IntegerType())
    base = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(200)], "doc_a int, doc_b int"
    ).repartition(4)
    pairs = base.select(bump_udf("doc_a").alias("doc_a"), "doc_b")
    out = connected_components(pairs, route="auto", max_edges=10)
    rows = {(r.doc_id, r.cluster_id) for r in out.collect()}
    assert rows == {(2 * i + o, 2 * i) for i in range(200) for o in (0, 1)}
    assert acc.value == 200, (
        f"pair pipeline computed {acc.value} rows for a 200-row source — "
        "the auto-route fallback re-executed the upstream"
    )
