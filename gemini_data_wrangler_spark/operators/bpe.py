"""Byte-pair-encoding merge training as DataFrame operations.

BPE trains on the WORD-FREQUENCY table, not the raw corpus — the standard
formulation (Sennrich et al. 2016): collapse the corpus to distinct words
with counts once (at 100 TB the vocabulary is millions of rows where the
corpus is trillions of tokens — this collapse is the scale step), then
iterate on that small table:

  1. count adjacent symbol pairs weighted by word frequency
     (explode + map-side-combined groupBy), plus per-pair trigram
     bounds (max count of any triple extending the pair left/right),
  2. take a BATCH of merges per round from one top-K probe
     (TakeOrderedAndProject, one driver read per round, not per merge):
     the maximal contiguous desc-sorted prefix that is pairwise
     symbol-disjoint and whose every later member's count strictly
     exceeds the trigram bound of every earlier member. Disjointness
     means earlier merges cannot change a later member's count;
     contiguity means no skipped higher-count pair could still lead;
     the trigram bound caps the count of any pair a merge CREATES
     ((x,ab) ≤ #(x,a,b), (ab,y) ≤ #(a,b,y)) — together the batch is
     provably identical to taking the merges one at a time,
  3. apply the whole batch to every word's symbol sequence with chained
     pure-JVM left-to-right folds (``aggregate`` with an array
     accumulator — the same greedy semantics as the reference BPE
     implementations; no UDF), one lineage checkpoint per round.

Iterations are driver-orchestrated; per-round lineage is truncated with
``localCheckpoint`` like the other iterative operators (k-means, CC,
PageRank). Determinism: ties on pair count break lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "▁"  # block marker, same role as sentencepiece's ▁


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the only full-corpus pass BPE training makes."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(a: str, b: str):
    """Left-to-right greedy merge of adjacent (a, b) into ab — as a JVM
    ``aggregate`` fold, so merge application never leaves codegen."""
    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    a_lit, b_lit = esc(a), esc(b)
    return F.expr(
        "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        f"  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a_lit}' "
        f"            AND x = '{b_lit}' "
        f"       THEN concat(slice(acc, 1, size(acc) - 1), array('{a_lit}{b_lit}')) "
        "        ELSE concat(acc, array(x)) END)"
    )


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus.

    Output: merge_rank (1-based), left_sym, right_sym, pair_count —
    ordered greedy merge table, the artifact a tokenizer ships.
    """
    spark = docs.sparkSession
    vocab = word_freq_table(docs, text_col)
    # Seed symbols: characters plus an end-of-word marker (so merges can
    # learn word-final units without crossing word boundaries).
    syms = vocab.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    ).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = (
            syms.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        # Trigram bound: any pair CREATED by merging (a,b) is (x,ab) or
        # (ab,y), whose count is at most the count of the pre-merge
        # triple (x,a,b) / (a,b,y). One triple count, reduced twice.
        tris = (
            syms.filter(F.size("syms") >= 3)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 2), "
                        "i -> struct(element_at(syms, i) AS x, "
                        "element_at(syms, i + 1) AS y, "
                        "element_at(syms, i + 2) AS z))"
                    )
                ).alias("t"),
            )
            .groupBy(F.col("t.x").alias("x"), F.col("t.y").alias("y"), F.col("t.z").alias("z"))
            .agg(F.sum("freq").alias("tcnt"))
            .localCheckpoint()
        )
        rb = tris.groupBy(F.col("x").alias("a"), F.col("y").alias("b")).agg(
            F.max("tcnt").alias("_rb")
        )
        lb = tris.groupBy(F.col("y").alias("a"), F.col("z").alias("b")).agg(
            F.max("tcnt").alias("_lb")
        )
        top = (
            pairs.join(rb, ["a", "b"], "left")
            .join(lb, ["a", "b"], "left")
            .select(
                "a",
                "b",
                "cnt",
                F.greatest(
                    F.coalesce("_rb", F.lit(0)), F.coalesce("_lb", F.lit(0))
                ).alias("bound"),
            )
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(max(2, min(16, n_merges - len(merges))))
            .collect()
        )
        if not top:
            break
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        new_bound = 0
        for r in top:
            if batch and (
                r["a"] in used
                or r["b"] in used
                or r["cnt"] <= new_bound
                or len(merges) + len(batch) >= n_merges
            ):
                break
            batch.append((r["a"], r["b"], int(r["cnt"])))
            used.update((r["a"], r["b"]))
            new_bound = max(new_bound, int(r["bound"]))
        for a, b, cnt in batch:
            merges.append((len(merges) + 1, a, b, cnt))
        if len(merges) >= n_merges:
            # The folded symbol stream only feeds the NEXT round's pair
            # count — once the merge table is complete, folding and
            # checkpointing it is a whole wasted job over the vocabulary
            # (round 8: one fold job fewer per training call).
            break
        folded = syms
        for a, b, _ in batch:
            folded = folded.select("freq", _merge_fold(a, b).alias("syms"))
        syms = folded.localCheckpoint()

    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string, pair_count long"
    )


def encode_with_merges(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge list to the corpus: per doc, token count
    before/after — the measurement that justifies a tokenizer (fertility).
    Merge application is the same JVM fold, chained per merge."""
    # Per-word symbol streams: words → chars (+ marker), flattened per
    # doc (learned pairs never straddle the marker, so the flat fold is
    # equivalent to a per-word fold), then fold each merge in rank order.
    out = docs.select(
        "doc_id",
        F.expr(
            "flatten(transform("
            f"  split(trim(lower({text_col})), '\\\\s+'), "
            f"  w -> concat(split(w, ''), array('{END_OF_WORD}'))))"
        ).alias("syms"),
    )
    for a, b in merges:
        out = out.select("doc_id", _merge_fold(a, b).alias("syms"))
    return out.select("doc_id", F.size("syms").alias("n_tokens"))
