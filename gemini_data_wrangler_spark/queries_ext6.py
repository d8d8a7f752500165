"""Training-data pipeline operators, round 3 — benchmark decontamination
(n-gram overlap against an eval set) and sequence packing (concat-and-chunk
into fixed token-budget training sequences).

Both are staples of LLM pre-training data preparation (decontamination per
GPT-3 appendix C / PaLM §6; packing per the standard concat-then-chunk
recipe). The reference app has no text surface at all (SURVEY.md §2.4);
north-star scope. Pure built-in expressions, exact DuckDB oracles.

Scale shapes:
- Decontamination: the eval side is tiny by construction (benchmarks are
  KBs, the corpus is TBs) — its distinct n-gram set is broadcast, so the
  100 TB train side is one scan + broadcast-hash semi-probe + one shuffle
  keyed on doc_id for the per-doc overlap count. No train×train pairing.
- Packing: a naive global-window cumulative sum serializes onto one task.
  Instead: two-level distributed prefix sum — per-bucket window cumsum
  (parallel across ~N/1000 buckets), bucket totals (tiny) get their own
  running sum and are broadcast back. At 100 TB the only single-task step
  handles one row per bucket (~millions), itself chunkable by another
  level if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.queries import register
from gemini_data_wrangler_spark.sources.readers import load_sf_tables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_sf_tables(spark, sf_dir)["documents"]


def word_ngrams(tokens_col: str, n: int) -> F.Column:
    """Space-joined word n-grams of an array<string> column, as a JVM-side
    expression (transform over an index sequence; empty when the doc is
    shorter than n). No Python UDF in the path."""
    return F.expr(
        f"transform(sequence(1, greatest(size({tokens_col}) - {n - 1}, 0)), "
        f"i -> array_join(slice({tokens_col}, i, {n}), ' '))"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (train-side n-gram overlap vs a small eval set)
# ---------------------------------------------------------------------------
# The synthetic corpus has no real benchmark, so the eval set is carved out
# deterministically (doc_id % 97 = 0) inside BOTH the query and the oracle.
# n=3 keeps overlaps non-trivial on the small word-soup vocabulary; real
# decontamination runs the same plan with n=13 (GPT-3 appendix C).
@register(
    "decontam_ngram_overlap",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), ng AS (
      SELECT DISTINCT doc_id, unnest(
        [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t) - 2)]
      ) AS g
      FROM toks
    ), ev AS (
      SELECT DISTINCT g FROM ng WHERE doc_id % 97 = 0
    ), tr AS (
      SELECT doc_id, g FROM ng WHERE doc_id % 97 <> 0
    )
    SELECT d.doc_id,
           count(ev.g) AS overlap_ngrams,
           count(ev.g) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN tr ON d.doc_id = tr.doc_id
    LEFT JOIN ev ON tr.g = ev.g
    GROUP BY d.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-train-doc count of distinct word n-grams also present in the
    eval set, plus a contaminated flag. The eval n-gram set is broadcast
    (benchmarks are tiny); the train side never self-joins."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    )
    ng = docs.select(
        "doc_id", F.explode(word_ngrams("t", 3)).alias("g")
    ).distinct()
    is_eval = F.col("doc_id") % 97 == 0
    ev = ng.filter(is_eval).select("g").distinct()
    tr = ng.filter(~is_eval)
    hits = (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("overlap_ngrams"))
    )
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("overlap_ngrams", F.lit(0)).alias("overlap_ngrams"),
            (F.coalesce("overlap_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: concatenate docs in doc_id order, chunk into
# fixed-budget training sequences; report each doc's sequence span.
# ---------------------------------------------------------------------------
PACK_BUDGET = 512
_PACK_BUCKET = 1000  # docs per prefix-sum bucket


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (content-addressed, engine-portable)
# ---------------------------------------------------------------------------
@register(
    "split_train_val_test",
    r"""
    SELECT source,
           CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
                WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           sum(len(regexp_split_to_array(trim(text), '\s+'))) AS n_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~80/10/10 train/val/test split by md5(doc_id) hex threshold —
    content-addressed, so every engine, run, and cluster size assigns each
    doc to the SAME split (seeded randomSplit cannot promise that across
    engines). Pure projection + one tiny (source × split) aggregation."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.select(
            "source",
            F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test").alias("split"),
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("_nt"),
        )
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_nt").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# PageRank over the supplier↔part bipartite graph (iterative showcase)
# ---------------------------------------------------------------------------
@register("graph_pagerank_parts", None)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the supplier↔part graph induced by lineitem (both
    directions, so no dangling nodes), top 50 nodes by rank. Iterative
    DataFrame algorithm: per round one cached-edge join against the
    node-sized rank state + one aggregation; exact semantics are pinned
    against a numpy power-iteration reference in tests (rows-only here —
    floating-point sums are not bit-stable across engines)."""
    from gemini_data_wrangler_spark.operators.graphs import pagerank

    li = (
        load_sf_tables(spark, sf_dir)["lineitem"]
        # One ship-year keeps the bench-scale graph modest; the iteration
        # cost is linear in edges either way (pushed-down scan filter).
        .filter(F.col("l_shipdate").between("1995-01-01", "1995-12-31"))
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = li.union(li.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        pagerank(edges, iterations=5)
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Vocabulary build + document encoding (tokenize → id sequences)
# ---------------------------------------------------------------------------
@register(
    "vocab_encode_docs",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest([{'pos': i, 'w': t[i]} for i in generate_series(1, len(t))],
                    recursive := true)
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
            FROM documents)
    ), freq AS (
      SELECT w, count(*) AS c FROM tok GROUP BY w
    ), vocab AS (
      SELECT w, row_number() OVER (ORDER BY c DESC, w ASC) AS wid FROM freq
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           string_agg(CAST(v.wid AS VARCHAR), ',' ORDER BY t.pos) AS ids_str
    FROM tok t JOIN vocab v USING (w)
    GROUP BY t.doc_id
    """,
)
def vocab_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a frequency-ranked vocabulary (id 1 = most frequent word,
    ties by word) and encode every document as its id sequence — the
    tokenize-and-encode step of a training pipeline, output as a
    comma-joined string so the full sequence is value-hash checkable.

    Scale: the corpus never shuffles on words — the vocabulary (distinct
    words + counts, vastly smaller than the token stream) is built with one
    partial-aggregated exchange, ranked, and broadcast back; encoding is
    then map-side + one doc_id-keyed aggregation. The rank window is a
    single task over the VOCABULARY only; a billion-entry vocabulary would
    use the same two-level prefix-rank trick as ``pack_sequences``."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = freq.withColumn(
        "wid", F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("w").asc()))
    ).select("w", "wid")
    return (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "wid"))),
                    lambda s: s["wid"].cast("string"),
                ),
            ).alias("ids_str"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters (mergeable frequency sketches)
# ---------------------------------------------------------------------------
CMS_EPS, CMS_CONF, CMS_SEED = 0.001, 0.99, 42


@register("sketch_count_min_heavy_hitters", None)
def sketch_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source count-min sketches of the word stream, union-merged into
    corpus-wide frequency estimates — the mergeable-sketch pattern that
    lets a 100 TB pipeline keep per-shard/day frequency state and answer
    global heavy-hitter queries without re-scanning (one sketch is a few
    KB regardless of input size). Only the kilobyte sketches and the
    candidate vocabulary ever reach the driver; candidates here are the
    full distinct vocabulary (tiny word-soup corpus), in production a
    sampled/top-k candidate set. Deterministic (fixed seed); estimates are
    upper bounds within eps·N — asserted against exact counts in tests."""
    docs = _docs(spark, sf_dir)
    words = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    per_source = (
        docs.select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("source")
        .agg(F.count_min_sketch("w", CMS_EPS, CMS_CONF, CMS_SEED).alias("_sk"))
    )
    jvm = spark.sparkContext._jvm
    merged = None
    for row in per_source.collect():  # one row per source — sketches are KBs
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(row["_sk"]))
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    cands = [r["w"] for r in words.distinct().collect()]
    rows = [(w, int(merged.estimateCount(w))) for w in sorted(cands)]
    return spark.createDataFrame(rows, "word string, est_count bigint")


@register(
    "pack_sequences",
    rf"""
    WITH t AS (
      SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tok_start
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(floor(tok_start / {PACK_BUDGET}) AS BIGINT) AS first_seq,
           CAST(floor((tok_start + n_tokens - 1) / {PACK_BUDGET}) AS BIGINT) AS last_seq,
           CAST(floor((tok_start + n_tokens - 1) / {PACK_BUDGET})
                - floor(tok_start / {PACK_BUDGET}) + 1 AS BIGINT) AS n_seqs
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: global exclusive prefix sum of per-doc
    token counts in doc_id order, then each doc maps to the budget-sized
    sequences it spans. The prefix sum is distributed: window cumsum
    within ~1000-doc buckets (parallel) + a broadcast-joined running
    offset over the tiny bucket-totals table — no global one-task window."""
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") / _PACK_BUCKET).cast("bigint").alias("bucket"),
    )
    in_bucket = Window.partitionBy("bucket").orderBy("doc_id")
    local = t.withColumn(
        "local_start",
        F.coalesce(
            F.sum("n_tokens").over(
                in_bucket.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    totals = t.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_total"))
    offsets = totals.withColumn(
        "bucket_offset",
        F.coalesce(
            F.sum("bucket_total").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "bucket_offset")
    start = F.col("bucket_offset") + F.col("local_start")
    last = F.floor((start + F.col("n_tokens") - 1) / PACK_BUDGET)
    first = F.floor(start / PACK_BUDGET)
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            first.cast("bigint").alias("first_seq"),
            last.cast("bigint").alias("last_seq"),
            (last - first + 1).cast("bigint").alias("n_seqs"),
        )
    )
