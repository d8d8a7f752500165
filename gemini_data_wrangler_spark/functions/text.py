"""Text-analysis functions for training-data pipelines.

All hot-path computation is built-in ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage-codegen eligible) — no Python UDFs. Each function has
an ANSI-SQL equivalent runnable by DuckDB so results are oracle-checkable
(see queries_ext.py).

These operators have no counterpart in the reference app (its stage algebra
has zero scalar functions — SURVEY.md §2.4); they are the "beyond the
reference" surface for LLM-data pipelines: token counting, quality scoring,
language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-portable (used verbatim in the oracle).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "nicht"),
}
# Deterministic priority order for argmax ties (first wins).
LANG_PRIORITY = ("en", "es", "fr", "de")

PUNCT_CLASS = "[.,!?;:]"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count. SQL: len(regexp_split_to_array(trim(t),'\\s+'))."""
    return F.size(_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy: count of word/number/punctuation chunks, the classic
    pre-tokenizer regex shape. SQL-portable via regexp extraction."""
    # Split into runs of letters, runs of digits, or single non-space symbols.
    return F.size(F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def stopword_count(text: Column, lang: str = "en") -> Column:
    stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    toks = _tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS[lang])))


def quality_features(text: Column) -> dict[str, Column]:
    """Length/punctuation/stopword quality features + a composite score.

    score = stop_ratio * 2 + (1 - punct_ratio) — crude but deterministic and
    monotone in "looks like prose"; thresholds belong to callers.
    """
    n_chars = F.length(text)
    n_tokens = token_count(text)
    p_cnt = punct_count(text)
    s_cnt = stopword_count(text, "en")
    punct_ratio = F.round(p_cnt.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"), 6)
    stop_ratio = F.round(s_cnt.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double"), 6)
    mean_token_len = F.round(n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double"), 6)
    score = F.round(stop_ratio * 2 + (F.lit(1.0) - punct_ratio), 6)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_token_len": mean_token_len,
        "quality_score": score,
    }


def language_id(text: Column) -> Column:
    """Stopword-hit language ID: argmax over per-language stopword counts,
    ties broken by LANG_PRIORITY order, zero hits → 'und'."""
    toks = _tokens(F.lower(text))

    def _count(lang: str) -> Column:
        # NB: the predicate must be a 1-arg lambda — pyspark dispatches on
        # arity, and a bound default would be mistaken for the index arg.
        stops = LANG_STOPWORDS[lang]
        return F.size(F.filter(toks, lambda t: t.isin(*stops)))

    counts = {lang: _count(lang) for lang in LANG_PRIORITY}
    result = F.lit("und")
    # Build CASE from lowest priority upward so highest priority wins ties.
    best = None
    expr = None
    for lang in LANG_PRIORITY:
        c = counts[lang]
        if expr is None:
            expr = F.when(c > 0, F.lit(lang)).otherwise(result)
            best = c
        else:
            expr = F.when(c > best, F.lit(lang)).otherwise(expr)
            best = F.greatest(best, c)
    return expr


def language_id_oracle_sql(text_expr: str) -> str:
    """The identical heuristic as DuckDB SQL (argmax with priority order)."""

    def cnt(lang: str) -> str:
        stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        return (
            f"len(list_filter(regexp_split_to_array(trim(lower({text_expr})), '\\s+'),"
            f" t -> list_contains([{stops}], t)))"
        )

    c = {lang: cnt(lang) for lang in LANG_PRIORITY}
    # Same fold as language_id(): start with en-if-positive, then each later
    # language overrides only when strictly greater than the running max.
    expr = f"CASE WHEN {c['en']} > 0 THEN 'en' ELSE 'und' END"
    running_max = c["en"]
    for lang in LANG_PRIORITY[1:]:
        expr = f"CASE WHEN {c[lang]} > {running_max} THEN '{lang}' ELSE {expr} END"
        running_max = f"greatest({running_max}, {c[lang]})"
    return expr


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. SQL: md5(lower(regexp_replace(t, '\\s+', ' ', 'g')))."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))


def word_bigrams(tokens: Column) -> Column:
    """Word-bigram array from a token array — the basis for repetition
    statistics (Gopher-style top-n-gram fraction; Rae et al. 2021, §A1.1).
    Pure JVM: sequence + transform over the token array.

    SQL: [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)].
    """
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(tokens, i), F.element_at(tokens, i + 1)),
    )


# PII patterns — deliberately simple, identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, quantifiers, \b, \d only.
EMAIL_PATTERN = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z][a-z]+"
PHONE_PATTERN = r"\b\d{3}-\d{4}\b"
URL_PATTERN = r"https?://[a-z0-9.-]+[a-z0-9/._-]*"
URL_DOMAIN_PATTERN = r"https?://([a-z0-9.-]+)"


def redact_pii(text: Column) -> Column:
    """Replace emails then phone numbers with typed placeholder tokens.
    Spark ``regexp_replace`` is global by default (DuckDB needs the 'g'
    flag — see the oracle SQL in queries_ext3)."""
    scrubbed = F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(scrubbed, PHONE_PATTERN, "[PHONE]")


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_PATTERN), F.lit(0))),
    }


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-gram set, as an array column — the shingle basis
    for jaccard/minhash dedup. Pure JVM: sequence + transform + distinct.

    SQL: list_distinct([substr(t, i, n) for i in generate_series(1,
    greatest(length(t)-n+1, 1))]).
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))),
            lambda i: text.substr(i, F.lit(n)),
        )
    )


def char_shingle_hashes(text: Column, n: int = 5) -> Column:
    """Distinct character n-gram set hashed to 64-bit longs, as an
    ``array<bigint>`` column — the memory-lean shingle basis for dedup.

    The substring is hashed INSIDE the transform, so the n-char string is a
    transient codegen value: nothing downstream (persist, shuffle, join)
    ever holds shingle strings. A corpus of D docs × S shingles as strings
    is D·S small JVM objects parked in the block store (GC-pause fuel at
    every scale); as a primitive long array it is D objects. xxhash64
    collisions across a ~2k-element set are ~1e-13 and the dedup oracles
    hash-match the exact string-based answer at sf0.01.
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))),
            lambda i: F.xxhash64(text.substr(i, F.lit(n))),
        )
    )
