"""Extension batch 72: string-distance kernels cross-validated against
DuckDB's native implementations on adversarial crafted cases (the corpus
queries are hash-checked in test_oracle_parity)."""

from __future__ import annotations

import pytest

CASES = [
    ("MARTHA", "MARHTA"),
    ("DWAYNE", "DUANE"),
    ("DIXON", "DICKSONX"),
    ("", ""),
    ("abc", ""),
    ("", "abc"),
    ("a", "a"),
    ("a", "b"),
    ("CA", "ABC"),          # unrestricted DL = 2, OSA = 3
    ("ab", "ba"),
    ("abcdef", "abXXXX"),   # jaro ≤ 0.7 → no Winkler boost
    ("abcdefgh", "abcdXXXX"),
    ("aabbcc", "abcabc"),
    ("xxyyzz", "zzxxyy"),   # block transpositions
    ("kitten", "sitting"),
    ("jellyfish", "smellyfish"),
    ("Supplier#000000012", "Supplier#000000021"),
    ("the quick brown fox", "the quack brown fax"),
    ("aaaaaaaaaa", "aaaaaaaaab"),
    ("abcd", "dcba"),
]


@pytest.mark.parametrize("a,b", CASES, ids=[f"{a}|{b}" for a, b in CASES])
def test_jaro_winkler_matches_duckdb(duck, a, b):
    from gemini_data_wrangler_spark.functions.strings import jaro, jaro_winkler

    dj, djw = duck.execute(
        "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)", [a, b, a, b]
    ).fetchone()
    assert jaro(a, b) == pytest.approx(dj, abs=1e-12)
    assert jaro_winkler(a, b) == pytest.approx(djw, abs=1e-12)


@pytest.mark.parametrize("a,b", CASES, ids=[f"{a}|{b}" for a, b in CASES])
def test_damerau_matches_duckdb(duck, a, b):
    from gemini_data_wrangler_spark.functions.strings import damerau_levenshtein

    expect = duck.execute("SELECT damerau_levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert damerau_levenshtein(a, b) == expect


def test_unrestricted_not_osa():
    from gemini_data_wrangler_spark.functions.strings import damerau_levenshtein

    # The discriminating case: OSA would answer 3.
    assert damerau_levenshtein("CA", "ABC") == 2


# ---------------------------------------------------------------------------
# numpy pair-axis batch kernels must be BIT-exact with the scalar oracles
# (the scalar implementations above are themselves pinned to DuckDB)
# ---------------------------------------------------------------------------
def test_jaro_winkler_batch_bit_exact_crafted():
    from gemini_data_wrangler_spark.functions.strings import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    a_list = [a for a, _ in CASES]
    b_list = [b for _, b in CASES]
    got = jaro_winkler_batch(a_list, b_list)
    for (a, b), g in zip(CASES, got):
        assert float(g) == jaro_winkler(a, b), (a, b)  # bit-exact, no approx


def test_damerau_batch_bit_exact_crafted():
    from gemini_data_wrangler_spark.functions.strings import (
        damerau_levenshtein,
        damerau_levenshtein_batch,
    )

    a_list = [a for a, _ in CASES]
    b_list = [b for _, b in CASES]
    got = damerau_levenshtein_batch(a_list, b_list)
    for (a, b), g in zip(CASES, got):
        assert int(g) == damerau_levenshtein(a, b), (a, b)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _pairs = st.lists(
        st.tuples(
            st.text(alphabet="abcdXY #", max_size=12),
            st.text(alphabet="abcdXY #", max_size=12),
        ),
        min_size=1,
        max_size=40,
    )

    @given(_pairs)
    @settings(max_examples=150, deadline=None)
    def test_jaro_winkler_batch_bit_exact_fuzz(pairs):
        from gemini_data_wrangler_spark.functions.strings import (
            jaro_winkler,
            jaro_winkler_batch,
        )

        got = jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
        for (a, b), g in zip(pairs, got):
            assert float(g) == jaro_winkler(a, b), (a, b)

    @given(_pairs)
    @settings(max_examples=150, deadline=None)
    def test_damerau_batch_bit_exact_fuzz(pairs):
        from gemini_data_wrangler_spark.functions.strings import (
            damerau_levenshtein,
            damerau_levenshtein_batch,
        )

        got = damerau_levenshtein_batch(
            [a for a, _ in pairs], [b for _, b in pairs]
        )
        for (a, b), g in zip(pairs, got):
            assert int(g) == damerau_levenshtein(a, b), (a, b)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
