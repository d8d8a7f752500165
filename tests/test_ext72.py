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
