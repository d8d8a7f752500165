"""Property tests for extension batch 77: audio zero-crossings against the
synthesis schedule, RAKE against a pure-Python implementation."""

from __future__ import annotations

import collections

from tests.conftest import SF_ORACLE

STOP = {"the", "a", "of", "and", "to", "in", "be", "with"}


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_zero_crossings_match_schedule(spark):
    rows = _q("multimodal_audio_zero_crossings")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows[:50]:
        n = 50 + r["asset_id"] % 50
        s = [(i * 1103) % 2001 - 1000 for i in range(n)]
        zc = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
        assert r["n_samples"] == n
        assert r["zero_crossings"] == zc
        # sawtooth flips sign roughly half the time — sanity floor
        assert zc > n // 4


def _python_rake(texts):
    phrases = []
    for t in texts:
        cur = []
        for w in t.strip().lower().split():
            if w in STOP:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    freq = collections.Counter()
    degree = collections.Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    by_phrase = {}
    occ = collections.Counter(phrases)
    for p, n in occ.items():
        score = round(sum(degree[w] / freq[w] for w in p), 4)
        by_phrase[" ".join(p)] = (score, n)
    top = sorted(by_phrase.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    return {k: v for k, v in top}


def test_rake_matches_python(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    texts = [
        r["text"] for r in load_sf_tables(spark, SF_ORACLE)["documents"].collect()
    ]
    expect = _python_rake(texts)
    got = {
        r["phrase"]: (r["score"], r["n_occ"])
        for r in _q("text_rake_keywords")(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(expect)
    for k, (score, n) in expect.items():
        assert got[k][1] == n
        assert abs(got[k][0] - score) < 2e-4  # 4-dp rounding of FP sums
