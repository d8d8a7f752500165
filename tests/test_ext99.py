"""Property tests for extension batch 99: Lorenz convexity, near-dup
report consistency."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_lorenz_convex_and_normalized(spark):
    rows = sorted(
        _q("agg_lorenz_curve")(spark, SF_ORACLE).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["decile_share"] for r in rows]
    # deciles ordered by balance => per-decile share non-decreasing (convex Lorenz)
    assert all(a <= b + 1e-6 for a, b in zip(shares, shares[1:])), shares
    assert abs(sum(shares) - 1.0) < 1e-3
    cum = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cum, cum[1:]))
    assert abs(cum[-1] - 1.0) < 1e-5
    # Lorenz curve lies under the diagonal
    for i, c in enumerate(cum, start=1):
        assert c <= i / 10 + 1e-6


def test_neardup_report_consistent(spark):
    from gemini_data_wrangler_spark.operators.dedup import minhash_lsh_pairs
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("corpus_neardup_by_source")(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    docs = load_sf_tables(spark, SF_ORACLE)["documents"]
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=5, threshold=0.8).collect()
    members = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    total_flagged = sum(r["n_neardup"] for r in rows)
    assert total_flagged == len(members)
    for r in rows:
        assert 0 <= r["neardup_rate"] <= 1
        assert r["n_neardup"] <= r["n_docs"]
