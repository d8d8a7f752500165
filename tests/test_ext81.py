"""Property tests for extension batch 81: k-center greedy invariants and
the DoReMi reweighting simplex."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_kcenter_greedy_invariants(spark):
    rows = sorted(
        _q("coreset_kcenter_seeds")(spark, SF_ORACLE).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, 9))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 8
    # greedy max-min distances are non-increasing after the seed
    ds = [r["dist_to_selected"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(ds, ds[1:])), ds
    assert rows[0]["dist_to_selected"] == 0.0


def test_doremi_weights_form_distribution(spark):
    rows = _q("corpus_doremi_reweight")(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < 1e-3, total
    assert min(r["excess"] for r in rows) == 0.0
    # higher excess loss must never get a lower weight
    by_excess = sorted(rows, key=lambda r: r["excess"])
    ws = [r["weight"] for r in by_excess]
    assert all(a <= b + 1e-9 for a, b in zip(ws, ws[1:]))
