"""Property tests for extension batch 49: Heaps growth, Fellegi–Sunter,
assortativity."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_vocab_growth_monotone_and_heaps_range(spark):
    rows = sorted(
        _q("text_vocab_growth")(spark, SF_ORACLE).collect(),
        key=lambda r: r["checkpoint"],
    )
    assert [r["checkpoint"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a["n_tokens"] < b["n_tokens"]
        assert a["vocab"] <= b["vocab"]
    b_exp = rows[0]["heaps_b"]
    assert all(r["heaps_b"] == b_exp for r in rows)
    # sublinear growth: 0 < b < 1 on any non-degenerate corpus
    assert 0.0 < b_exp < 1.0


def test_fellegi_sunter_weights_sane(spark):
    rows = {r["field"]: r for r in _q("er_fellegi_sunter_weights")(spark, SF_ORACLE).collect()}
    assert set(rows) == {"nation", "name_suffix3", "acctbal_kbin"}
    for r in rows.values():
        assert 0.0 < r["u_prob"] < 1.0
        # agreement on a rarer field carries more weight
        # recomputed from the ROUNDED u_prob -> approximate match only
        assert abs(r["agree_weight"] - math.log2(0.95 / r["u_prob"])) < 1e-3
        assert r["disagree_weight"] < 0
    # name suffix (1000 values) is rarer agreement than nation (25 values)
    assert rows["name_suffix3"]["u_prob"] < rows["nation"]["u_prob"]
    assert rows["name_suffix3"]["agree_weight"] > rows["nation"]["agree_weight"]


def test_assortativity_in_range_and_symmetric(spark):
    r = _q("graph_assortativity")(spark, SF_ORACLE).collect()[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_directed_edges"] % 2 == 0  # both directions counted
