"""Property tests for extension batch 51: scalar function banks."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_regex_bank_values(spark):
    rows = _q("scalar_regex_functions")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # priority is 'N-WORD': extraction must decompose it exactly
        assert f"{r['prio_num']}-{r['prio_word']}".startswith(r["prio_num"])
        # replace swaps only the matched span; any unmatched suffix
        # ('4-NOT SPECIFIED' -> 'NOT_4 SPECIFIED') survives untouched
        assert r["swapped"].startswith(f"{r['prio_word']}_{r['prio_num']}")
        assert r["is_top3"] == (r["prio_num"] in {"1", "2", "3"})
        assert r["n_digits"] == len(str(r["o_orderkey"]))
        # low_digits is '|'-joined (scalar-only output contract)
        assert all(
            d in "01234567" for d in r["low_digits"].split("|") if d
        )


def test_higher_order_bank_values(spark):
    rows = _q("scalar_higher_order_functions")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        nk = r["n_nationkey"]
        # array outputs are '|'-joined (scalar-only output contract)
        assert r["multiples"] == f"{nk}|{2 * nk}|{3 * nk}"
        repeated = r["repeated"].split("|")
        assert len(repeated) == 3 and len(set(repeated)) == 1
        assert len(r["flat"].split("|")) == 3
        assert r["all_nonneg"] is True
        # zipped sums are symmetric: both entries equal nk + rk
        zipped = r["zipped_sums"].split("|")
        assert zipped[0] == zipped[1]


def test_json_bank_values(spark):
    rows = _q("scalar_json_functions")(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["k_val"] == r["event_id"] % 100
        assert r["absent"] is None
        assert r["n_tags"] == 2
        assert 0 <= r["nested_v"] <= 9
        assert isinstance(r["first_tag"], str) and r["first_tag"]
