"""Property tests for extension batch 32: integrity on a corrupted
child table, freshness flags, outlier screen soundness."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_referential_integrity_clean_corpus(spark):
    rows = {r["relationship"]: r for r in _q("dq_referential_integrity")(spark, SF_ORACLE).collect()}
    assert set(rows) == {
        "orders->customer",
        "lineitem->orders",
        "customer->nation",
        "lineitem->part",
    }
    for r in rows.values():
        assert r["n_orphans"] == 0
        assert r["n_child"] > 0


def test_referential_integrity_detects_orphans(spark, tmp_path):
    """Drop half the customers from a copied sf dir: the orders->customer
    edge must report exactly the orders pointing at dropped customers."""
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    src = load_sf_tables(spark, SF_ORACLE)
    # Write the tables we keep unchanged, and a truncated customer table.
    for name in ("orders", "lineitem", "nation", "part"):
        src[name].write.parquet(str(tmp_path / f"{name}.parquet"))
    kept = src["customer"].filter(F.col("c_custkey") % 2 == 0)
    kept.write.parquet(str(tmp_path / "customer.parquet"))
    rows = {
        r["relationship"]: r
        for r in _q("dq_referential_integrity")(spark, str(tmp_path)).collect()
    }
    expected = src["orders"].filter(F.col("o_custkey") % 2 == 1).count()
    assert rows["orders->customer"]["n_orphans"] == expected > 0
    assert rows["lineitem->orders"]["n_orphans"] == 0


def test_freshness_anchor_is_zero_lag(spark):
    rows = {r["source"]: r for r in _q("dq_freshness_lag")(spark, SF_ORACLE).collect()}
    assert set(rows) == {"orders", "events"}
    lags = [r["lag_days"] for r in rows.values()]
    assert min(lags) == 0  # the freshest source anchors the comparison
    for r in rows.values():
        assert r["lag_days"] >= 0
        assert r["within_sla"] == (r["lag_days"] <= 7)


def test_centroid_outliers_are_rare_and_extreme(spark):
    rows = _q("embedding_centroid_outliers")(spark, SF_ORACLE).collect()
    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    n = load_sf_tables(spark, SF_ORACLE)["embeddings"].count()
    # 2.5σ screen: a small tail, never a large fraction.
    assert 0 < len(rows) < 0.1 * n
    assert all(r["z"] > 2.5 for r in rows)
