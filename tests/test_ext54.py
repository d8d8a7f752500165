"""Property tests for extension batch 54: partition advisor, Markov
accuracy."""

from __future__ import annotations

import os

from tests.conftest import SF_ORACLE


def _q(name):
    from gemini_data_wrangler_spark.queries import registry

    return registry()[name][0]


def test_partition_advisor_matches_files(spark):
    rows = {r["table_name"]: r for r in _q("layout_partition_advisor")(spark, SF_ORACLE).collect()}
    assert len(rows) == 10
    for t, r in rows.items():
        path = os.path.join(SF_ORACLE, f"{t}.parquet")
        # compressed bytes bounded by the physical file (footer overhead
        # means strictly smaller)
        assert 0 < r["compressed_bytes"] < os.path.getsize(path)
        assert r["n_row_groups"] >= 1
        assert r["recommended_scan_tasks"] >= 1
        # sf0.01 files are all far below 128 MB: one task each
        assert r["recommended_scan_tasks"] == 1


def test_markov_accuracy_bounds_and_split(spark):
    r = _q("events_markov_accuracy")(spark, SF_ORACLE).collect()[0]
    assert r["n_test"] > 0
    assert 0.0 <= r["markov_accuracy"] <= 1.0
    assert 0.0 <= r["baseline_accuracy"] <= 1.0
    # uniform synthetic event types: both hover near 1/|types| = 0.2
    assert 0.05 < r["baseline_accuracy"] < 0.5
