"""Every declared query with an oracle must hash-match DuckDB at sf0.01 —
the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.parity import compare


def _cases():
    from gemini_data_wrangler_spark.queries import registry

    return [(name, b, o) for name, (b, o) in sorted(registry().items()) if o is not None]


@pytest.mark.parametrize("name,builder,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, name, builder, oracle):
    df = builder(spark, SF_ORACLE)
    diag = compare(df, duck, oracle)
    assert diag["ok"], f"{name}: {diag}"


def test_rows_only_queries_return_rows(spark):
    from gemini_data_wrangler_spark.queries import registry

    for name, (builder, oracle) in sorted(registry().items()):
        if oracle is None:
            df = builder(spark, SF_ORACLE)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"c_mktsegment", "total_sales", "order_count"}
