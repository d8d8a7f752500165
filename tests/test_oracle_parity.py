"""Every declared query with an oracle must hash-match DuckDB at sf0.01 —
the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_SMALL
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


def test_all_outputs_driver_canonicalizable(spark):
    """The grading driver canonicalizes results with pandas ``sort_values``,
    which raises ``unhashable type: 'list'`` on any array/map/struct cell
    (``embedding_kmeans`` ERR'd CORRECTNESS_r03 exactly this way).  Every
    registry query must therefore emit scalar-only columns — plan-build
    only, no execution, so this covers all 424 queries in seconds."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from gemini_data_wrangler_spark.queries import registry

    offenders = []
    for name, (builder, _oracle) in sorted(registry().items()):
        df = builder(spark, SF_SMALL)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"non-scalar output columns: {offenders}"
