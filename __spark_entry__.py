"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``gemini_data_wrangler_spark`` package; this
file is the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's golden pipeline (ui/src/sampleStages.json — orders ⋈
    customers) re-targeted to driver testdata: JOIN → GROUP → SORT through
    the stage-IR pipeline runner.
    """
    from gemini_data_wrangler_spark.queries import registry

    builder, _ = registry()["flagship_segment_sales"]
    return builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gemini_data_wrangler_spark.queries import registry

    return {name: builder for name, (builder, _oracle) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted ⇒ rows-only check)."""
    from gemini_data_wrangler_spark.queries import registry

    return {name: oracle for name, (_builder, oracle) in registry().items() if oracle is not None}
