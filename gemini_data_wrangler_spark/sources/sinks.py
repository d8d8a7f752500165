"""Sinks — columnar/text writers for result tables.

The reference exports only the stage-flow JSON and a PNG of the DAG
(ui/src/App.tsx:2043-2056, 2077+); it has **no** table export at all
(SURVEY.md §2.4). A Spark engine needs real sinks, so these are
first-class here:

* ``write_parquet`` — the scale path. Supports ``partition_by`` (hive-style
  directory partitioning → partition pruning for downstream readers) and
  ``max_records_per_file`` to bound file sizes at 100 TB.
* ``write_csv`` / ``write_json`` — interchange formats, header on by
  default to round-trip with the CSV LOAD path.
* ``write_flow_json`` — the reference's own export format (plans.graph).

All writers go through ``df.write`` (distributed, executor-side IO —
never a driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gemini_data_wrangler_spark.plans.graph import export_flow_json
from gemini_data_wrangler_spark.plans.stage import Stage


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_flow_json(stages: list[Stage], path: str) -> None:
    """Serialize a stage flow to the reference's export JSON format."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(export_flow_json(stages))


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) managed
    table. Two tables bucketed on the same key with the same bucket count
    join WITHOUT any exchange — the shuffle is paid once at write time and
    amortized over every subsequent join/aggregation on that key. This is
    the 100 TB answer for fact tables that are repeatedly joined on the
    same key (orders ⋈ lineitem on orderkey); the co-location is asserted
    in tests/test_graph_sinks.py (no Exchange in the joined plan)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
