"""Source-layer tests: CSV 3-tier ingest semantics, inline-row tables,
parquet ns-timestamp normalization."""

from __future__ import annotations

import os

import pytest

from gemini_data_wrangler_spark.sources.readers import (
    dataframe_from_rows,
    load_sf_tables,
    read_csv,
)
from tests.conftest import SF_ORACLE

CSV_CONTENT = """id,name,amount,joined
1,Ann,10.5,2023-01-01
2,"O'Brien, Bo",20.0,2023-02-03
3,Cy,,2023-03-05
"""


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "people.csv"
    p.write_text(CSV_CONTENT)
    return str(p)


def test_csv_infer_schema(spark, csv_path):
    df = read_csv(spark, csv_path)
    types = dict(df.dtypes)
    assert types["id"] == "int"
    assert types["amount"] == "double"
    assert types["joined"] == "date"
    # quoted field with comma survives
    assert df.filter("id = 2").collect()[0]["name"] == "O'Brien, Bo"
    # empty numeric → NULL
    assert df.filter("id = 3").collect()[0]["amount"] is None


def test_csv_all_varchar_fallback(spark, csv_path):
    df = read_csv(spark, csv_path, infer_schema=False)
    assert all(t == "string" for _, t in df.dtypes)


def test_dataframe_from_rows_typed(spark):
    df = dataframe_from_rows(
        spark,
        [{"name": "id", "type": "INTEGER"}, {"name": "label", "type": "VARCHAR"}, {"name": "price", "type": "DOUBLE"}],
        [[1, "a", 1.5], [2, "b", 2.5]],
    )
    assert dict(df.dtypes) == {"id": "int", "label": "string", "price": "double"}
    assert df.count() == 2


def test_dataframe_from_rows_default_varchar(spark):
    df = dataframe_from_rows(spark, ["a", "b"], [["1", "x"]])
    assert all(t == "string" for _, t in df.dtypes)


def test_load_sf_tables_registers_views(spark):
    tables = load_sf_tables(spark, SF_ORACLE)
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert spark.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25


def test_ns_timestamp_normalized_to_timestamp_ntz(spark):
    events = load_sf_tables(spark, SF_ORACLE)["events"]
    assert dict(events.dtypes)["ts"] == "timestamp_ntz"
    # microsecond precision survives the ns→µs integer conversion
    row = events.orderBy("event_id").limit(1).collect()[0]
    assert row.ts.microsecond != 0


def test_jsonl_roundtrip_explicit_schema(spark, tmp_path):
    from gemini_data_wrangler_spark.sources.readers import read_jsonl
    from gemini_data_wrangler_spark.sources.sinks import write_json

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id bigint, name string, score double"
    )
    path = str(tmp_path / "jl")
    write_json(df, path)
    # Explicit schema: no inference pass, stable types (incl. the all-null
    # score column, which inference would type as string-or-drop).
    back = read_jsonl(spark, path, schema="id bigint, name string, score double")
    assert back.schema == df.schema
    assert {tuple(r) for r in back.collect()} == {(1, "a", 1.5), (2, "b", None)}


def test_jsonl_inferred(spark, tmp_path):
    from gemini_data_wrangler_spark.sources.readers import read_jsonl

    p = tmp_path / "rows.jsonl"
    p.write_text('{"k": 1, "v": "x"}\n{"k": 2, "v": "y"}\n')
    back = read_jsonl(spark, str(p))
    assert {tuple(r) for r in back.select("k", "v").collect()} == {(1, "x"), (2, "y")}


def test_orc_roundtrip_with_partitioning(spark, tmp_path):
    from gemini_data_wrangler_spark.sources.readers import read_orc
    from gemini_data_wrangler_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)], "id bigint, g string, v double"
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, partition_by=["g"])
    back = read_orc(spark, path)
    assert back.count() == 30
    # Partition-column filter prunes directories, same contract as parquet.
    from pyspark.sql import functions as F

    scan = back.filter(F.col("g") == "g1")
    assert scan.count() == 10
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "g1" in plan


def test_text_source_line_and_wholefile(spark, tmp_path):
    from gemini_data_wrangler_spark.sources.readers import read_text

    (tmp_path / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "b.txt").write_text("only line\n")
    lines = read_text(spark, str(tmp_path))
    assert lines.columns == ["value"]
    assert sorted(r.value for r in lines.collect()) == [
        "line one", "line two", "only line",
    ]
    whole = read_text(spark, str(tmp_path), whole_file=True)
    vals = sorted(r.value for r in whole.collect())
    assert vals == ["line one\nline two\n", "only line\n"]


def test_xml_roundtrip(spark, tmp_path):
    from gemini_data_wrangler_spark.sources.readers import read_xml
    from gemini_data_wrangler_spark.sources.sinks import write_xml

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta <&> chars", -2.0), (3, None, 0.0)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path / "xml")
    write_xml(df, path, row_tag="doc", root_tag="docs")
    back = read_xml(spark, path, row_tag="doc", schema="id bigint, name string, score double")
    got = {(r.id, r.name, r.score) for r in back.collect()}
    assert got == {(1, "alpha", 1.5), (2, "beta <&> chars", -2.0), (3, None, 0.0)}
