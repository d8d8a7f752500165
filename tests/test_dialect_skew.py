"""Tests for the DuckDB→Spark dialect shim, salted skew-join, and by-name
union extension."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.operators.compiler import compile_stage
from gemini_data_wrangler_spark.operators.skew import salted_join
from gemini_data_wrangler_spark.plans.dialect import duckdb_to_spark_sql
from gemini_data_wrangler_spark.plans.stage import Stage


def test_exclude_rewrites_to_except():
    assert (
        duckdb_to_spark_sql("SELECT l.*, r.* EXCLUDE (k) FROM l JOIN r USING (k)")
        == "SELECT l.*, r.* EXCEPT (k) FROM l JOIN r USING (k)"
    )
    # case-insensitive, whitespace-tolerant
    assert "EXCEPT (a, b)" in duckdb_to_spark_sql("SELECT *  exclude (a, b) FROM t")


def test_read_functions_rewrite():
    assert duckdb_to_spark_sql("SELECT * FROM read_parquet('/x/y.parquet')") == (
        "SELECT * FROM parquet.`/x/y.parquet`"
    )
    out = duckdb_to_spark_sql("SELECT * FROM read_csv_auto('/d/f.csv', header=true, auto_detect=true)")
    assert out == "SELECT * FROM csv.`/d/f.csv`"


def test_positional_join_raises():
    with pytest.raises(ValueError, match="POSITIONAL"):
        duckdb_to_spark_sql("SELECT * FROM a POSITIONAL JOIN b")


def test_custom_stage_runs_duckdb_exclude_sql(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "k int, s string, v double")
    df.createOrReplaceTempView("dialect_t")
    stage = Stage(type="CUSTOM", data={"sql": "SELECT * EXCLUDE (s) FROM dialect_t"})
    out = compile_stage(stage, lambda n: df, spark=spark)
    assert out.columns == ["k", "v"]


def test_custom_stage_reads_parquet_function(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1,), (2,)], "id long").write.parquet(p)
    stage = Stage(type="CUSTOM", data={"sql": f"SELECT * FROM read_parquet('{p}') WHERE id > 1"})
    out = compile_stage(stage, lambda n: None, spark=spark)
    assert [r.id for r in out.collect()] == [2]


def test_salted_join_equals_plain_join(spark):
    # skewed: 80% of left rows share key 1
    left = spark.createDataFrame(
        [(1, i) for i in range(80)] + [(k, 100 + k) for k in range(2, 22)], "k int, lv int"
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(0, 22)], "k int, rv string")
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", "k", salt=4).collect()}
    assert salted == plain

    # left join keeps unmatched probe rows
    right_small = right.filter(F.col("k") <= 5)
    plain_l = {(r.k, r.lv, r.rv) for r in left.join(right_small, "k", "left").collect()}
    salted_l = {
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right_small, "k", "k", salt=4, how="left").collect()
    }
    assert salted_l == plain_l


def test_union_by_name_extension(spark):
    a = spark.createDataFrame([(1, "x")], "id int, s string")
    b = spark.createDataFrame([("y", 2)], "s string, id int")  # reordered columns
    tables = {"a": a, "b": b}
    stage = Stage(type="UNION", data={"unionType": "UNION ALL", "tables": ["a", "b"], "byName": True})
    out = compile_stage(stage, lambda n: tables[n])
    assert {(r.id, r.s) for r in out.collect()} == {(1, "x"), (2, "y")}
