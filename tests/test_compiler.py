"""Compiler semantics unit tests on tiny in-memory tables — the cases the
sf0.01 oracle queries can't isolate (quote escaping, scalar IN, NULL keys,
both join key paths on outer joins, positional union)."""

from __future__ import annotations

import pytest

from gemini_data_wrangler_spark.operators.compiler import compile_stage, filter_predicate_sql, sql_literal
from gemini_data_wrangler_spark.plans.stage import Stage


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k int, lval string"
    )
    right = spark.createDataFrame(
        [(2, "x"), (3, "y"), (4, "z")], "k int, rval string"
    )
    right2 = spark.createDataFrame(
        [(2, "x"), (3, "y"), (4, "z")], "rk int, rval string"
    )
    strings = spark.createDataFrame(
        [(1, "o'brien"), (2, "plain"), (3, "50%")], "id int, s string"
    )
    return {"left": left, "right": right, "right2": right2, "strings": strings}


def _resolve(tables):
    return lambda name: tables[name]


def _join(tables, how, lk="k", rk="k", right="right"):
    stage = Stage(
        type="JOIN",
        data={"joinType": how, "leftTable": "left", "rightTable": right, "leftKey": lk, "rightKey": rk},
    )
    return compile_stage(stage, _resolve(tables))


class TestJoin:
    def test_inner_same_key_single_column(self, tables):
        df = _join(tables, "INNER")
        assert df.columns == ["k", "lval", "rval"]
        assert sorted(r.k for r in df.collect()) == [2, 3]

    def test_full_outer_same_key_keeps_left_key_nulls(self, tables):
        # DuckDB `l.*, r.* EXCLUDE(k) USING(k)` semantics: right-only rows
        # carry NULL key (no coalesce).
        df = _join(tables, "FULL OUTER")
        rows = {(r.k, r.lval, r.rval) for r in df.collect()}
        assert (None, None, "z") in rows  # right-only row: k is NULL
        assert (1, "a", None) in rows

    def test_right_same_key_keeps_left_key_nulls(self, tables):
        df = _join(tables, "RIGHT")
        rows = {(r.k, r.lval, r.rval) for r in df.collect()}
        assert (None, None, "z") in rows

    def test_diff_keys_keeps_both_columns(self, tables):
        df = _join(tables, "LEFT", lk="k", rk="rk", right="right2")
        assert df.columns == ["k", "lval", "rk", "rval"]

    def test_default_join_type_inner(self, tables):
        stage = Stage(type="JOIN", data={"leftTable": "left", "rightTable": "right", "leftKey": "k", "rightKey": "k"})
        assert compile_stage(stage, _resolve(tables)).count() == 2

    def test_missing_key_raises(self, tables):
        stage = Stage(type="JOIN", data={"leftTable": "left", "rightTable": "right", "leftKey": "k"})
        with pytest.raises(ValueError, match="JOIN stage requires"):
            compile_stage(stage, _resolve(tables))


class TestFilterCompile:
    def test_sql_literal_escaping(self):
        assert sql_literal("o'brien") == "'o''brien'"
        assert sql_literal(5) == "5"
        assert sql_literal(0.5) == "0.5"
        assert sql_literal(True) == "TRUE"
        assert sql_literal(None) == "NULL"
        assert sql_literal([1, 2]) == "(1, 2)"

    def test_predicate_precedence_no_parens(self):
        stage = Stage(
            type="FILTER",
            data={
                "table": "t",
                "conditions": [
                    {"column": "a", "operator": "=", "value": 1},
                    {"column": "b", "operator": "=", "value": 2, "logic": "OR"},
                    {"column": "c", "operator": ">", "value": 3, "logic": "AND"},
                ],
            },
        )
        assert filter_predicate_sql(stage) == "a = 1 OR b = 2 AND c > 3"

    def test_scalar_in_becomes_single_element_tuple(self):
        stage = Stage(type="FILTER", data={"table": "t", "column": "c", "operator": "IN", "value": "x"})
        assert filter_predicate_sql(stage) == "c IN ('x')"

    def test_quote_escaped_filter_executes(self, tables):
        stage = Stage(type="FILTER", data={"table": "strings", "column": "s", "operator": "=", "value": "o'brien"})
        df = compile_stage(stage, _resolve(tables))
        assert [r.id for r in df.collect()] == [1]

    def test_like_percent_literal_in_data(self, tables):
        stage = Stage(type="FILTER", data={"table": "strings", "column": "s", "operator": "LIKE", "value": "%\\%%"})
        df = compile_stage(stage, _resolve(tables))
        assert [r.id for r in df.collect()] == [3]


class TestUnion:
    def test_union_is_positional_not_by_name(self, spark):
        a = spark.createDataFrame([(1, 10)], "c1 int, c2 int")
        b = spark.createDataFrame([(20, 2)], "c2 int, c1 int")
        stage = Stage(type="UNION", data={"unionType": "UNION ALL", "tables": ["a", "b"]})
        df = compile_stage(stage, lambda n: {"a": a, "b": b}[n])
        rows = {tuple(r) for r in df.collect()}
        # positional like SELECT * UNION SELECT *: b's (20, 2) lands under
        # (c1, c2) by position, NOT matched by name to (2, 20).
        assert df.columns == ["c1", "c2"]
        assert rows == {(1, 10), (20, 2)}

    def test_union_distinct_dedups(self, spark):
        a = spark.createDataFrame([(1,), (2,)], "c int")
        stage = Stage(type="UNION", data={"tables": ["a", "a"]})
        df = compile_stage(stage, lambda n: a)
        assert df.count() == 2

    def test_union_requires_two_tables(self, spark):
        stage = Stage(type="UNION", data={"tables": ["a"]})
        with pytest.raises(ValueError, match="at least 2"):
            compile_stage(stage, lambda n: None)


class TestGroupSelectSortAggregate:
    def test_group_select_list_order(self, tables):
        stage = Stage(
            type="GROUP",
            data={
                "table": "right",
                "groupBy": ["rval"],
                "aggregations": [{"function": "COUNT", "column": "*", "alias": "n"}],
            },
        )
        df = compile_stage(stage, _resolve(tables))
        assert df.columns == ["rval", "n"]

    def test_aggregate_default_output_name(self, tables):
        stage = Stage(type="AGGREGATE", data={"table": "right", "aggregations": [{"function": "MAX", "column": "k"}]})
        df = compile_stage(stage, _resolve(tables))
        assert df.columns == ["max(k)"]  # no alias → SQL default name, like DuckDB

    def test_select_expression_passthrough(self, tables):
        stage = Stage(type="SELECT", data={"table": "right", "columns": ["k", "upper(rval) AS u"]})
        df = compile_stage(stage, _resolve(tables))
        assert df.columns == ["k", "u"]
        assert {r.u for r in df.collect()} == {"X", "Y", "Z"}

    def test_sort_directions(self, tables):
        stage = Stage(type="SORT", data={"table": "right", "orderBy": [{"column": "k", "direction": "DESC"}]})
        df = compile_stage(stage, _resolve(tables))
        assert [r.k for r in df.collect()] == [4, 3, 2]


class TestExtensions:
    def test_limit_stage(self, tables):
        stage = Stage(type="LIMIT", data={"table": "right", "n": 2})
        assert compile_stage(stage, _resolve(tables)).count() == 2

    def test_distinct_stage(self, spark):
        a = spark.createDataFrame([(1,), (1,), (2,)], "c int")
        stage = Stage(type="DISTINCT", data={"table": "a"})
        assert compile_stage(stage, lambda n: a).count() == 2

    def test_unknown_type_raises(self, tables):
        with pytest.raises(ValueError, match="Unsupported stage type"):
            compile_stage(Stage(type="NOPE", data={}), _resolve(tables))
