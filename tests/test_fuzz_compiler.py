"""Property-based fuzzing of the core stage algebra: random FILTER chains
and GROUP stages, executed by the engine (Spark) AND by DuckDB from the
same compiled SQL — any divergence in quoting, precedence, or aggregate
semantics fails. This mirrors how the reference's surface is actually
exercised: arbitrary LLM-generated stage JSON, not hand-picked fixtures
(SURVEY.md §5 test strategy).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gemini_data_wrangler_spark.operators.compiler import filter_predicate_sql
from gemini_data_wrangler_spark.plans.stage import Stage

# Exact-in-binary doubles (k * 0.25) so SUM/AVG agree bit-for-bit.
_ROWS = [
    (
        i,
        (i % 37) * 0.25,
        i % 11,
        ["new", "open", "closed", "it's odd", "done"][i % 5],
        ["a#1", "o'brien", "x%y_z", "plain", ""][i % 5] + str(i % 7),
    )
    for i in range(200)
]
_COLS = ["id", "amount", "qty", "status", "name"]


@pytest.fixture(scope="module")
def fuzz_tables(spark):
    pdf = pd.DataFrame(_ROWS, columns=_COLS)
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


_NUM_OPS = ["=", "!=", ">", "<", ">=", "<="]
_STR_OPS = ["=", "!=", "LIKE", "IN", "NOT IN"]
_STR_VALUES = ["new", "open", "it's odd", "o'brien", "%e%", "n_w", "", "x%y_z3"]


def _condition() -> st.SearchStrategy:
    numeric = st.tuples(
        st.sampled_from(["amount", "qty", "id"]),
        st.sampled_from(_NUM_OPS),
        st.one_of(st.integers(0, 40), st.sampled_from([0.25, 1.5, 2.75, 9.0])),
    )
    stringy = st.tuples(
        st.sampled_from(["status", "name"]),
        st.sampled_from(_STR_OPS),
        st.sampled_from(_STR_VALUES),
    )
    return st.one_of(numeric, stringy)


@st.composite
def _filter_stage(draw) -> Stage:
    conds = draw(st.lists(_condition(), min_size=1, max_size=4))
    data_conds = []
    for i, (col, op, val) in enumerate(conds):
        c = {"column": col, "operator": op, "value": val}
        if i > 0:
            c["logic"] = draw(st.sampled_from(["AND", "OR"]))
        data_conds.append(c)
    return Stage(type="FILTER", id="stage_0", data={"table": "t", "conditions": data_conds})


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stage=_filter_stage())
def test_fuzz_filter_matches_duckdb(fuzz_tables, stage):
    sdf, con = fuzz_tables
    predicate = filter_predicate_sql(stage)
    spark_rows = sorted(tuple(r) for r in sdf.filter(predicate).collect())
    duck_rows = sorted(
        tuple(r) for r in con.execute(f"SELECT * FROM t WHERE {predicate}").fetchall()
    )
    assert spark_rows == duck_rows, predicate


_AGG_FNS = ["SUM", "COUNT", "AVG", "MAX", "MIN"]


@st.composite
def _group_spec(draw):
    keys = draw(
        st.lists(st.sampled_from(["status", "qty"]), min_size=1, max_size=2, unique=True)
    )
    aggs = draw(
        st.lists(
            st.tuples(st.sampled_from(_AGG_FNS), st.sampled_from(["amount", "id", "*"])),
            min_size=1,
            max_size=3,
        )
    )
    # '*' only valid for COUNT.
    aggs = [(fn, ("*" if (col == "*" and fn == "COUNT") else ("amount" if col == "*" else col))) for fn, col in aggs]
    return keys, aggs


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=_group_spec())
def test_fuzz_group_matches_duckdb(fuzz_tables, spec):
    sdf, con = fuzz_tables
    keys, aggs = spec
    select_aggs = [f"{fn}({col}) AS a{i}" for i, (fn, col) in enumerate(aggs)]
    sql = f"SELECT {', '.join(keys + select_aggs)} FROM t GROUP BY {', '.join(keys)}"

    gexprs = [F.expr(f"{fn}({col})").alias(f"a{i}") for i, (fn, col) in enumerate(aggs)]
    spark_df = sdf.groupBy(*keys).agg(*gexprs)
    # AVG of ints: Spark emits double, DuckDB double too; COUNT bigint both.
    spark_rows = sorted(
        tuple(float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v for v in r)
        for r in spark_df.collect()
    )
    duck_rows = sorted(
        tuple(float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v for v in r)
        for r in con.execute(sql).fetchall()
    )
    assert spark_rows == duck_rows, sql
