"""Property-based fuzzing of the core stage algebra: random FILTER chains,
GROUP stages, JOIN stages (dup/NULL keys x 6 join types x same/diff key
naming), and WINDOW stages (function mix x frame specs), executed by the
engine (Spark) AND by DuckDB from equivalent SQL — any divergence in quoting, precedence, or aggregate
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


# ---------------------------------------------------------------------------
# JOIN stage fuzz: random table contents (dup + NULL keys) × join type ×
# same-key/diff-key naming, engine vs DuckDB from equivalent SQL.
# ---------------------------------------------------------------------------
_KEYS = ["a", "b", "c", "d", None]
_JOIN_TYPES = ["INNER", "LEFT", "RIGHT", "FULL OUTER", "LEFT SEMI", "LEFT ANTI"]


def _sortkey(rows):
    return sorted(rows, key=repr)


@st.composite
def _join_case(draw):
    lrows = draw(
        st.lists(st.sampled_from(_KEYS), min_size=0, max_size=20).map(
            lambda ks: [(i, k, i * 0.25) for i, k in enumerate(ks)]
        )
    )
    rrows = draw(
        st.lists(st.sampled_from(_KEYS), min_size=0, max_size=20).map(
            lambda ks: [(100 + i, k, i * 0.5) for i, k in enumerate(ks)]
        )
    )
    jt = draw(st.sampled_from(_JOIN_TYPES))
    same_key = draw(st.booleans())
    return lrows, rrows, jt, same_key


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=_join_case())
def test_fuzz_join_matches_duckdb(spark, case):
    from gemini_data_wrangler_spark.operators.compiler import compile_stage

    lrows, rrows, jt, same_key = case
    rk = "k" if same_key else "rk"
    ldf = spark.createDataFrame(lrows, "lid bigint, k string, v double")
    rdf = spark.createDataFrame(rrows, f"rid bigint, {rk} string, w double")
    stage = Stage(
        type="JOIN",
        id="stage_0",
        data={
            "leftTable": "l",
            "rightTable": "r",
            "leftKey": "k",
            "rightKey": rk,
            "joinType": jt,
        },
    )
    out = compile_stage(stage, {"l": ldf, "r": rdf}.__getitem__)

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["lid", "k", "v"]))
    con.register("r", pd.DataFrame(rrows, columns=["rid", rk, "w"]))
    if jt in ("LEFT SEMI", "LEFT ANTI"):
        neg = "NOT " if jt == "LEFT ANTI" else ""
        sql = f"SELECT l.lid, l.k, l.v FROM l WHERE {neg}EXISTS (SELECT 1 FROM r WHERE r.{rk} = l.k)"
        cols = ["lid", "k", "v"]
    else:
        duck_jt = {"INNER": "JOIN", "LEFT": "LEFT JOIN", "RIGHT": "RIGHT JOIN", "FULL OUTER": "FULL JOIN"}[jt]
        rcols = f"r.rid, r.w" if same_key else f"r.rid, r.rk, r.w"
        sql = f"SELECT l.lid, l.k, l.v, {rcols} FROM l {duck_jt} r ON l.k = r.{rk}"
        cols = ["lid", "k", "v", "rid", "w"] if same_key else ["lid", "k", "v", "rid", "rk", "w"]
    spark_rows = _sortkey(tuple(r) for r in out.select(*cols).collect())
    duck_rows = _sortkey(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == duck_rows, (jt, same_key, sql)


# ---------------------------------------------------------------------------
# WINDOW stage fuzz: function mix × frame specs, engine vs DuckDB.
# (g, i) is unique, so every ordering/frame is deterministic.
# ---------------------------------------------------------------------------
_WIN_AGGS = ["SUM", "AVG", "MIN", "MAX", "COUNT"]


@st.composite
def _window_case(draw):
    n = draw(st.integers(2, 40))
    fns = []
    for j in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(["rank", "offset", "agg"]))
        if kind == "rank":
            fns.append({"function": draw(st.sampled_from(["ROW_NUMBER", "RANK", "DENSE_RANK"])), "alias": f"f{j}"})
        elif kind == "offset":
            fns.append(
                {
                    "function": draw(st.sampled_from(["LAG", "LEAD"])),
                    "column": "x",
                    "offset": draw(st.integers(1, 3)),
                    "alias": f"f{j}",
                }
            )
        else:
            frame = draw(
                st.sampled_from(
                    [
                        None,
                        "rows_unbounded",
                        {"mode": "rows", "preceding": draw(st.integers(0, 4))},
                        {"mode": "rows", "preceding": draw(st.integers(0, 4)), "following": draw(st.integers(0, 4))},
                    ]
                )
            )
            f = {"function": draw(st.sampled_from(_WIN_AGGS)), "column": "x", "alias": f"f{j}"}
            if frame is not None:
                f["frame"] = frame
            fns.append(f)
    return n, fns


def _duck_frame(fn: dict) -> str:
    frame = fn.get("frame")
    if frame == "rows_unbounded":
        return " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    if isinstance(frame, dict):
        end = f"{frame['following']} FOLLOWING" if "following" in frame else "CURRENT ROW"
        return f" ROWS BETWEEN {frame['preceding']} PRECEDING AND {end}"
    return ""


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=_window_case())
def test_fuzz_window_matches_duckdb(spark, case):
    from gemini_data_wrangler_spark.operators.window import compile_window_stage

    n, fns = case
    rows = [(i, "g" + str(i % 3), (i % 7) * 0.25) for i in range(n)]
    df = spark.createDataFrame(rows, "i bigint, g string, x double")
    stage = Stage(
        type="WINDOW",
        id="stage_0",
        data={
            "partitionBy": ["g"],
            "orderBy": [{"column": "i", "direction": "ASC"}],
            "functions": fns,
        },
    )
    out = compile_window_stage(stage, df)

    exprs = []
    for fn in fns:
        name, alias = fn["function"], fn["alias"]
        if name in ("ROW_NUMBER", "RANK", "DENSE_RANK"):
            call = f"{name.lower()}()"
        elif name in ("LAG", "LEAD"):
            call = f"{name.lower()}(x, {fn['offset']})"
        else:
            call = f"{name.lower()}(x)"
        exprs.append(f"{call} OVER (PARTITION BY g ORDER BY i{_duck_frame(fn)}) AS {alias}")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["i", "g", "x"]))
    sql = f"SELECT i, g, x, {', '.join(exprs)} FROM t"
    cols = ["i", "g", "x"] + [fn["alias"] for fn in fns]
    spark_rows = _sortkey(tuple(r) for r in out.select(*cols).collect())
    duck_rows = _sortkey(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == duck_rows, sql
