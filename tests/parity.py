"""Local mimic of the driver's Spark-vs-DuckDB comparison.

Compares row count, column-name set, and an order-insensitive value
multiset (values normalized to strings, columns sorted by name) — the same
shape of check as CORRECTNESS_r{N}.json, so passing here is a strong
predictor of passing the driver's gate.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr gives shortest round-trip string; binary-equal doubles match.
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _rows_multiset(columns: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i].lower())
    return Counter(tuple(_norm_value(row[i]) for i in order) for row in rows)


def compare(spark_df, duck_con, oracle_sql: str) -> dict:
    """Return a diagnostics dict; ``ok`` True when everything matches."""
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    duck_res = duck_con.execute(oracle_sql)
    duck_cols = [d[0].lower() for d in duck_res.description]
    duck_rows = duck_res.fetchall()

    out = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "rowcount_ok": len(spark_rows) == len(duck_rows),
        "schema_ok": sorted(spark_cols) == sorted(duck_cols),
        "values_ok": False,
        "sample_diff": None,
    }
    if out["rowcount_ok"] and out["schema_ok"]:
        ms_spark = _rows_multiset(spark_cols, spark_rows)
        ms_duck = _rows_multiset(duck_cols, duck_rows)
        out["values_ok"] = ms_spark == ms_duck
        if not out["values_ok"]:
            only_spark = list((ms_spark - ms_duck).items())[:3]
            only_duck = list((ms_duck - ms_spark).items())[:3]
            out["sample_diff"] = {"only_spark": only_spark, "only_duck": only_duck}
    out["ok"] = out["rowcount_ok"] and out["schema_ok"] and out["values_ok"]
    return out
