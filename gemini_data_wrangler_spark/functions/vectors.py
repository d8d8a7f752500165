"""Vector math on ``array<float>``/``array<double>`` columns — pure JVM
higher-order functions (zip_with / aggregate), no Python UDFs in the hot
path. Elements are cast to double before accumulation so the reduction is
double-precision left-to-right — the same order DuckDB's list functions use,
which keeps results binary-comparable for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return vec_dot(a, b) / (l2_norm(a) * l2_norm(b))
