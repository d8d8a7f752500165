"""Fallback SQL → stage decompiler.

Port of ``parseSQLToStages`` (ui/src/sqlParser.ts:12-145): a regex lineage
extractor used when a planner returns SQL without a stage list. Best-effort
by design — it recovers ONE stage per operator family and falls back to a
single CUSTOM stage. The regexes (and their quirks, e.g. the GROUP BY
char-class stop at ``[^ORDER]``) are kept semantically equivalent.
"""

from __future__ import annotations

import re
from typing import Any


def parse_sql_to_stages(sql: str, explanation: str = "") -> list[dict[str, Any]]:
    stages: list[dict[str, Any]] = []
    sql_upper = sql.upper()

    # 1. JOIN (ui/src/sqlParser.ts:17-41)
    join_m = re.search(
        r"(?:LEFT|RIGHT|FULL\s+OUTER|INNER)?\s+JOIN\s+(\w+)\s+(\w+)\s+ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)",
        sql,
        re.IGNORECASE,
    )
    if join_m:
        if "LEFT JOIN" in sql_upper:
            join_type = "LEFT"
        elif "RIGHT JOIN" in sql_upper:
            join_type = "RIGHT"
        elif "FULL OUTER JOIN" in sql_upper:
            join_type = "FULL OUTER"
        else:
            join_type = "INNER"
        from_m = re.search(r"FROM\s+(\w+)\s+(\w+)", sql, re.IGNORECASE)
        left_table = from_m.group(1) if from_m else join_m.group(3)
        stages.append(
            {
                "type": "JOIN",
                "description": f"{join_type} join {left_table} with {join_m.group(1)}",
                "data": {
                    "joinType": join_type,
                    "leftTable": left_table,
                    "rightTable": join_m.group(1),
                    "leftKey": join_m.group(4),
                    "rightKey": join_m.group(6),
                },
            }
        )

    # 2. GROUP BY (ui/src/sqlParser.ts:44-72). NB the reference's regex stops
    # the capture at any of the characters O,R,D,E (char class [^ORDER]) —
    # kept, since it works for the common single-key case it targets.
    group_m = re.search(r"GROUP\s+BY\s+([^ORDER]+?)(?:\s+ORDER|\s*$)", sql, re.IGNORECASE)
    if group_m:
        group_cols = [c.strip() for c in group_m.group(1).split(",")]
        aggregations: list[dict[str, Any]] = []
        select_m = re.search(r"SELECT\s+(.+?)\s+FROM", sql, re.IGNORECASE)
        if select_m:
            for m in re.finditer(
                r"(SUM|COUNT|AVG|MAX|MIN)\s*\(([^)]+)\)(?:\s+AS\s+(\w+))?", select_m.group(1), re.IGNORECASE
            ):
                aggregations.append(
                    {
                        "function": m.group(1).upper(),
                        "column": m.group(2).strip(),
                        **({"alias": m.group(3)} if m.group(3) else {}),
                    }
                )
        data: dict[str, Any] = {"groupBy": group_cols}
        if aggregations:
            data["aggregations"] = aggregations
        stages.append({"type": "GROUP", "description": f"Group by {', '.join(group_cols)}", "data": data})

    # 3. ORDER BY (ui/src/sqlParser.ts:75-87)
    order_m = re.search(r"ORDER\s+BY\s+(\w+)\s+(ASC|DESC)", sql, re.IGNORECASE)
    if order_m:
        stages.append(
            {
                "type": "SORT",
                "description": f"Sort by {order_m.group(1)} {order_m.group(2)}",
                "data": {"orderBy": [{"column": order_m.group(1), "direction": order_m.group(2).upper()}]},
            }
        )

    # 4. WHERE → FILTER (ui/src/sqlParser.ts:90-102)
    where_m = re.search(
        r"WHERE\s+(\w+)\s*([=<>!]+|LIKE|IN|NOT\s+IN)\s*(.+?)(?:\s+GROUP|\s+ORDER|\s*$)", sql, re.IGNORECASE
    )
    if where_m:
        from_m = re.search(r"FROM\s+(\w+)", sql, re.IGNORECASE)
        stages.append(
            {
                "type": "FILTER",
                "description": f"Filter where {where_m.group(1)} {where_m.group(2)} {where_m.group(3)}",
                "data": {
                    "table": from_m.group(1) if from_m else "",
                    "column": where_m.group(1),
                    "operator": re.sub(r"\s+", " ", where_m.group(2)).strip(),
                    "value": where_m.group(3).strip().replace("'", "").replace('"', ""),
                },
            }
        )

    # 5. UNION (ui/src/sqlParser.ts:105-120)
    if "UNION" in sql_upper:
        tables = [m.group(1) for m in re.finditer(r"FROM\s+(\w+)", sql, re.IGNORECASE)]
        stages.append(
            {
                "type": "UNION",
                "description": f"Union {' and '.join(tables)}",
                "data": {
                    "unionType": "UNION ALL" if "UNION ALL" in sql_upper else "UNION",
                    "tables": tables,
                },
            }
        )

    # 6. SELECT specific columns (ui/src/sqlParser.ts:123-133)
    if "SELECT *" not in sql_upper:
        select_m = re.search(r"SELECT\s+(.+?)\s+FROM", sql, re.IGNORECASE)
        if select_m and not group_m:
            columns = [re.split(r"\s+AS\s+", c.strip(), flags=re.IGNORECASE)[0].strip() for c in select_m.group(1).split(",")]
            stages.append(
                {"type": "SELECT", "description": f"Select columns: {', '.join(columns)}", "data": {"columns": columns}}
            )

    if not stages:
        stages.append(
            {"type": "CUSTOM", "description": explanation or "Custom SQL transformation", "data": {"sql": sql}}
        )
    return stages
