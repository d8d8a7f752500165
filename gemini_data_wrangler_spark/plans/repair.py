"""Semantic-repair pass — makes malformed stages executable.

Port of the reference's pre-execution heuristics (they are part of its
observable operator semantics — SURVEY.md §2.3):

* JOIN repair        — ui/src/App.tsx:1008-1062
* FILTER repair      — ui/src/App.tsx:1064-1153
* GROUP repair       — ui/src/App.tsx:1157-1216
* FILTER column validation + fuzzy fallback — ui/src/App.tsx:1328-1391
* GROUP column validation + fuzzy fallback  — ui/src/App.tsx:1394-1446

Pure Python over the stage IR — no Spark involvement until compilation.
Same keyword tables, same precedence, same fallbacks.
"""

from __future__ import annotations

import re

from gemini_data_wrangler_spark.plans.stage import Stage

# ui/src/App.tsx:1011 — values that cannot stand in for a join key.
_INVALID_KEY_VALUES = {"none", "null", "", "undefined", "n/a"}


def _is_numeric(value) -> bool:
    """JS ``!isNaN(Number(v)) && v.trim() !== ''`` equivalent."""
    s = str(value).strip()
    if s == "":
        return False
    try:
        float(s)
        return True
    except ValueError:
        return False


def repair_join(stage: Stage) -> Stage:
    """Fill missing join keys from ``value``, else description keywords,
    else literal ``id``; default joinType INNER (ui/src/App.tsx:1008-1062)."""
    d = stage.data
    value = d.get("value")
    if value and str(value).lower() not in _INVALID_KEY_VALUES and (
        not d.get("leftKey") or not d.get("rightKey")
    ):
        d["leftKey"] = str(value)
        d["rightKey"] = str(value)

    if not d.get("leftKey") or not d.get("rightKey"):
        desc = (stage.description or "").lower()
        inferred = None
        for key in ("customer_id", "order_id", "product_id", "user_id"):
            if key in desc or key.replace("_", " ") in desc:
                inferred = key
                break
        if inferred is None and "id" in desc:
            m = re.search(r"(\w+)_?id", desc)
            inferred = m.group(0).replace(" ", "_") if m else "id"
        if inferred is None:
            inferred = "id"
        d.setdefault("leftKey", None)
        d.setdefault("rightKey", None)
        if not d["leftKey"]:
            d["leftKey"] = inferred
        if not d["rightKey"]:
            d["rightKey"] = inferred

    if not d.get("joinType"):
        d["joinType"] = "INNER"
    return stage


def repair_filter(stage: Stage) -> Stage:
    """Infer missing column/operator from description + value numericness;
    generic fallback ``amount > 0`` (ui/src/App.tsx:1064-1153)."""
    d = stage.data
    desc = (stage.description or "").lower()

    if d.get("value") and not d.get("column"):
        if _is_numeric(d["value"]):
            if "amount" in desc or "value" in desc or "price" in desc:
                d["column"], d["operator"] = "amount", ">"
            elif "date" in desc:
                d["column"], d["operator"] = "date", ">"
            else:
                d["column"], d["operator"] = "amount", ">"
        else:
            if "status" in desc or "active" in desc or "inactive" in desc:
                d["column"], d["operator"] = "status", "="
            elif "category" in desc or "type" in desc:
                d["column"], d["operator"] = "category", "="
            elif "name" in desc:
                d["column"], d["operator"] = "name", "LIKE"
            else:
                d["column"], d["operator"] = "status", "="
    elif not d.get("value") and not d.get("column") and not d.get("conditions"):
        if "high" in desc and ("amount" in desc or "value" in desc or "order" in desc):
            d["column"], d["operator"], d["value"] = "amount", ">", "100"
        elif "low" in desc and ("amount" in desc or "value" in desc or "order" in desc):
            d["column"], d["operator"], d["value"] = "amount", "<", "100"
        elif "active" in desc or "status" in desc:
            d["column"], d["operator"], d["value"] = "status", "=", "active"
        elif "recent" in desc and "date" in desc:
            d["column"], d["operator"], d["value"] = "order_date", ">", "2023-01-01"
        elif "large" in desc or "big" in desc:
            d["column"], d["operator"], d["value"] = "amount", ">", "500"
        else:
            d["column"], d["operator"], d["value"] = "amount", ">", "0"
    return stage


def repair_group(stage: Stage) -> Stage | None:
    """Infer groupBy from description keywords; default aggregation
    ``COUNT(*) AS count``; returns None when unrecoverable (the reference
    skips the stage — ui/src/App.tsx:1198-1203)."""
    d = stage.data
    if not d.get("groupBy"):
        desc = (stage.description or "").lower()
        inferred: list[str] = []
        if "customer" in desc:
            if "customer_id" in desc or "customer id" in desc:
                inferred.append("customer_id")
            elif "customer_name" in desc or "customer name" in desc:
                inferred.append("customer_name")
            else:
                inferred.append("customer_id")
        elif "category" in desc:
            inferred.append("category")
        elif "status" in desc:
            inferred.append("status")
        elif "date" in desc:
            inferred.append("order_date")
        elif "product" in desc:
            inferred.append("product_id")
        elif "region" in desc:
            inferred.append("region")
        if not inferred:
            return None  # skip stage
        d["groupBy"] = inferred
    if not d.get("aggregations"):
        d["aggregations"] = [{"function": "COUNT", "column": "*", "alias": "count"}]
    return stage


# ---------------------------------------------------------------------------
# Schema-aware validation (needs the resolved input table's columns)
# ---------------------------------------------------------------------------
def validate_filter_column(stage: Stage, available_columns: list[str]) -> Stage:
    """Column-existence check with substring-similarity fallback and
    auto-``%v%`` LIKE wrapping (ui/src/App.tsx:1328-1391)."""
    d = stage.data
    if not d.get("column"):
        return stage
    available_lower = [c.lower() for c in available_columns]
    target = str(d["column"]).lower()
    if target in available_lower:
        return stage

    value = str(d.get("value", "") or "")
    numeric = _is_numeric(value)
    if numeric:
        alternative = next(
            (c for c in available_lower if any(s in c for s in ("amount", "price", "quantity", "total", "cost"))),
            None,
        )
    else:
        alternative = next(
            (c for c in available_lower if any(s in c for s in ("status", "name", "category", "type", "description"))),
            None,
        )
    if alternative:
        d["column"] = alternative
        if numeric:
            d["operator"] = ">"
        else:
            d["operator"] = "LIKE"
            if "%" not in value:
                d["value"] = f"%{value}%"
    elif available_lower:
        d["column"] = available_columns[0]
        d["operator"] = ">"
        d["value"] = "0"
    return stage


def validate_group_columns(stage: Stage, available_columns: list[str]) -> Stage:
    """Keep existing groupBy columns, fuzzy-match missing ones (substring
    either way, underscore-insensitive), first column as last resort
    (ui/src/App.tsx:1394-1446)."""
    d = stage.data
    group_by = d.get("groupBy") or []
    if not group_by:
        return stage
    available_lower = {c.lower(): c for c in available_columns}
    valid: list[str] = []
    for col in group_by:
        col_lower = str(col).lower()
        if col_lower in available_lower:
            valid.append(col)
            continue
        similar = next(
            (
                cl
                for cl in available_lower
                if col_lower in cl
                or cl in col_lower
                or col_lower.replace("_", "") in cl.replace("_", "")
            ),
            None,
        )
        if similar:
            valid.append(available_lower[similar])
    if not valid and available_columns:
        valid.append(available_columns[0])
    d["groupBy"] = valid
    return stage


def repair_stage(stage: Stage, available_columns: list[str] | None = None) -> Stage | None:
    """Run the full repair pass for one stage. Returns the repaired stage,
    or None when the stage must be skipped (unrecoverable GROUP)."""
    if stage.type == "JOIN":
        stage = repair_join(stage)
    elif stage.type == "FILTER":
        stage = repair_filter(stage)
        if available_columns:
            stage = validate_filter_column(stage, available_columns)
    elif stage.type == "GROUP":
        repaired = repair_group(stage)
        if repaired is None:
            return None
        stage = repaired
        if available_columns:
            stage = validate_group_columns(stage, available_columns)
    return stage
