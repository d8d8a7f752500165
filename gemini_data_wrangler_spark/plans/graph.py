"""Stage DAG derivation + flow JSON (de)serialization.

Mirrors the reference's lineage surface:

* ``build_stage_graph`` — dependency edges derived *by table name*, the same
  walk as ``buildStageGraph`` (ui/src/StageGraphFlow.tsx:46-109): LOAD
  stages claim their ``tableName``; JOIN wires inputs from
  ``leftTable``/``rightTable`` and claims ``joined_{left}_{right}``; UNION
  wires from ``tables[]``; unary ops wire from ``data.table``. A node's
  level is ``max(input levels) + 1`` (ui/src/StageGraphFlow.tsx:102-105).
* ``export_flow`` / ``import_flow`` — the stage-flow JSON format written by
  ``exportStagesToJSON`` (ui/src/App.tsx:2043-2056): a list of
  ``{id: "stage_{i+1}", type, description, data}`` with IDs renumbered to
  match displayed stage order.

In Spark the *physical* lineage is the Catalyst plan; this module keeps the
reference's logical, name-derived DAG as portable metadata (it is what a
UI or scheduler consumes).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from gemini_data_wrangler_spark.plans.stage import Stage


@dataclass
class StageNode:
    id: str
    stage: Stage
    inputs: list[str] = field(default_factory=list)
    level: int = 0


def build_stage_graph(stages: list[Stage]) -> dict[str, StageNode]:
    nodes: dict[str, StageNode] = {}
    table_map: dict[str, str] = {}

    for stage in stages:
        nodes[stage.id] = StageNode(id=stage.id, stage=stage)
        if stage.type == "LOAD" and stage.data.get("tableName"):
            table_map[stage.data["tableName"]] = stage.id

    for stage in stages:
        node = nodes[stage.id]
        d = stage.data
        if stage.type == "JOIN":
            for key in ("leftTable", "rightTable"):
                src = table_map.get(d.get(key, ""))
                if src:
                    node.inputs.append(src)
            if d.get("leftTable") and d.get("rightTable"):
                table_map[f"joined_{d['leftTable']}_{d['rightTable']}"] = stage.id
        elif stage.type == "UNION":
            for t in d.get("tables") or []:
                src = table_map.get(t)
                if src:
                    node.inputs.append(src)
        elif stage.type in ("FILTER", "GROUP", "SELECT", "SORT"):
            src = table_map.get(d.get("table", ""))
            if src:
                node.inputs.append(src)

        if node.inputs:
            node.level = max(nodes[i].level for i in node.inputs) + 1

    return nodes


def topological_levels(nodes: dict[str, StageNode]) -> list[list[str]]:
    """Stage ids grouped by level, for scheduling/rendering."""
    by_level: dict[int, list[str]] = {}
    for node in nodes.values():
        by_level.setdefault(node.level, []).append(node.id)
    return [sorted(by_level[lvl]) for lvl in sorted(by_level)]


# ---------------------------------------------------------------------------
# Flow JSON
# ---------------------------------------------------------------------------
def export_flow(stages: list[Stage]) -> list[dict[str, Any]]:
    """Stage list → flow JSON records with renumbered readable ids
    (ui/src/App.tsx:2045-2051; no timestamp, ids are stage_{i+1})."""
    return [
        {
            "id": f"stage_{i + 1}",
            "type": s.type,
            "description": s.description,
            "data": dict(s.data),
        }
        for i, s in enumerate(stages)
    ]


def export_flow_json(stages: list[Stage], indent: int = 2) -> str:
    return json.dumps(export_flow(stages), indent=indent)


def import_flow(records: list[dict[str, Any]]) -> list[Stage]:
    """Flow JSON records → stages (unknown types default to CUSTOM, the
    whitelist behavior of ui/src/App.tsx:1650-1670 via Stage.from_dict)."""
    return [Stage.from_dict(r) for r in records]


def import_flow_json(text: str) -> list[Stage]:
    return import_flow(json.loads(text))
