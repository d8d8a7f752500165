"""Chart-config pass-through (metadata only; rendering is out of scope).

The reference's planner response carries ``{chartType, xAxis, yAxis, zAxis}``
(server/index.js:92-95) which the UI stores as
``chartConfig = {type, xAxis, yAxis, zAxis}`` (ui/src/App.tsx:1725) and
validates against the result table's columns before rendering
(ui/src/App.tsx:1743-1765, ``handlePresetVisualize``). Recharts / d3 /
plotly renderers (ui/src/DynamicChart.tsx:42-72,
ui/src/EnhancedVisualizations.tsx:78-235) are explicit non-goals
(SURVEY §7.5) — this module keeps the *engine-visible* half: the config
shape, the type whitelist, column validation, and the ≤1000-row data slice
a renderer would consume.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

# server/index.js:92 — the closed chartType enum.
CHART_TYPES = frozenset(
    {
        "bar",
        "line",
        "area",
        "scatter",
        "d3-scatter",
        "d3-line",
        "d3-bar",
        "3d-scatter",
        "3d-surface",
        "none",
    }
)

# 3-D types are the only ones that read zAxis (ui/src/EnhancedVisualizations.tsx:118+).
THREE_D_TYPES = frozenset({"3d-scatter", "3d-surface"})

PREVIEW_LIMIT = 1000  # same cap as every stage read-back (ui/src/App.tsx:608)


@dataclass(frozen=True)
class ChartConfig:
    type: str
    x_axis: str | None = None
    y_axis: str | None = None
    z_axis: str | None = None


def normalize_chart_config(raw: dict[str, Any]) -> ChartConfig:
    """Accept either the server response keys (``chartType/xAxis/yAxis/
    zAxis``) or the UI state keys (``type/xAxis/yAxis/zAxis``); unknown or
    missing type degrades to ``none`` (charts are best-effort in the
    reference — a bad config never fails the query)."""
    ctype = str(raw.get("chartType") or raw.get("type") or "none").lower()
    if ctype not in CHART_TYPES:
        ctype = "none"
    return ChartConfig(
        type=ctype,
        x_axis=raw.get("xAxis") or raw.get("x_axis"),
        y_axis=raw.get("yAxis") or raw.get("y_axis"),
        z_axis=raw.get("zAxis") or raw.get("z_axis"),
    )


def validate_chart_config(config: ChartConfig, df: DataFrame) -> list[str]:
    """Column-existence check, mirroring ``handlePresetVisualize``
    (ui/src/App.tsx:1754-1765): returns the reference's error strings
    (empty list = valid). Case-insensitive to match
    ``spark.sql.caseSensitive=false`` resolution."""
    if config.type == "none":
        return []
    errors = []
    cols = {c.lower() for c in df.columns}
    for axis, name in (("xAxis", config.x_axis), ("yAxis", config.y_axis)):
        if not name:
            errors.append(f'Column "{name}" not found in data')
        elif name.lower() not in cols:
            errors.append(f'Column "{name}" not found in data')
    if config.type in THREE_D_TYPES and config.z_axis and config.z_axis.lower() not in cols:
        errors.append(f'Column "{config.z_axis}" not found in data')
    return errors


def chart_payload(config: ChartConfig, df: DataFrame) -> dict[str, Any]:
    """What a renderer would receive: the validated config + the ≤1000-row
    slice projected to the referenced axes. Distributed limit-then-collect;
    never a full collect."""
    errors = validate_chart_config(config, df)
    if errors or config.type == "none":
        return {"config": config, "errors": errors, "rows": []}
    axes = [a for a in (config.x_axis, config.y_axis, config.z_axis) if a]
    rows = [r.asDict() for r in df.select(*axes).limit(PREVIEW_LIMIT).collect()]
    return {"config": config, "errors": [], "rows": rows}
