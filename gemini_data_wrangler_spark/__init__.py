"""gemini_data_wrangler_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference app ``TLiu2014/gemini-data-wrangler`` (a DuckDB-WASM browser
data wrangler), re-expressed Spark-first:

* the reference's closed 9-type stage algebra (LOAD / JOIN / UNION / FILTER /
  GROUP / SELECT / SORT / AGGREGATE / CUSTOM — ``ui/src/types.ts:7-63``,
  ``ui/src/sqlGenerator.ts:6-124``) becomes a stage IR compiled to lazy
  DataFrame transformations (``plans.stage`` + ``operators.compiler``);
* the reference's sequential pipeline executor with result materialization
  (``ui/src/App.tsx:551-662, 736-1536``) becomes ``operators.pipeline``
  registering ``result_stage_{N}_{type}`` temp views;
* large-scale training-data-pipeline extensions (dedup, similarity search,
  text analysis, multimodal plumbing, streaming) live in ``operators/`` and
  ``streaming/`` as new stage types on the same IR.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection (broadcast vs sort-merge) and AQE handles skew —
the design target is a 1000-executor cluster at ~100 TB even though tests
run on local[*].
"""

from gemini_data_wrangler_spark.plans.stage import Stage, StageType
from gemini_data_wrangler_spark.operators.compiler import compile_stage
from gemini_data_wrangler_spark.operators.pipeline import PipelineRunner
from gemini_data_wrangler_spark.session import get_spark
from gemini_data_wrangler_spark.sources.readers import load_sf_tables, read_csv, read_parquet

__all__ = [
    "Stage",
    "StageType",
    "compile_stage",
    "PipelineRunner",
    "get_spark",
    "load_sf_tables",
    "read_csv",
    "read_parquet",
]

__version__ = "0.1.0"
