"""Local mimic of the driver's Spark-vs-DuckDB comparison.

The implementation moved into the package
(`gemini_data_wrangler_spark.parity`) so the full-registry artifact runner
(`python -m gemini_data_wrangler_spark parity`) and the test suite share
one `compare`; this module re-exports for existing test imports.
"""

from __future__ import annotations

from gemini_data_wrangler_spark.parity import _norm_value, _rows_multiset, compare  # noqa: F401
