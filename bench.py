#!/usr/bin/env python
"""Benchmark harness — times the declared query inventory at sf0.1.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Env knobs: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default all), ``BENCH_QUERIES`` (comma-separated
subset).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from gemini_data_wrangler_spark.queries import registry
    from gemini_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="gdws-bench")
    spark.sparkContext.setLogLevel("ERROR")

    reg = registry()
    only = os.environ.get("BENCH_QUERIES")
    names = [n.strip() for n in only.split(",")] if only else sorted(reg)

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    reg["flagship_segment_sales"][0](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        builder, _ = reg[name]
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        # Force full execution without collecting result rows to the driver.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Drop per-query persisted intermediates (dedup/similarity stage
        # caches) so successive queries don't accumulate heap pressure.
        # clearCache only covers the SQL cache manager — localCheckpoint
        # blocks (connected components) are freed by the ContextCleaner,
        # which needs the Python refs collected first; nudge both so each
        # query starts from a clean block manager.
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
