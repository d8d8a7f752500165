"""Per-query wall-time profile of the driver's correctness path at sf0.01.

Mirrors what the driver does per query: run the Spark callable, collect,
run the DuckDB oracle, compare sizes. Prints a sorted timing table so we
can attack the slowest queries (the driver's correctness pass is the gate
— every second here delays / risks a driver row).

Usage: python profile_correctness.py [sf_dir] [only_prefix]
"""
import json
import os
import sys
import time

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2] if len(sys.argv) > 2 else None

os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

import __spark_entry__ as entry_mod
from gemini_data_wrangler_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows = []
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        t0 = time.time()
        err = None
        n_spark = n_oracle = -1
        try:
            n_spark = len(fn(spark, sf_dir).collect())
        except Exception as exc:  # noqa: BLE001
            err = f"spark:{exc}"[:120]
        t1 = time.time()
        if name in oracles and err is None:
            try:
                n_oracle = len(con.execute(oracles[name]).fetchall())
            except Exception as exc:  # noqa: BLE001
                err = f"oracle:{exc}"[:120]
        t2 = time.time()
        rows.append(
            {"q": name, "spark_s": round(t1 - t0, 2), "oracle_s": round(t2 - t1, 2),
             "rows": n_spark, "orows": n_oracle, "err": err}
        )
        print(f"{name:45s} spark={t1-t0:7.2f}s oracle={t2-t1:6.2f}s rows={n_spark}", flush=True)
    rows.sort(key=lambda r: -(r["spark_s"] + r["oracle_s"]))
    total = sum(r["spark_s"] + r["oracle_s"] for r in rows)
    print(json.dumps({"total_s": round(total, 1), "n": len(rows)}))
    print("== slowest 30 ==")
    for r in rows[:30]:
        print(json.dumps(r))
    errs = [r for r in rows if r["err"]]
    print(f"== errors: {len(errs)} ==")
    for r in errs:
        print(json.dumps(r))
    with open("/root/repo/PROFILE_CORRECTNESS.json", "w") as fh:
        json.dump(rows, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
