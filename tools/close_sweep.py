#!/usr/bin/env python
"""One-command round-close validation: the full registered-query
DuckDB-oracle sweep at the driver's gate scale (sf0.01), exactly the
compare the external harness applies (row count + sorted-column schema
+ order-insensitive value hash, tests/oracle.py).

This is the ad-hoc heredoc every round ran from /tmp, promoted to a
committed tool so the close validation is reproducible verbatim:

    python tools/close_sweep.py                     # full 291-id sweep
    python tools/close_sweep.py q_a q_b             # targeted ids
    SWEEP_SF_DIR=/root/testdata/sf0.001 ...         # other gate scale

Exit code 0 iff every swept id is hash-exact (rows-only ids — none
registered since r12 — would count() instead).  Runs from any cwd; a
fresh process is recommended (the harness itself imports from outside
the repo root).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
CPUS = os.environ.get("SWEEP_CPUS", "16")


def main(ids: list[str]) -> int:
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from oracle import compare

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("opl-close-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = e.queries(), e.oracle_sql()
    picked = ids or list(qs)
    unknown = [q for q in picked if q not in qs]
    if unknown:
        print(f"unknown ids: {unknown}")
        return 2
    t0 = time.time()
    bad: list[str] = []
    for i, name in enumerate(picked):
        sql = osql.get(name)
        if sql is None:
            ok = qs[name](spark, SF_DIR).count() >= 0
        else:
            r = compare(qs[name](spark, SF_DIR), sql, SF_DIR)
            ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
        if not ok:
            bad.append(name)
            print(f"RED {name}", flush=True)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(picked)} done, bad={bad}, "
                  f"{time.time() - t0:.0f}s", flush=True)
    print(f"TOTAL {len(picked)} BAD {bad} {time.time() - t0:.0f}s")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
