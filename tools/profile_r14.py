#!/usr/bin/env python
"""Round-13 optimization profiler: for each named query, capture the
physical plan (``explain("formatted")``) into plans/r14/<id>_<tag>.txt
and time the noop-sink execution (best of N, same methodology as
bench.py:run_set), reporting wall seconds and the number of Spark jobs
the query scheduled (sequential-action shapes show up as job count).

Usage:
    python tools/profile_r14.py [--tag before|after] [--runs 2] q_a q_b ...

Timing here is for ITERATION ONLY (relative before/after on the same
host, same session); the recording of record stays bench.py's.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", f"--driver-memory {_DRIVER_MEM} pyspark-shell"
)


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    runs = 2
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args
    if not names:
        raise SystemExit("usage: profile_r14.py [--tag t] [--runs n] q_a ...")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)

    from opl_spark import workload
    from opl_spark.session import get_spark
    from opl_spark.sources import TABLES, load_table

    spark = get_spark(app_name=f"opl-profile-r14-{tag}")
    qs = workload.queries()
    # warm-up: parquet footers + codegen, as in bench.run_set
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    import gc

    sc = spark.sparkContext
    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        best, best_jobs = float("inf"), None
        for _ in range(runs):
            j0 = sc.statusTracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            # re-build per run: query construction (its own driver
            # actions included) is part of what bench.py times
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            j1 = sc.statusTracker().getJobIdsForGroup(None)
            if el < best:
                best, best_jobs = el, len(set(j1) - set(j0))
        results[name] = {"sec": round(best, 3), "jobs": best_jobs}
        print(f"{name}: {best:.3f}s jobs={best_jobs}", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
