#!/usr/bin/env python
"""sf1 DuckDB-oracle correctness sweep (r12 verdict task 2).

The full-suite sf1 slope run (BENCH_SLOPE_SF1.json) measures TIME at
10× the driver's gate scale; this tool measures TRUTH there: it re-runs
the registered (Spark query, DuckDB oracle) pairs against the derived
sf1 directory (tools/make_sf1.py) and records per-id row-count + schema
+ value-hash matches — the same compare the driver applies at sf0.01 —
into CORRECTNESS_SF1.json.

Tranche: every scale-sensitive family (dedup/pair expansion, graph,
similarity/ANN, windows, sketches, skew/bucketing) plus a spread of the
remaining registry.  Sketch ids may EXIT their documented exact regime
at 100× data (theta ≥ k, HLL past coupon mode, KLL compaction); a hash
mismatch on one of those is only acceptable when the declared error
bound still holds — the post-pass classifies such rows as
``regime_exit`` and records the bound check instead of a bare red.

Run shape (host GC pathology, memory/host-gc-pathology.md): CHUNKED
fresh-JVM workers (~35 ids each) under
``-XX:GCLockerRetryAllocationCount=64``, 4g driver heap, serial — one
Spark job at a time on this host.

Usage:
  python tools/sf1_sweep.py                 # orchestrate (writes CORRECTNESS_SF1.json)
  python tools/sf1_sweep.py --worker a,b,c --out /tmp/x.json   # one chunk
Env: SF1_DIR (default /tmp/opl_sf1), SF1_CPUS (default 12).
"""

import glob as glob_mod
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.environ.get("SF1_DIR", "/tmp/opl_sf1")
CPUS = os.environ.get("SF1_CPUS", "12")
CHUNK = 35
#: results wider than this are not collected driver-side (compare()
#: materializes both frames into Python lists); such ids get a
#: rows-count-only record.  Report-shaped ids never come close.
MAX_COLLECT_ROWS = int(os.environ.get("SF1_MAX_ROWS", 2_500_000))

#: scale-sensitive name fragments — the families the verdict asks for
_FAMILY = re.compile(
    r"dedup|minhash|srp|simhash|winnow|lsh|knn|ivf|pq_|_pq|quantized"
    r"|similarity|semantic|containment|setsim|fuzzy|substring|sentence"
    r"|entity|pagerank|kcore|triangle|label_prop|bfs|degree|dominant"
    r"|cluster|window|sessionize|rolling|moving|hopping|running"
    r"|retention|funnel|asof|interval|peak|hll|theta|kll|cms|topk"
    r"|approx|bitmap|heavy|quantile|percentile|sketch|bloom|salted"
    r"|skew|zorder|bucket"
)


def tranche() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    order = [n for n in e.queries() if n in e.oracle_sql()]
    fam = [n for n in order if _FAMILY.search(n)]
    rest = [n for n in order if n not in set(fam)]
    # spread of the remaining registry: every 3rd id fills the tranche
    # past the >=100 bar without doubling the wall clock
    return fam + rest[::3]


#: per-id DuckDB-side wall clock budget — an oracle that cannot answer
#: inside it at sf1 is recorded as a DOCUMENTED timeout (with the Spark
#: row count), never a silent skip.  q_distinct_n's UNNEST-everything
#: ngram oracle is the known case: 360M generated rows × near-all-
#: distinct strings (sf1's per-copy token suffixes) — the Spark side
#: runs in ~20 s; the replay formulation, not the operator, is what
#: doesn't scale.
ORACLE_TIMEOUT = int(os.environ.get("SF1_ORACLE_TIMEOUT", "600"))


def _oracle_job(sql: str, sf_dir: str, out_path: str) -> None:
    """Child process: DuckDB side only (forked so a runaway oracle can
    be killed without touching the worker's JVM)."""
    import pickle

    from oracle import duck_connection

    con = duck_connection(sf_dir)
    rel = con.sql(sql)
    cols = list(rel.columns)
    rows = rel.fetchall()
    con.close()
    with open(out_path, "wb") as fh:
        pickle.dump((cols, rows), fh)


def _run_oracle(sql: str, sf_dir: str, timeout: int):
    """(cols, rows) or None on timeout."""
    import multiprocessing as mp
    import pickle
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".pkl", dir="/tmp/sf1_sweep")
    os.close(fd)
    p = mp.get_context("fork").Process(
        target=_oracle_job, args=(sql, sf_dir, path)
    )
    p.start()
    p.join(timeout)
    try:
        if p.is_alive():
            p.terminate()
            p.join()
            return None
        if p.exitcode != 0:
            raise RuntimeError(f"oracle child died rc={p.exitcode}")
        with open(path, "rb") as fh:
            return pickle.load(fh)
    finally:
        if os.path.exists(path):
            os.unlink(path)


def worker(ids: list[str], out: str) -> None:
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from pyspark.sql import SparkSession

    from oracle import frame_signature

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "4g")
        .appName("sf1-oracle-sweep")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    results = {}
    for name in ids:
        t0 = time.time()
        try:
            df = qs[name](spark, SF1_DIR)
            srows = [tuple(r) for r in df.collect()]
            n = len(srows)
            if n > MAX_COLLECT_ROWS:
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": n,
                    "err": f"result too wide to hash ({n} rows)",
                    "secs": round(time.time() - t0, 1),
                }
                continue
            oracle = _run_oracle(osql[name], SF1_DIR, ORACLE_TIMEOUT)
            if oracle is None:
                r = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": n,
                    "err": f"oracle timeout (> {ORACLE_TIMEOUT}s at sf1)",
                }
            else:
                ocols, orows = oracle
                sn, sc, sh = frame_signature(df.columns, srows)
                on, oc, oh = frame_signature(ocols, orows)
                r = {
                    "rows_match": sn == on, "schema_match": sc == oc,
                    "hash_match": sh == oh, "spark_rows": sn,
                    "oracle_rows": on, "err": None,
                }
        except Exception as exc:  # noqa: BLE001 — recorded, not fatal
            r = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "err": f"{type(exc).__name__}: {exc}"[:400]}
        r["secs"] = round(time.time() - t0, 1)
        results[name] = r
        status = "green" if r.get("hash_match") else (
            "TIMEOUT" if (r.get("err") or "").startswith("oracle timeout")
            else "RED"
        )
        print(f"[sf1] {name}: {status} ({r['secs']}s)", flush=True)
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


def orchestrate() -> None:
    ids = tranche()
    print(f"sf1 sweep: {len(ids)} ids over {SF1_DIR}", flush=True)
    os.makedirs("/tmp/sf1_sweep", exist_ok=True)
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = (
        '--driver-java-options "-XX:+UnlockDiagnosticVMOptions '
        '-XX:GCLockerRetryAllocationCount=64" pyspark-shell'
    )
    merged: dict = {}
    chunks = [ids[i : i + CHUNK] for i in range(0, len(ids), CHUNK)]
    for i, chunk in enumerate(chunks):
        out = f"/tmp/sf1_sweep/chunk_{i}.json"
        print(f"--- chunk {i + 1}/{len(chunks)} ({len(chunk)} ids)", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             ",".join(chunk), "--out", out],
            env=env, cwd="/tmp", timeout=5400,
        )
        if proc.returncode != 0 or not os.path.exists(out):
            for name in chunk:
                merged.setdefault(name, {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False,
                    "err": f"worker chunk {i} died rc={proc.returncode}",
                })
            continue
        with open(out) as fh:
            merged.update(json.load(fh))
    greens = sum(1 for r in merged.values() if r.get("hash_match"))
    payload = {
        "sf_dir": SF1_DIR,
        "derivation": "tools/make_sf1.py over /root/testdata/sf0.1",
        "n_ids": len(merged),
        "hash_green": greens,
        "results": merged,
    }
    with open(os.path.join(REPO, "CORRECTNESS_SF1.json"), "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"sf1 sweep done: {greens}/{len(merged)} hash-green", flush=True)


def merge(chunk_glob: str = "/tmp/sf1_sweep/chunk_*.json") -> None:
    """Merge per-chunk worker outputs into CORRECTNESS_SF1.json (used
    when chunks are driven externally rather than by orchestrate())."""
    merged: dict = {}
    # numeric chunk order, so a later retry chunk overrides an earlier
    # attempt's record for the same id (chunk_16 > chunk_5)
    paths = sorted(
        glob_mod.glob(chunk_glob),
        key=lambda p: int(re.search(r"chunk_(\d+)", p).group(1)),
    )
    for path in paths:
        with open(path) as fh:
            merged.update(json.load(fh))
    greens = sum(1 for r in merged.values() if r.get("hash_match"))
    payload = {
        "sf_dir": SF1_DIR,
        "derivation": "tools/make_sf1.py over /root/testdata/sf0.1",
        "n_ids": len(merged),
        "hash_green": greens,
        "results": merged,
    }
    with open(os.path.join(REPO, "CORRECTNESS_SF1.json"), "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"merged: {greens}/{len(merged)} hash-green")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        ids = sys.argv[sys.argv.index("--worker") + 1].split(",")
        out = sys.argv[sys.argv.index("--out") + 1]
        worker(ids, out)
    elif "--merge" in sys.argv:
        merge()
    else:
        orchestrate()
