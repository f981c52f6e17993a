"""Concurrent-session soak for the FULL memo-store surface (r10
verdict task 5): two OS processes run every memo-backed registered
query simultaneously against ONE shared warehouse and data directory —
both racing to build all three content-addressed stores
(``opl_edges_trade`` bucketed edges, ``opl_cc_labels_docs`` CC labels,
``opl_rollup_lineitem_day`` day rollup) — and every query in BOTH
processes must still hash-match its DuckDB oracle.  This extends the
single-store race test (test_rollup_router.py) to the real query
surface: a half-written-table read would surface as a hash mismatch
or a crash in whichever process lost a race.

The shared warehouse is a private tmp dir, so the repo's own
spark-warehouse (possibly in use by another session) is never touched.
"""

import pytest

#: slow tier (r14): property/soak/cluster suites run via `pytest -m slow`;
#: the default (`-m 'not slow'`) is the fast tier the driver's verify times.
pytestmark = pytest.mark.slow

import glob
import os
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"

#: every registered query whose plan reads a cross-process memo store
MEMO_IDS = (
    "q_pagerank_bucketed",      # opl_edges_trade (bucketed_table_atomic)
    "q_label_prop_bucketed",    # opl_edges_trade (shared with above)
    "q_dup_cluster_sizes",      # opl_cc_labels_docs (materialize_parquet_atomic)
    "q_rollup_route",           # opl_rollup_lineitem_day (bucketed_table_atomic)
)

_WORKER = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from opl_spark.session import get_spark
from oracle import compare
import __spark_entry__ as e

spark = get_spark(
    app_name="memo-soak-" + sys.argv[1],
    shuffle_partitions=4,
    master="local[4]",
    extra_conf={{"spark.sql.warehouse.dir": {wh!r}}},
)
qs, osql = e.queries(), e.oracle_sql()
for name in {ids!r}:
    r = compare(qs[name](spark, {sf!r}), osql[name], {sf!r})
    ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
    print("RESULT", name, "OK" if ok else "FAIL", r.get("err"), flush=True)
spark.stop()
"""


def test_two_full_memo_sweeps_share_one_warehouse(tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "soak_worker.py"
    script.write_text(
        _WORKER.format(
            repo=repo,
            tests=os.path.join(repo, "tests"),
            wh=wh,
            ids=MEMO_IDS,
            sf=SF_DIR,
        )
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), tag],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for tag in ("A", "B")
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    for out in outs:
        results = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert len(results) == len(MEMO_IDS), out
        bad = [l for l in results if " OK " not in l + " "and not l.endswith(" OK None")]
        assert not bad, bad

    # store integrity: exactly one COMPLETE final location per store,
    # and any leftovers are dot-hidden temps (inert by contract)
    cc = glob.glob(os.path.join(wh, "opl_cc_labels_docs", "*"))
    assert len([d for d in cc if not os.path.basename(d).startswith(".")]) == 1, cc
    edges = glob.glob(os.path.join(wh, "opl_edges_trade_*"))
    assert len(edges) == 1, edges
    assert os.path.exists(os.path.join(edges[0], "_SUCCESS"))
    rollup = glob.glob(os.path.join(wh, "opl_rollup_lineitem_day*"))
    finals = [d for d in rollup if not os.path.basename(d).startswith(".")]
    assert len(finals) >= 1, rollup
    for d in finals:
        assert os.path.exists(os.path.join(d, "_SUCCESS")), d


def test_crashed_builder_temps_are_inert(spark, tmp_path):
    """Contract pin: a leftover ``.tmp-*`` directory from a crashed
    builder must neither block a fresh build nor pollute readers —
    temps are dot-hidden, never read, never swept (a sweep could hit a
    live concurrent builder's in-flight write)."""
    import os

    from pyspark.sql import functions as F

    from opl_spark.sources.bucketing import (
        bucketed_table_atomic,
        materialize_parquet_atomic,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/").replace("file:", "")

    # parquet store: plant a fake crashed temp with GARBAGE content
    base = os.path.join(wh, "opl_crash_probe")
    crash = os.path.join(base, ".tmp-deadbeef-1-1")
    os.makedirs(crash, exist_ok=True)
    with open(os.path.join(crash, "part-garbage.parquet"), "w") as f:
        f.write("not parquet at all")
    got = materialize_parquet_atomic(
        spark, "opl_crash_probe", str(tmp_path),
        lambda: spark.range(7).select(F.col("id")),
    )
    assert got.count() == 7
    assert os.path.exists(crash), "inert temp must never be swept"
    # a second call reads the winner without rebuilding
    assert materialize_parquet_atomic(
        spark, "opl_crash_probe", str(tmp_path),
        lambda: (_ for _ in ()).throw(AssertionError("must not rebuild")),
    ).count() == 7

    # bucketed store: crashed temp next to the final location
    crash2 = os.path.join(wh, ".opl_crash_edges_tmp_999_999")
    os.makedirs(crash2, exist_ok=True)
    with open(os.path.join(crash2, "junk"), "w") as f:
        f.write("junk")
    t = bucketed_table_atomic(
        spark, "opl_crash_edges", str(tmp_path),
        lambda: spark.range(20).select(
            (F.col("id") % 3).alias("src"), F.col("id").alias("dst")
        ),
        bucket_col="src", num_buckets=4,
    )
    assert spark.table(t).count() == 20
    assert os.path.exists(crash2), "inert temp must never be swept"

    # cleanup our probes (safe: names are test-unique)
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(crash2, ignore_errors=True)
    loc = os.path.join(wh, t)
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(loc, ignore_errors=True)
