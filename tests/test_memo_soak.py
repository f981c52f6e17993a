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
