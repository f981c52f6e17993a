"""Multi-executor execution parity (r11): a ``local-cluster`` master
spawns REAL worker JVMs with real serialization boundaries — closures
ship over the wire, Arrow batches cross processes, broadcast relations
and memo-store reads happen on executors that share nothing with the
driver but the filesystem.  ``local[N]`` (the rest of the suite) hides
an entire class of driver-local assumptions this catches: an
unserializable closure, a driver-only path, a Python dependency the
executor workers lack.

Runs in a SUBPROCESS: the suite's shared local[*] SparkContext would
be returned by getOrCreate regardless of the requested master (one
JVM, one context), so a clean process is the only way to actually get
worker JVMs.  Each id is hash-compared to its DuckDB oracle at
sf0.001.
"""

import pytest

#: slow tier (r14): property/soak/cluster suites run via `pytest -m slow`;
#: the default (`-m 'not slow'`) is the fast tier the driver's verify times.
pytestmark = pytest.mark.slow

import os
import subprocess
import sys

#: each id exercises a distinct serialization surface
CLUSTER_IDS = (
    "q_source_scan",        # scan + agg baseline
    "q_dedup_minhash",      # codegen'd min-aggregates + banded join
    "q_similarity_topk",    # Arrow-batched numpy kernel (Pandas UDF)
    "q_multimodal_resize",  # mapInPandas binary decode path
    "q_pca_project",        # Gram-partial applyInPandas + local eigh
    "q_spearman",           # two range exchanges + localCheckpoint
    "q_pagerank_bucketed",  # bucketed-table memo store via warehouse
    "q_rollup_route",       # rollup store + routed re-aggregation
    "q_drilldown_week",     # cube grammar + iso_week hierarchy
)

_WORKER = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local-cluster[2,4,2048]")
         .appName("opl-cluster-parity")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.executor.memory", "2g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
assert "local-cluster" in spark.sparkContext.master, spark.sparkContext.master
from oracle import compare
from opl_spark import workload
qs, osql = workload.queries(), workload.oracle_sql()
for name in {ids!r}:
    r = compare(qs[name](spark, "/root/testdata/sf0.001"),
                osql[name], "/root/testdata/sf0.001")
    ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
    print("RESULT", name, "OK" if ok else "FAIL " + repr(r), flush=True)
spark.stop()
"""


def test_queries_are_hash_exact_on_real_executors(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "cluster_worker.py"
    script.write_text(
        _WORKER.format(
            repo=repo, tests=os.path.join(repo, "tests"), ids=CLUSTER_IDS
        )
    )
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),  # worker warehouse/metastore stay out of the repo
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    results = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert len(results) == len(CLUSTER_IDS), out.stdout[-2000:]
    bad = [l for l in results if not l.endswith(" OK")]
    assert not bad, bad
