"""Runnable graph-analytics + data-layout tour.

Usage:
    python examples/graph_and_layout.py [SF_DIR]

The 100×-scale patterns this engine applies to iterative and
layout-sensitive work:

1.  build the customer↔supplier interaction graph from the order log
    and materialize it ONCE as a catalog table bucketed on the node
    key (`bucketize_edges`) — after that, every iterative operator's
    per-round edge-side join plans with NO Exchange;
2.  iterate over the bucketed table: integer-exact PageRank,
    deterministic label propagation (communities), k-core pruning,
    bounded BFS — all fixed-round, node-sized state, no driver loops
    over data;
3.  layout for scan pruning: compact a fact table with
    `cluster_by=[...], zorder=True` — cluster columns range-quantize
    to 8-bit equi-depth rank buckets before Morton interleaving, so
    every rewritten file covers a small rectangle of the key space
    and parquet footer min/max stats prune reads on either dimension.

Everything stays a lazy DataFrame until the final report-sized
collects; the same calls run unchanged on a cluster.
"""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from opl_spark.operators.graph import (  # noqa: E402
    bfs_hops,
    bucketize_edges,
    kcore,
    label_propagation,
    pagerank,
)
from opl_spark.session import get_spark  # noqa: E402
from opl_spark.snapshot import FactQuery, SnapshotEngine  # noqa: E402
from opl_spark.sources import load_table, register_sources  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="graph-layout-tour")
    spark.sparkContext.setLogLevel("ERROR")

    # 1 — trade graph, written once bucketed by node key
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = raw.union(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    be = bucketize_edges(spark, edges, table="tour_edges", num_buckets=16)
    print(f"edges (symmetric, bucketed): {be.count()}")

    # 2 — iterate without re-shuffling the edge list
    pr = pagerank(be, iterations=3, checkpoint=False)
    top = pr.orderBy(F.col("pr").desc(), "node").limit(5).collect()
    print("top-5 pagerank (node, pr/1e12):")
    for r in top:
        print(f"  {r['node']:>6}  {r['pr'] / 1e12:.4f}")

    # checkpoint=False: `be` is a bucketed catalog table — keep its
    # scan metadata so the per-round edge side stays exchange-free
    comms = label_propagation(be, rounds=3, checkpoint=False)
    sizes = (
        comms.groupBy("label").count().orderBy(F.col("count").desc()).limit(3)
    )
    print("3 largest communities (label, members):")
    for r in sizes.collect():
        print(f"  {r['label']:>6}  {r['count']}")

    core = kcore(be, k=4)
    print(f"4-core size: {core.count()} nodes")

    seed = top[0]["node"]
    hops = bfs_hops(be, seed=seed, rounds=2)
    print(
        "reach from top node within 2 hops:",
        [(r["hop"], r["count"])
         for r in hops.groupBy("hop").count().orderBy("hop").collect()],
    )

    # 3 — z-ordered compaction: quantized Morton layout + footer check
    with tempfile.TemporaryDirectory() as wh:
        eng = SnapshotEngine(spark, wh)
        register_sources(spark, sf_dir)
        eng.run(
            "1998-06-01",
            [FactQuery(1, "f_lines",
                       "SELECT CAST(l_orderkey AS BIGINT) AS k, "
                       "CAST(l_partkey AS BIGINT) AS p, "
                       "l_linenumber AS v FROM lineitem")],
        )
        eng.compact(
            "f_lines", target_files_per_partition=8,
            cluster_by=["k", "p"], zorder=True,
        )
        files = glob.glob(os.path.join(wh, "f_lines", "year=*", "month=*",
                                       "*.parquet"))
        import pyarrow.parquet as pq

        spans = []
        for f in files:
            ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
            spans.append((min(ks), max(ks)))
        lo = min(a for a, _ in spans)
        hi = max(b for _, b in spans)
        mean_span = sum((b - a) for a, b in spans) / max(1, len(spans)) / max(
            1, hi - lo
        )
        print(
            f"z-ordered compaction: {len(files)} files, mean per-file k-span "
            f"= {mean_span:.2f} of domain (1.0 = no pruning possible)"
        )

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
