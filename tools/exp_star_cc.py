#!/usr/bin/env python
"""r14 task-1 experiment: measure the star-CC round structure on the
q_entity_resolution linkage graph (sf0.1 customer names).

1. per-round edge-multiset row count vs distinct count (dup factor)
   for the r13 no-dedup rounds;
2. paired in-session A/B of round-structure variants, best-of-N, both
   on a pre-materialized edge list (isolates CC cost) and end-to-end.

Iteration-only numbers (same host, same session, adjacent runs); the
recording of record stays bench.py's.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def star_cc(pairs: DataFrame, max_iter: int = 30, dedup_every: int = 0,
            probe_every: int = 1) -> DataFrame:
    """dedup_clusters_star with knobs: dedup_every=k dedups the edge
    multiset every k-th round (0 = never, the r13 shape; 1 = every
    round, the r12 shape); probe_every=k runs the convergence isEmpty
    probe only on every k-th round."""
    undirected = (
        pairs.select(
            F.least(F.col("id_a"), F.col("id_b")).alias("lo"),
            F.greatest(F.col("id_a"), F.col("id_b")).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    members = (
        undirected.select(F.col("lo").alias("doc"))
        .union(undirected.select("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def nbrs(e: DataFrame) -> DataFrame:
        return e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                )
            ).alias("p")
        ).select("p.u", "p.v")

    _w_u = Window.partitionBy("u")

    def with_min(nb: DataFrame, mx: bool = False) -> DataFrame:
        out = nb.withColumn("m", F.least(F.min("v").over(_w_u), F.col("u")))
        return out.withColumn("mx", F.max("v").over(_w_u)) if mx else out

    edges = undirected.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    nb = None
    for r in range(max_iter):
        nb = with_min(nbrs(edges), mx=True).localCheckpoint(eager=False)
        if (r % probe_every == probe_every - 1) and nb.filter(
            (F.col("m") != F.col("u")) & (F.col("mx") != F.col("m"))
        ).isEmpty():
            break
        large = nb.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
        nb2 = with_min(
            large.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                        F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                    )
                ).alias("p")
            ).select("p.u", "p.v")
        )
        selfs = nb2.groupBy("u").agg(F.min("m").alias("m"))
        small = (
            nb2.filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(selfs.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        edges = small.filter(F.col("a") != F.col("b"))
        if dedup_every and (r % dedup_every == dedup_every - 1):
            edges = edges.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            ).distinct()
    else:
        nb = with_min(nbrs(edges), mx=True).localCheckpoint(eager=False)
    keepers = nb.groupBy(F.col("u").alias("doc")).agg(F.min("m").alias("keeper"))
    return members.join(keepers, "doc", "left").select(
        "doc", F.coalesce(F.col("keeper"), F.col("doc")).alias("keeper")
    )


def main() -> None:
    from opl_spark.operators.dedup import dedup_clusters_star, fuzzy_link_edges
    from opl_spark.session import get_spark
    from opl_spark.sources import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-star-cc")
    cust = load_table(spark, sf_dir, "customer")
    pairs_lazy = fuzzy_link_edges(cust, "c_name").select(
        F.col("a").alias("id_a"), F.col("b").alias("id_b")
    )
    pairs = pairs_lazy.localCheckpoint(eager=True)
    n_pairs = pairs.count()
    print(f"edges from fuzzy_link_edges: {n_pairs}", file=sys.stderr)

    # --- 1. per-round multiset vs support (instrumented replay) -----
    und = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = und
    _w_u = Window.partitionBy("u")
    for r in range(12):
        nb = (
            edges.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                        F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
            .withColumn("m", F.least(F.min("v").over(_w_u), F.col("u")))
            .withColumn("mx", F.max("v").over(_w_u))
            .localCheckpoint(eager=False)
        )
        done = nb.filter(
            (F.col("m") != F.col("u")) & (F.col("mx") != F.col("m"))
        ).isEmpty()
        large = nb.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
        nb2 = (
            large.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                        F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
            .withColumn("m", F.least(F.min("v").over(_w_u), F.col("u")))
        )
        selfs = nb2.groupBy("u").agg(F.min("m").alias("m"))
        small = (
            nb2.filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(selfs.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        edges = small.filter(F.col("a") != F.col("b")).localCheckpoint(
            eager=True
        )
        rows = edges.count()
        support = edges.distinct().count()
        print(
            f"round {r}: converged={done} rows={rows} support={support} "
            f"dup_factor={rows / max(support, 1):.2f}",
            file=sys.stderr,
        )
        if done:
            break

    # --- 2. paired A/B over the materialized edge list --------------
    variants = {
        "r13_nodedup": dict(dedup_every=0, probe_every=1),
        "dedup_every2": dict(dedup_every=2, probe_every=1),
        "dedup_every1": dict(dedup_every=1, probe_every=1),
        "nodedup_probe2": dict(dedup_every=0, probe_every=2),
        "dedup2_probe2": dict(dedup_every=2, probe_every=2),
    }
    runs = int(os.environ.get("EXP_RUNS", "3"))
    import gc

    # reference output for identity checks
    ref = sorted(
        dedup_clusters_star(pairs).collect(), key=lambda r: r["doc"]
    )
    for name, kw in variants.items():
        out = sorted(star_cc(pairs, **kw).collect(), key=lambda r: r["doc"])
        same = out == ref
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            star_cc(pairs, **kw).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
        print(f"CC-only {name}: best={best:.3f}s identical={same}",
              file=sys.stderr)

    # --- 3. end-to-end (edge build included), current module form ---
    for tag, fn in (
        ("module_current", lambda: dedup_clusters_star(pairs_lazy)),
        ("e2e_dedup_every2",
         lambda: star_cc(pairs_lazy, dedup_every=2, probe_every=1)),
        ("e2e_dedup2_probe2",
         lambda: star_cc(pairs_lazy, dedup_every=2, probe_every=2)),
        ("e2e_nodedup",
         lambda: star_cc(pairs_lazy, dedup_every=0, probe_every=1)),
    ):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().select(
                F.col("doc").alias("name"), F.col("keeper").alias("canonical")
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
        print(f"E2E {tag}: best={best:.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
