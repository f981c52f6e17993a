"""Aggregate navigator: a materialized rollup lattice over a fact
table, with transparent query routing.

The reference's single real optimization is materialized
pre-aggregation — the OLAP DB stores *query results* so API reads
never touch the production DB (SURVEY.md §4; reference `README.md:4`,
`library_olap/README.md:11`).  This module generalizes that design
point the way warehouse engines do: operators declare a small lattice
of groupings worth materializing; ``materialize`` writes one
pre-aggregated parquet table per grouping carrying RE-AGGREGABLE
partials (sum / non-null count / min / max per measure); ``aggregate``
answers a cube query from the smallest covering rollup and falls back
to the base fact when none covers (or the aggregate isn't derivable
from partials — median needs the raw values or a sketch).

At 100 TB this converts report-latency queries from fact-sized scans
to rollup-sized ones (dims × levels rows), which is exactly the
reference's architecture — kept, but now lattice-wide and
automatically routed.

Correctness: partials re-aggregate exactly for sum/count/min/max over
integral measures and over the engine's exact-decimal measure
convention; avg derives as sum/count from the same partials.  The
routed result is asserted equal to the base-engine result in
tests/test_rollups.py.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opl_spark.cube import CubeEngine, CubeQuery

#: Aggregates derivable from (sum, count, min, max) partials.
_DERIVABLE = ("sum", "avg", "count", "min", "max")


def _grouping_key(cols: list[str]) -> str:
    return "__".join(re.sub(r"[^A-Za-z0-9_]", "_", c) for c in cols)


def _fact_version(frame: DataFrame) -> str:
    """Content fingerprint of a fact frame's backing files: md5 over
    the sorted input-file list.  The snapshot model is append-only
    (appends add files; ``compact`` swaps directories), so any ingest
    changes the listing — and therefore this token.  A driver-side
    metadata call (the file index is already resolved); no data scan.
    """
    import hashlib

    return hashlib.md5("\n".join(sorted(frame.inputFiles())).encode()).hexdigest()


class RollupStore:
    """Materialized-rollup registry for one warehouse directory.

    Layout: ``<base>/<fact>/<grouping_key>/`` parquet per rollup plus
    ``<base>/<fact>/_LATTICE.json`` recording each rollup's grouping
    columns, row count, and per-measure fractional-ness (needed to
    reproduce the engine's canonical sum/min/max emission typing).
    """

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        # request-path caches (r13): a routed aggregate is interactive —
        # re-reading the manifest JSON, re-resolving every rollup's
        # parquet file index, and re-listing the fact's input files on
        # EVERY request cost more than the routed scan saved.  The
        # manifest cache keys on the file's mtime (a re-materialize —
        # this process or another — rewrites it, invalidating both
        # caches); the frame cache keys on the manifest identity; the
        # fact-version cache keys on the registered frame OBJECT, whose
        # resolved file index is immutable (a re-registration is a new
        # object and SnapshotEngine appends re-register).
        self._manifest_cache: dict[str, tuple[float, dict]] = {}
        self._frame_cache: dict[tuple, DataFrame] = {}
        self._version_cache: dict[int, tuple[DataFrame, str]] = {}

    def _fact_dir(self, fact: str) -> str:
        return os.path.join(self.base_dir, fact)

    def _manifest_path(self, fact: str) -> str:
        return os.path.join(self._fact_dir(fact), "_LATTICE.json")

    def _load_manifest(self, fact: str) -> dict:
        path = self._manifest_path(fact)
        try:
            mtime = os.stat(path).st_mtime_ns
        except FileNotFoundError:
            return {"rollups": {}, "measures": {}}
        hit = self._manifest_cache.get(fact)
        if hit is not None and hit[0] == mtime:
            return hit[1]
        with open(path) as fh:
            manifest = json.load(fh)
        self._manifest_cache[fact] = (mtime, manifest)
        # manifest changed on disk → any cached rollup frames list files
        # a re-materialize may have replaced
        self._frame_cache = {
            k: v for k, v in self._frame_cache.items() if k[0] != fact
        }
        return manifest

    def _rollup_frame(self, fact: str, key: str, version) -> DataFrame:
        ck = (fact, key, version)
        df = self._frame_cache.get(ck)
        if df is None:
            df = self.spark.read.parquet(os.path.join(self._fact_dir(fact), key))
            self._frame_cache[ck] = df
        return df

    def _fact_version_cached(self, frame: DataFrame) -> str:
        # the registered frame is a long-lived object in the engine's
        # registry; a re-registration (how appends become visible) is a
        # NEW object and naturally misses this cache.  The entry PINS
        # the frame it describes: an id()-only key could be recycled by
        # the allocator after the old frame is collected and would then
        # serve the dead frame's version to an unrelated one
        key = id(frame)
        hit = self._version_cache.get(key)
        if hit is not None and hit[0] is frame:
            return hit[1]
        v = _fact_version(frame)
        self._version_cache[key] = (frame, v)
        return v

    # -- build --------------------------------------------------------------

    def materialize(
        self, engine: CubeEngine, fact: str, groupings: list[list[str]]
    ) -> dict:
        """Write one partial-aggregate parquet per grouping (columns
        are PHYSICAL fact columns — include every hierarchy level you
        want cuttable/drillable through the rollup).  Re-running
        overwrites; for append-only deltas :meth:`refresh` maintains
        the lattice incrementally instead."""
        meta = engine.catalog.fact(fact)
        base = engine.frame(fact)
        partials = []
        measures_info = {}
        for m in meta.measures:
            col = F.col(m.physical)
            frac = isinstance(base.schema[m.physical].dataType, T.FractionalType)
            measures_info[m.name] = {"fractional": frac, "physical": m.physical}
            partials += [
                F.sum(col).alias(f"__sum_{m.name}"),
                F.count(col).alias(f"__cnt_{m.name}"),
                F.min(col).alias(f"__min_{m.name}"),
                F.max(col).alias(f"__max_{m.name}"),
            ]
        manifest = self._load_manifest(fact)
        manifest["measures"] = measures_info
        # staleness guard: record WHICH fact files these rollups were
        # aggregated from; route() refuses the lattice when the live
        # fact has since gained files (see aggregate below)
        manifest["fact_version"] = _fact_version(base)
        for cols in groupings:
            key = _grouping_key(cols)
            rolled = base.groupBy(*cols).agg(*partials)
            path = os.path.join(self._fact_dir(fact), key)
            rolled.write.mode("overwrite").parquet(path)
            rows = self.spark.read.parquet(path).count()
            manifest["rollups"][key] = {"cols": cols, "rows": rows}
        os.makedirs(self._fact_dir(fact), exist_ok=True)
        with open(self._manifest_path(fact), "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        return manifest

    def _needed_cols(self, engine, meta, q) -> tuple[list[str], set[str]]:
        """The physical columns a cube query needs a rollup to carry:
        compiled cut hierarchy columns plus resolved drilldown group
        columns.  Cuts compile against the (lazy) base frame — cut
        depths feed the below-cut drilldown-resolution rule, exactly
        as in CubeEngine.aggregate; the compiled conditions stay on
        the query's cut terms for recompilation after routing."""
        base_frame = engine.frame(meta.name)
        cut_cols: set[str] = set()
        for t in q.cut_terms:
            dim = meta.dimension(t.dimension)
            t.condition, t.depth = engine._compile_cut(
                base_frame, dim, t.spec, q.hierarchy_by_dim.get(t.dimension)
            )
            order = dim.hierarchy_order(q.hierarchy_by_dim.get(t.dimension))
            for lv in order:
                cut_cols.add(dim.level(lv).physical)
        group_cols = engine._resolve_drilldown(base_frame, q)
        return group_cols, set(group_cols) | cut_cols

    def advise(
        self,
        engine: CubeEngine,
        fact: str,
        query_log: list[dict],
        max_rollups: int = 3,
        max_candidates: int = 64,
    ) -> list[dict]:
        """Lattice ADVISOR — the classic companion to materialized
        pre-aggregation (cf. SQL Server's Database Tuning Advisor /
        Harinarayan et al. 1996 "Implementing Data Cubes
        Efficiently"): given a log of aggregate-request params, rank
        which groupings to ``materialize``.

        A candidate grouping is each distinct needed-column set in the
        log; it covers every logged query whose needed set it
        contains.  Candidate cardinalities come from ONE distributed
        pass (a single aggregate of ``approx_count_distinct`` over
        each candidate's column struct — never one job per candidate),
        and selection is the greedy benefit rule: pick the grouping
        with the largest Σ frequency × (fact_rows − est_rows) over
        still-uncovered queries, ``max_rollups`` times.  Returns
        ``[{cols, est_rows, covers, benefit}]``, materialize-ready.

        Driver state is candidate-set-sized (distinct query shapes in
        the log), never data-sized.  A log with more than
        ``max_candidates`` distinct shapes keeps the most frequent
        ones (one aggregate expression per candidate goes into the
        single estimation pass — unbounded shapes would bloat that
        plan); the trim is explicit, not silent: trimmed shapes still
        COUNT toward the covers/benefit of any kept candidate that
        contains them, they just can't be recommended themselves."""
        meta = engine.catalog.fact(fact)
        shapes: dict[frozenset, int] = {}
        for params in query_log:
            q = CubeQuery(
                fact=meta,
                cut=params.get("cut"),
                drilldown=params.get("drilldown"),
                measure=params.get("measure"),
                aggregate=params.get("aggregate"),
                hierarchy=params.get("hierarchy"),
            )
            agg = params.get("aggregate")
            if agg is not None and agg not in _DERIVABLE:
                continue  # can never route — no rollup helps it
            _, needed = self._needed_cols(engine, meta, q)
            key = frozenset(needed)
            shapes[key] = shapes.get(key, 0) + 1
        ranked_shapes = sorted(
            (s for s in shapes if s), key=lambda s: -shapes[s]
        )
        candidates = [sorted(s) for s in ranked_shapes[:max_candidates]]
        if not candidates:
            return []
        base = engine.frame(fact)
        est_row = base.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.approx_count_distinct(F.struct(*cols)).alias(f"__c{i}")
                for i, cols in enumerate(candidates)
            ],
        ).first()
        fact_rows = est_row["__n"]
        est = {
            frozenset(cols): est_row[f"__c{i}"]
            for i, cols in enumerate(candidates)
        }
        uncovered = dict(shapes)
        picked: list[dict] = []
        while uncovered and len(picked) < max_rollups:
            best, best_benefit, best_covers = None, 0, 0
            for cols in candidates:
                cset = frozenset(cols)
                covers = [s for s in uncovered if s <= cset]
                benefit = sum(
                    uncovered[s] * max(fact_rows - est[cset], 0) for s in covers
                )
                if benefit > best_benefit:
                    best, best_benefit = cset, benefit
                    best_covers = sum(uncovered[s] for s in covers)
            if best is None:
                break
            picked.append(
                {
                    "cols": sorted(best),
                    "est_rows": int(est[best]),
                    "covers": best_covers,
                    "benefit": int(best_benefit),
                }
            )
            for s in [s for s in uncovered if s <= best]:
                del uncovered[s]
        return picked

    # -- route + answer -----------------------------------------------------

    def route(
        self, fact: str, needed_cols: set[str], current_version: str | None = None
    ) -> dict | None:
        """Smallest (by materialized row count) rollup whose grouping
        covers every needed column; None when nothing covers.

        ``current_version`` (a :func:`_fact_version` token of the LIVE
        fact frame) arms the staleness guard: when it differs from the
        version recorded at materialize/refresh time — new snapshot
        files appended since — every rollup is stale and nothing
        routes, so callers transparently fall back to the live engine
        instead of serving pre-ingest aggregates.  A manifest without
        a recorded version (pre-guard lattice) is treated as stale for
        the same reason.  Pass ``None`` to skip the check (trusted
        contexts, e.g. a freshness-managed refresh loop)."""
        manifest = self._load_manifest(fact)
        if current_version is not None and manifest.get("fact_version") != current_version:
            return None
        best = None
        for key, info in manifest["rollups"].items():
            if needed_cols <= set(info["cols"]):
                if best is None or info["rows"] < best["rows"]:
                    best = {"key": key, **info}
        return best

    def _route_plan(
        self,
        engine: CubeEngine,
        fact: str,
        cut: str | None,
        drilldown: str | None,
        measure: str | None,
        aggregate: str | None,
        hierarchy: str | None,
    ):
        """Shared routing decision: ``(q, plan, group_cols, hit)`` when
        a rollup covers the core of the request and every aggregate
        derives from partials, else ``(q, None, None, reason)`` —
        consumed by :meth:`aggregate` (to answer) and
        :meth:`route_report` (to explain)."""
        meta = engine.catalog.fact(fact)
        q = CubeQuery(
            fact=meta,
            cut=cut,
            drilldown=drilldown,
            measure=measure,
            aggregate=aggregate,
            hierarchy=hierarchy,
        )
        names = (
            [n.strip() for n in measure.split("|")]
            if measure
            else [meta.default_measure.name]
        )
        plan = []
        manifest = self._load_manifest(fact)
        for n in names:
            m = meta.measure(n)
            agg = aggregate or m.default_aggregate
            info = manifest["measures"].get(m.name)
            if agg not in _DERIVABLE or agg not in m.aggregates or info is None:
                return q, None, None, f"aggregate {agg!r} not derivable"
            plan.append((m, agg, info["fractional"]))
        group_cols, needed = self._needed_cols(engine, meta, q)
        hit = self.route(
            fact, needed, self._fact_version_cached(engine.frame(fact))
        )
        if hit is None:
            return q, None, None, f"no rollup covers {sorted(needed)}"
        return q, plan, group_cols, hit

    def route_report(self, engine: CubeEngine, fact: str, **params) -> dict:
        """Routedness evidence for one request shape: which rollup (if
        any) would answer it and why not otherwise — the per-shape
        receipt the latency recording (bench.py --latency) commits.
        Post-aggregation params (top_n/having/share…) never block
        routing (they apply to the report-sized routed result), so
        only the core params participate."""
        core = {
            k: params.get(k)
            for k in ("cut", "drilldown", "measure", "aggregate", "hierarchy")
        }
        _, plan, _, hit = self._route_plan(engine, fact, **core)
        if plan is None:
            return {"routed": False, "rollup": None, "reason": hit}
        return {"routed": True, "rollup": hit["key"], "rows": hit["rows"]}

    def aggregate(
        self,
        engine: CubeEngine,
        fact: str,
        cut: str | None = None,
        drilldown: str | None = None,
        measure: str | None = None,
        aggregate: str | None = None,
        hierarchy: str | None = None,
        top_n: int | None = None,
        top_within: str | None = None,
        having: str | None = None,
        share: bool = False,
        share_within: str | None = None,
    ) -> DataFrame:
        """`CubeEngine.aggregate`, answered from the lattice when a
        rollup covers the query's cut + drilldown columns and every
        requested aggregate derives from partials — else the base
        engine, transparently (same output either way).

        Post-aggregation extensions (r12 verdict task 5) ride the
        routed result: ``share``/``having``/``top_n`` are well-defined
        on the re-aggregated report (the exact same dims × levels rows
        the base engine post-processes), so they reuse CubeEngine's
        post-processing in the same order — share → having → top —
        instead of forcing the whole request back to the fact scan.
        Equality with the base engine across the full pinned request
        mix is asserted in tests/test_rollups.py."""
        q, plan, group_cols, hit = self._route_plan(
            engine, fact, cut, drilldown, measure, aggregate, hierarchy
        )
        if plan is None:
            return engine.aggregate(
                fact,
                cut=cut,
                drilldown=drilldown,
                measure=measure,
                aggregate=aggregate,
                hierarchy=hierarchy,
                top_n=top_n,
                top_within=top_within,
                having=having,
                share=share,
                share_within=share_within,
            )
        meta = q.fact

        rdf = self._rollup_frame(
            fact, hit["key"], self._load_manifest(fact).get("fact_version")
        )
        for t in q.cut_terms:
            dim = meta.dimension(t.dimension)
            cond, _ = engine._compile_cut(
                rdf, dim, t.spec, q.hierarchy_by_dim.get(t.dimension)
            )
            rdf = rdf.filter(cond)

        exprs = []
        for m, agg, fractional in plan:
            if agg == "sum":
                e = F.sum(f"__sum_{m.name}")
                if fractional:
                    e = F.round(e.cast("double"), 2)
            elif agg == "count":
                e = F.sum(f"__cnt_{m.name}")
            elif agg == "avg":
                e = F.round(
                    F.sum(f"__sum_{m.name}").cast("double")
                    / F.sum(f"__cnt_{m.name}"),
                    6,
                )
            elif agg == "min":
                e = F.min(f"__min_{m.name}")
                if fractional:
                    e = F.round(e.cast("double"), 2)
            else:  # max
                e = F.max(f"__max_{m.name}")
                if fractional:
                    e = F.round(e.cast("double"), 2)
            exprs.append(e.alias(m.name))
        out = (
            rdf.groupBy(*group_cols).agg(*exprs)
            if group_cols
            else rdf.agg(*exprs)
        )
        # post-processing mirrors CubeEngine.aggregate exactly:
        # share → having → top_n, then the deterministic ordering
        if share or share_within:
            out = CubeEngine._apply_share(out, len(group_cols), share_within)
        if having:
            out = out.filter(
                CubeEngine._compile_having(out, len(group_cols), having)
            )
        if top_n is not None:
            out = CubeEngine._apply_top(
                out, len(group_cols), int(top_n), top_within
            )
        if not group_cols:
            return out
        return out.orderBy(*out.columns[: len(group_cols)])


    # -- maintenance --------------------------------------------------------

    def refresh(self, engine: CubeEngine, fact: str, delta: DataFrame) -> dict:
        """Incremental lattice maintenance for APPEND-ONLY deltas (the
        engine's snapshot model): each rollup gets the delta's partials
        unioned in and re-reduced — sums/counts re-add, min/min and
        max/max re-reduce, all reassociative, so the refreshed rollup
        equals a full re-materialize over base ∪ delta at the cost of
        one delta-sized aggregation per rollup (asserted in
        tests/test_rollups.py).  Updates/deletes need re-materialize —
        min/max partials are not subtractable.

        Same write-to-temp + two-rename swap as ``snapshot.compact``:
        a crash mid-write leaves the live rollup intact.
        """
        meta = engine.catalog.fact(fact)
        manifest = self._load_manifest(fact)
        delta_partials = []
        for m in meta.measures:
            col = F.col(m.physical)
            delta_partials += [
                F.sum(col).alias(f"__sum_{m.name}"),
                F.count(col).alias(f"__cnt_{m.name}"),
                F.min(col).alias(f"__min_{m.name}"),
                F.max(col).alias(f"__max_{m.name}"),
            ]
        re_reduce = []
        for m in meta.measures:
            re_reduce += [
                F.sum(f"__sum_{m.name}").alias(f"__sum_{m.name}"),
                F.sum(f"__cnt_{m.name}").alias(f"__cnt_{m.name}"),
                F.min(f"__min_{m.name}").alias(f"__min_{m.name}"),
                F.max(f"__max_{m.name}").alias(f"__max_{m.name}"),
            ]
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        for key, info in manifest["rollups"].items():
            cols = info["cols"]
            path = os.path.join(self._fact_dir(fact), key)
            d = delta.groupBy(*cols).agg(*delta_partials)
            merged = (
                self.spark.read.parquet(path)
                .unionByName(d)
                .groupBy(*cols)
                .agg(*re_reduce)
            )
            tmp, old = path + "__refreshing", path + "__old"
            merged.write.mode("overwrite").parquet(tmp)
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(conf)
            htmp = jvm.org.apache.hadoop.fs.Path(tmp)
            hold = jvm.org.apache.hadoop.fs.Path(old)
            if not fs.rename(hpath, hold):
                raise IOError(f"rollup refresh: rename {path} -> {old} failed")
            if not fs.rename(htmp, hpath):
                fs.rename(hold, hpath)
                raise IOError(f"rollup refresh: rename {tmp} -> {path} failed")
            fs.delete(hold, True)
            info["rows"] = self.spark.read.parquet(path).count()
        # the refreshed rollups now cover base ∪ delta: re-stamp the
        # version from the engine's CURRENT fact frame so route()'s
        # staleness guard accepts them again.  Contract: refresh runs
        # AFTER the delta landed in the fact table and the engine's
        # registered frame reflects it (register a fresh frame post-
        # append) — else the stamp records the pre-append listing and
        # the guard keeps falling back until the next materialize.
        manifest["fact_version"] = _fact_version(engine.frame(fact))
        with open(self._manifest_path(fact), "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        return manifest
