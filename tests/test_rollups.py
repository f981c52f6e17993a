"""Aggregate-navigator tests: materialized rollup lattice + routing
must answer cube queries identically to the base engine (the routed
path is pre-aggregation, not approximation)."""

from __future__ import annotations

import pytest

from opl_spark.cube import CubeEngine
from opl_spark.facts import build_loans_fact, default_catalog
from opl_spark.rollups import RollupStore


@pytest.fixture(scope="module")
def navigator(spark, sf_dir, tmp_path_factory):
    engine = CubeEngine(default_catalog())
    engine.register_fact("loans2", build_loans_fact(spark, sf_dir))
    store = RollupStore(spark, str(tmp_path_factory.mktemp("lattice")))
    store.materialize(
        engine,
        "loans2",
        [
            ["year", "month"],
            ["year", "month", "day", "loan_type"],
            ["consortia_id", "consortia_label", "library_id", "year", "month", "day"],
        ],
    )
    return engine, store


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(cut="date:1996", drilldown="date", measure="value"),
        dict(cut="date:1996,10", drilldown="date:day", measure="value"),
        dict(drilldown="date", measure="value", aggregate="avg"),
        dict(drilldown="date|loan_type", measure="loans", aggregate="count"),
        dict(
            cut="loan_type:O",
            drilldown="organization_level:library_id",
            measure="value",
        ),
        dict(measure="value"),  # grand total, no drilldown
    ],
)
@pytest.mark.slow  # r14 slow tier
def test_routed_equals_base_engine(navigator, kwargs):
    engine, store = navigator
    base = engine.aggregate("loans2", **kwargs)
    routed = store.aggregate(engine, "loans2", **kwargs)
    assert routed.columns == base.columns
    assert _rows(routed) == _rows(base)


def test_route_picks_smallest_covering_rollup(navigator):
    engine, store = navigator
    hit = store.route("loans2", {"year", "month"})
    assert hit["cols"] == ["year", "month"]  # smallest covering
    hit2 = store.route("loans2", {"year", "month", "loan_type"})
    assert hit2["cols"] == ["year", "month", "day", "loan_type"]
    assert store.route("loans2", {"segment"}) is None


def test_non_derivable_aggregate_falls_back(navigator):
    engine, store = navigator
    base = engine.aggregate(
        "loans2", drilldown="date", measure="value", aggregate="median"
    )
    routed = store.aggregate(
        engine, "loans2", drilldown="date", measure="value", aggregate="median"
    )
    assert _rows(routed) == _rows(base)


def test_uncovered_query_falls_back(navigator):
    engine, store = navigator
    kwargs = dict(drilldown="segment", measure="value")
    base = engine.aggregate("loans2", **kwargs)
    routed = store.aggregate(engine, "loans2", **kwargs)
    assert _rows(routed) == _rows(base)


def test_refresh_equals_rematerialize(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from opl_spark.facts import build_loans_fact

    engine = CubeEngine(default_catalog())
    full = build_loans_fact(spark, sf_dir)
    old = full.filter(F.col("year") < 2000)
    delta = full.filter(F.col("year") >= 2000)

    engine.register_fact("loans2", old)
    store = RollupStore(spark, str(tmp_path / "lattice"))
    store.materialize(engine, "loans2", [["year", "month"], ["loan_type"]])
    store.refresh(engine, "loans2", delta)

    # reference: a lattice materialized from the full fact
    engine_full = CubeEngine(default_catalog())
    engine_full.register_fact("loans2", full)
    ref = RollupStore(spark, str(tmp_path / "lattice_full"))
    ref.materialize(engine_full, "loans2", [["year", "month"], ["loan_type"]])

    for key in ("year__month", "loan_type"):
        got = sorted(
            tuple(r)
            for r in spark.read.parquet(
                str(tmp_path / "lattice" / "loans2" / key)
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in spark.read.parquet(
                str(tmp_path / "lattice_full" / "loans2" / key)
            ).collect()
        )
        assert got == want, key
    # routed answers now include the delta
    engine.register_fact("loans2", full)  # base must match for fallback paths
    routed = store.aggregate(engine, "loans2", drilldown="date", measure="value")
    base = engine_full.aggregate("loans2", drilldown="date", measure="value")
    assert _rows(routed) == _rows(base)


def test_api_routes_through_lattice_identically(navigator):
    from opl_spark.api import OlapApi

    engine, store = navigator
    plain = OlapApi(engine)
    routed = OlapApi(engine, rollups=store)
    for params in (
        {"cut": "date:1996", "drilldown": "date", "measure": "value"},
        {"drilldown": "date|loan_type", "measure": "loans",
         "aggregate": "count", "output": "table"},
        {"cut": "date:2050", "drilldown": "date", "measure": "value"},  # empty
        # extension params bypass the lattice but must still answer
        {"drilldown": "date", "measure": "value", "top_n": "2"},
    ):
        a = plain.handle("/olap/loans2/aggregate", dict(params))
        b = routed.handle("/olap/loans2/aggregate", dict(params))
        assert a == b, params


def test_advise_recommends_covering_groupings(spark, sf_dir, tmp_path):
    """The lattice advisor: from a skewed query log it must (a) rank a
    grouping that covers the hot query shapes first, (b) estimate its
    rows below the fact's, and (c) hand back groupings that actually
    route those queries once materialized."""
    from opl_spark.rollups import RollupStore

    engine = CubeEngine(default_catalog())
    engine.register_fact("loans2", build_loans_fact(spark, sf_dir))
    store = RollupStore(spark, str(tmp_path / "lat"))
    log = (
        [{"cut": "date:1996", "drilldown": "date", "measure": "value"}] * 5
        + [{"drilldown": "date", "measure": "value", "aggregate": "avg"}] * 3
        + [{"cut": "loan_type:O", "drilldown": "loan_type", "measure": "value"}]
        + [{"drilldown": "date", "measure": "value", "aggregate": "median"}]
    )
    recs = store.advise(engine, "loans2", log, max_rollups=3)
    assert recs and len(recs) <= 3
    fact_rows = engine.frame("loans2").count()
    for r in recs:
        assert 0 < r["est_rows"] < fact_rows
        assert r["benefit"] > 0
    # greedy picks come back benefit-ranked, every DERIVABLE query
    # shape ends up covered by some pick, and the non-derivable median
    # query is never counted (9 derivable entries in the log)
    assert recs == sorted(recs, key=lambda r: -r["benefit"])
    assert sum(r["covers"] for r in recs) == len(log) - 1
    # materializing exactly the advice routes the hot query shape
    store.materialize(engine, "loans2", [r["cols"] for r in recs])
    for params in (
        dict(cut="date:1996", drilldown="date", measure="value"),
        dict(drilldown="date", measure="value", aggregate="avg"),
    ):
        routed = store.aggregate(engine, "loans2", **params)
        base = engine.aggregate("loans2", **params)
        assert _rows(routed) == _rows(base), params


@pytest.mark.slow  # r14 slow tier
def test_full_pinned_mix_routes_and_matches(spark, sf_dir, tmp_path):
    """r12 verdict task 5: the ENTIRE 10-shape pinned interactive mix
    (bench.py _LATENCY_SHAPES — every grammar surface the HTTP API
    serves, including share/having/top_n post-processing) must (a)
    route through an advise→materialize lattice, per-shape receipts
    included, and (b) answer identically to the base engine."""
    import bench

    engine = CubeEngine(default_catalog())
    engine.register_fact("loans2", build_loans_fact(spark, sf_dir))
    store = RollupStore(spark, str(tmp_path / "lattice"))
    picked = store.advise(
        engine, "loans2", bench._LATENCY_SHAPES, max_rollups=10
    )
    store.materialize(engine, "loans2", [p["cols"] for p in picked])

    receipts = {}
    for i, kw in enumerate(bench._LATENCY_SHAPES):
        receipts[i] = store.route_report(engine, "loans2", **kw)
        base = engine.aggregate("loans2", **kw)
        routed = store.aggregate(engine, "loans2", **kw)
        assert routed.columns == base.columns, (i, kw)
        assert _rows(routed) == _rows(base), (i, kw)
    unrouted = {i: r for i, r in receipts.items() if not r["routed"]}
    assert not unrouted, f"pinned-mix shapes not routed: {unrouted}"


def test_post_processing_rides_the_routed_result(navigator):
    """share/having/top_n on a ROUTED core must not silently fall back
    to the fact scan: the route_report stays routed (post params are
    report-sized), and results match the base engine."""
    engine, store = navigator
    kwargs = dict(
        cut="date:1996", drilldown="date", measure="value",
        share=True, having="value >= 0", top_n=3,
    )
    rep = store.route_report(engine, "loans2", **kwargs)
    assert rep["routed"], rep
    base = engine.aggregate("loans2", **kwargs)
    routed = store.aggregate(engine, "loans2", **kwargs)
    assert routed.columns == base.columns
    assert _rows(routed) == _rows(base)


def test_version_cache_pins_frame_and_checks_identity(navigator):
    """The request-path version cache keys on id(frame) — the entry
    must PIN the frame (so a collected frame's id can't be recycled to
    an unrelated one) and validate identity on hit, serving per-object
    versions even if two live frames ever shared an id slot."""
    engine, store = navigator
    f1 = engine.frame("loans2")
    v1 = store._fact_version_cached(f1)
    assert store._fact_version_cached(f1) == v1  # stable on re-ask
    ent = store._version_cache[id(f1)]
    assert ent[0] is f1 and ent[1] == v1  # the frame itself is pinned
    # a hit whose stored object is NOT the caller's frame must recompute
    f2 = f1.sparkSession.createDataFrame([(1,)], "x long")
    store._version_cache[id(f2)] = (f1, "stale-version")
    assert store._fact_version_cached(f2) != "stale-version"
