"""The HTTP layer serves exactly what ``OlapApi.handle`` computes:
every route from the reference API spec (api-library-olap/
README.md:3-13), replayed over a real socket, must be byte-identical
to the direct library call — the five recorded Data Studio getData
traces (DataStudio-connector/Codice.gs:239-254) included."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from opl_spark.api import OlapApi
from opl_spark.connector import synthesize_request
from opl_spark.cube import CubeEngine
from opl_spark.facts import (
    ACTIVE_USERS_SQL,
    build_general_indexes_fact,
    build_loans_fact,
    build_patrimonio_fact,
    default_catalog,
)
from opl_spark.server import OlapHttpServer, encode_response


@pytest.fixture(scope="module")
def api(spark, sf_dir, tmp_path_factory):
    eng = CubeEngine(default_catalog())
    eng.register_fact("loans2", build_loans_fact(spark, sf_dir))
    eng.register_fact("general_indexes", build_general_indexes_fact(spark, sf_dir))
    from opl_spark.facts import build_accessions_fact
    eng.register_fact("accessions", build_accessions_fact(spark, sf_dir))
    eng.register_fact("patrimonio", build_patrimonio_fact(spark, sf_dir))
    from opl_spark.snapshot import FactQuery, SnapshotEngine
    from opl_spark.sources import register_sources

    register_sources(spark, sf_dir)
    snap = SnapshotEngine(spark, str(tmp_path_factory.mktemp("http_wh")))
    snap.run(
        "1998-06-01", [FactQuery(1, "enabled_users", ACTIVE_USERS_SQL, cron="daily")]
    )
    eng.register_fact("enabled_users", snap.fact_frame("enabled_users"))
    return OlapApi(eng)


@pytest.fixture(scope="module")
def server(api):
    with OlapHttpServer(api) as srv:  # port=0 → ephemeral
        yield srv


def _get(server, path, params=None):
    url = f"http://127.0.0.1:{server.port}{path}"
    if params:
        url += "?" + urllib.parse.urlencode(params)
    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.status, resp.read()


# the five recorded getData traces, adapted exactly as
# tests/test_connector_replay.py documents
TRACES = [
    ("loans2", ["consortia_label", "value", "month", "year"], "1996-04-25", "1996-05-22"),
    ("loans2", ["consortia_label", "date", "library_id", "value"], "1996-04-26", "1996-05-23"),
    ("enabled_users", ["library_id", "value"], "1998-06-01", "1998-06-01"),
    ("general_indexes", ["apertura_mattutina", "date", "library_class"], "1996-05-10", "1996-06-06"),
    ("patrimonio", ["consortia_id", "value"], "1996-05-20", "1996-06-16"),
]


@pytest.mark.parametrize("fact,fields,start,end", TRACES)
def test_trace_over_http_byte_identical(api, server, fact, fields, start, end):
    path, params = synthesize_request(api.catalog, fact, fields, start, end)
    status, body = _get(server, path, params)
    assert status == 200
    assert body == encode_response(api.handle(path, params))
    # and it is a real table payload: header row + data rows
    table = json.loads(body)
    assert isinstance(table, list) and len(table) >= 2


def test_metadata_routes_byte_identical(api, server):
    for path in (
        "/olap/fact_tables",
        "/olap/loans2/dimensions",
        "/olap/loans2/measures",
    ):
        status, body = _get(server, path)
        assert status == 200
        assert body == encode_response(api.handle(path, {}))


def test_aggregate_json_and_empty_marker(api, server):
    params = {"cut": "loan_type:O", "drilldown": "date", "measure": "value"}
    status, body = _get(server, "/olap/loans2/aggregate", params)
    assert status == 200
    assert body == encode_response(api.handle("/olap/loans2/aggregate", params))
    assert json.loads(body)["data"]
    # a cut matching nothing returns the connector's zero-fill marker
    # (Codice.gs:361-373)
    none = {"cut": "loan_type:ZZZ_NO_SUCH", "drilldown": "date"}
    status, body = _get(server, "/olap/loans2/aggregate", none)
    assert status == 200
    assert json.loads(body) == {"message": "empty_dataset"}


def test_top_n_params_over_http(api, server):
    params = {
        "drilldown": "organization_level:library_id",
        "measure": "value",
        "top_n": "3",
        "top_within": "consortia_id",
    }
    status, body = _get(server, "/olap/loans2/aggregate", params)
    assert status == 200
    assert body == encode_response(api.handle("/olap/loans2/aggregate", params))
    data = json.loads(body)["data"]
    per = {}
    for row in data:
        per[row["consortia_id"]] = per.get(row["consortia_id"], 0) + 1
    assert per and all(v <= 3 for v in per.values())


def test_unknown_routes_are_404(server):
    for path in ("/olap/nope", "/not_olap", "/olap/loans2/nope"):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(server, path)
        assert exc.value.code == 404
        assert "error" in json.loads(exc.value.read())


def test_engine_errors_are_reported_not_empty_200(server):
    # unknown dimension -> KeyError -> 404; other engine errors -> 400.
    # Either way the failure must surface, never an empty 200.
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server, "/olap/loans2/aggregate", {"cut": "no_such_dim:1"})
    assert exc.value.code in (400, 404)
    assert "error" in json.loads(exc.value.read())


def test_bad_parameter_is_400_unknown_fact_is_404(server):
    """A malformed query PARAMETER (unknown having column) must come
    back 400 — the route exists, the request is bad — while an unknown
    FACT on a real route stays 404."""
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server, "/olap/loans2/aggregate",
             {"drilldown": "organization_level", "measure": "value",
              "having": "bogus>=1"})
    assert exc.value.code == 400
    assert "error" in json.loads(exc.value.read())
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server, "/olap/no_such_fact/aggregate", {"measure": "value"})
    assert exc.value.code == 404


def test_share_params_over_http(server):
    """share/share_within ride the HTTP surface like top_n/having."""
    status, body = _get(
        server, "/olap/loans2/aggregate",
        {"drilldown": "organization_level", "measure": "value", "share": "true"},
    )
    assert status == 200
    rows = json.loads(body)["data"]
    assert rows and abs(sum(r["value_share"] for r in rows) - 1.0) < 1e-4


def test_drill_across_over_http(server):
    status, body = _get(
        server, "/olap/drill_across",
        {"facts": "loans2,accessions", "drilldown": "organization_level"},
    )
    assert status == 200
    rows = json.loads(body)["data"]
    assert rows and "value_loans2" in rows[0] and "accessions_accessions" in rows[0]


def test_explain_over_http(server):
    """/olap/<fact>/explain returns the pre-flight cost preview for
    the same request grammar as aggregate — counts present, nothing
    negative, no scale flags on a core cube query."""
    status, body = _get(
        server, "/olap/loans2/explain",
        {"drilldown": "organization_level", "measure": "value",
         "cut": "date:2016"},
    )
    assert status == 200
    rep = json.loads(body)
    for k in ("n_shuffles", "n_scans", "n_plan_ops", "est_scan_bytes"):
        assert rep[k] >= 0, rep
    assert rep["n_scans"] >= 1
    assert rep["scale_flags"] == []
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server, "/olap/no_such_fact/explain", {"measure": "value"})
    assert exc.value.code == 404


@pytest.fixture(scope="module")
def routed_server(spark, sf_dir, tmp_path_factory):
    """An OlapApi WITH a rollup lattice behind it — the steady-state
    serving configuration the reference architecture implies (OLAP DB
    = materialized query results; reference README.md:4)."""
    from opl_spark.rollups import RollupStore

    engine = CubeEngine(default_catalog())
    engine.register_fact("loans2", build_loans_fact(spark, sf_dir))
    store = RollupStore(spark, str(tmp_path_factory.mktemp("latency_lattice")))
    store.materialize(
        engine,
        "loans2",
        [["year", "month"], ["year", "month", "day", "loan_type"]],
    )
    api = OlapApi(engine, rollups=store)
    with OlapHttpServer(api) as srv:
        yield api, store, srv


AGG_PARAMS = {"cut": "date:1996", "drilldown": "date", "measure": "value"}


def test_aggregate_routes_through_lattice_and_breaking_it_shows(routed_server):
    """The routedness pin behind the latency guard: a core aggregate's
    plan must scan the materialized lattice parquet, NOT the base
    fact; with routing deliberately broken the lattice scan disappears
    — proving the assertion actually trips on a routing regression."""
    from opl_spark.plans.inspect import formatted_plan

    api, store, _ = routed_server
    df = api._build_aggregate_df("loans2", dict(AGG_PARAMS))
    assert "latency_lattice" in formatted_plan(df), (
        "core aggregate did not route through the rollup lattice"
    )
    orig = store.route
    try:
        store.route = lambda *a, **k: None  # deliberately broken routing
        # out-of-band routing change: the plan cache can't see it (the
        # cache key covers fact/frame-version/params — results would be
        # identical either way), so this white-box probe clears it
        api.clear_plan_cache()
        broken = api._build_aggregate_df("loans2", dict(AGG_PARAMS))
        assert "latency_lattice" not in formatted_plan(broken)
    finally:
        store.route = orig
        api.clear_plan_cache()


def test_http_aggregate_latency_guard(routed_server):
    """Latency guard for the interactive surface (the reference's
    /olap/<fact>/aggregate, api-library-olap/README.md:16-19): the
    routed round trip must stay interactive.  Bounds are generous
    (host-jitter-safe) — a plan regression that turns the routed
    rollup read back into per-request fact aggregation or loses the
    scan pruning shows up as a multiple, not a percentage: cold
    (first-touch parquet footer + codegen) < 10 s, warm median of 5
    < 1.5 s."""
    import statistics
    import time

    _, _, srv = routed_server
    t0 = time.perf_counter()
    status, body = _get(srv, "/olap/loans2/aggregate", AGG_PARAMS)
    cold = time.perf_counter() - t0
    assert status == 200 and json.loads(body)["data"]
    assert cold < 10.0, f"cold routed aggregate took {cold:.2f}s"

    warm = []
    for _ in range(5):
        t0 = time.perf_counter()
        status, body = _get(srv, "/olap/loans2/aggregate", AGG_PARAMS)
        warm.append(time.perf_counter() - t0)
        assert status == 200 and json.loads(body)["data"]
    med = statistics.median(warm)
    assert med < 1.5, f"warm routed aggregate median {med:.2f}s ({warm})"


def test_aggregate_concurrent_requests_match_sequential(server):
    """8 concurrent /aggregate requests with distinct shapes must each
    return exactly the bytes the same request produces sequentially —
    Spark actions interleave on one session; no cross-talk, no
    partial results (the serving-layer twin of the /explain race
    regression test)."""
    from concurrent.futures import ThreadPoolExecutor

    shapes = [
        {"cut": "loan_type:O", "drilldown": "date", "measure": "value"},
        {"drilldown": "organization_level", "measure": "value"},
        {"drilldown": "date", "measure": "loans", "aggregate": "count"},
        {"drilldown": "organization_level", "measure": "value",
         "share": "true"},
    ]
    sequential = []
    for params in shapes:
        status, body = _get(server, "/olap/loans2/aggregate", params)
        assert status == 200
        sequential.append(body)
    assert len(set(sequential)) == len(shapes)

    jobs = [shapes[i % len(shapes)] for i in range(8)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(
            pool.map(
                lambda p: _get(server, "/olap/loans2/aggregate", p), jobs
            )
        )
    for i, (status, body) in enumerate(results):
        assert status == 200
        assert body == sequential[i % len(shapes)], (
            f"concurrent /aggregate diverged for shape {i % len(shapes)}"
        )


def test_explain_concurrent_requests_get_their_own_plans(server):
    """Regression for the r4 probe-view race (plans/inspect.py uses a
    per-call uuid view name): 8 concurrent /explain requests with
    distinct query shapes must each come back with exactly the report
    the same request produces sequentially — no cross-talk, no
    view-stomp errors."""
    from concurrent.futures import ThreadPoolExecutor

    shapes = [
        ("loans2", {"drilldown": "organization_level", "measure": "value"}),
        ("loans2", {"drilldown": "date", "measure": "value",
                    "cut": "date:2016"}),
        ("loans2", {"measure": "value", "top_n": "3",
                    "drilldown": "library_id"}),
        ("general_indexes", {"drilldown": "library_class",
                             "measure": "apertura_mattutina"}),
    ]
    sequential = []
    for fact, params in shapes:
        status, body = _get(server, f"/olap/{fact}/explain", params)
        assert status == 200
        sequential.append(json.loads(body))
    # distinct shapes should differ somewhere, or equality proves nothing
    assert len({json.dumps(r, sort_keys=True) for r in sequential}) > 1

    jobs = [shapes[i % len(shapes)] for i in range(8)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(
            pool.map(
                lambda fp: _get(server, f"/olap/{fp[0]}/explain", fp[1]), jobs
            )
        )
    for i, (status, body) in enumerate(results):
        assert status == 200
        assert json.loads(body) == sequential[i % len(shapes)], (
            "concurrent /explain response diverged from its sequential "
            f"reference for shape {i % len(shapes)}"
        )


def test_cached_plan_survives_inplace_rollup_rematerialization(
    spark, sf_dir, tmp_path
):
    """Poisoned-plan self-heal (code review r11): `-c materialize`
    from another process overwrites the lattice parquet IN PLACE,
    deleting the part files a cached plan's index lists.  The next
    request for that shape must evict, rebuild (the rollup path lists
    files fresh per build), and answer — not 400 until restart."""
    from opl_spark.rollups import RollupStore

    engine = CubeEngine(default_catalog())
    engine.register_fact("loans2", build_loans_fact(spark, sf_dir))
    store = RollupStore(spark, str(tmp_path / "lattice"))
    groupings = [["year", "month", "day", "loan_type"]]
    store.materialize(engine, "loans2", groupings)
    api = OlapApi(engine, rollups=store)

    before = api.handle("/olap/loans2/aggregate", dict(AGG_PARAMS))
    assert before.get("data")
    # the in-place overwrite another session would run
    store.materialize(engine, "loans2", groupings)
    after = api.handle("/olap/loans2/aggregate", dict(AGG_PARAMS))
    assert after == before

def _rss_kb(pid) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def test_serve_daemon_endurance_soak(spark, sf_dir, tmp_path_factory):
    """r11 verdict task 4: the threaded server + plan cache are new —
    soak them.  8 client threads × 500 mixed aggregate / drill_across /
    explain requests against a warm rollup-routed warehouse, with the
    plan cache sized BELOW the shape mix so every request cycle churns
    evictions.  Asserts (a) byte-identity of every response against
    the serial answer, (b) the cache never exceeds its entry bound —
    the plan cache pins DataFrames, so an unbounded map is a leak by
    construction — and (c) driver-process RSS growth stays bounded on
    both sides of py4j (generous bounds: a real leak of 4000 pinned
    plans is a multiple, host jitter is a percentage)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from opl_spark.facts import build_accessions_fact
    from opl_spark.rollups import RollupStore

    engine = CubeEngine(default_catalog())
    engine.register_fact("loans2", build_loans_fact(spark, sf_dir))
    engine.register_fact("accessions", build_accessions_fact(spark, sf_dir))
    store = RollupStore(spark, str(tmp_path_factory.mktemp("soak_lattice")))
    store.materialize(
        engine,
        "loans2",
        [["year", "month"], ["year", "month", "day", "loan_type"]],
    )
    api = OlapApi(engine, rollups=store, plan_cache_size=8)

    # 22 distinct shapes > 8 cache slots -> continuous eviction churn
    shapes = []
    for year in ("1996", "1997"):
        for dd in ("date", "organization_level", "loan_type"):
            shapes.append(("/olap/loans2/aggregate",
                           {"cut": f"date:{year}", "drilldown": dd,
                            "measure": "value"}))
            shapes.append(("/olap/loans2/explain",
                           {"cut": f"date:{year}", "drilldown": dd,
                            "measure": "value"}))
    for dd in ("date", "organization_level"):
        shapes.append(("/olap/loans2/aggregate",
                       {"drilldown": dd, "measure": "loans",
                        "aggregate": "count"}))
        shapes.append(("/olap/loans2/aggregate",
                       {"drilldown": dd, "measure": "value", "share": "true"}))
    shapes.append(("/olap/drill_across",
                   {"facts": "loans2,accessions", "drilldown": "date"}))
    shapes.append(("/olap/drill_across",
                   {"facts": "loans2,accessions",
                    "drilldown": "organization_level"}))
    assert len(shapes) == 18  # > 2x the 8 cache slots — steady eviction

    with OlapHttpServer(api) as srv:
        serial = []
        for path, params in shapes:
            status, body = _get(srv, path, params)
            assert status == 200, (path, params, body)
            serial.append(body)

        # JVM-side leak signal is post-GC USED HEAP, not OS RSS: the
        # JVM expands its heap lazily under load and never returns the
        # pages, so RSS growth reads as a leak when it is only sizing.
        # System.gc() is ADVISORY and can be skipped under a GCLocker
        # storm (observed on this host), so take the min over two
        # spaced collections — floating garbage must not read as leak
        import gc
        import time as _time

        rt = spark._jvm.java.lang.Runtime.getRuntime()

        def jvm_used_min() -> int:
            readings = []
            for _ in range(2):
                spark._jvm.java.lang.System.gc()
                _time.sleep(0.5)
                readings.append(rt.totalMemory() - rt.freeMemory())
            return min(readings)

        jvm_used0 = jvm_used_min()
        gc.collect()
        py_rss0 = _rss_kb(os.getpid())

        n_threads, per_thread = 8, 500
        transient_5xx: list[str] = []

        def client(tid: int) -> int:
            ok = 0
            for i in range(per_thread):
                k = (tid * 7 + i) % len(shapes)
                path, params = shapes[k]
                # 5xx = engine transient (e.g. a task lost to GC
                # allocation retry under soak pressure) — retryable by
                # the server's own contract; ONE retry, and the retry
                # must produce the exact serial bytes.  4xx = request
                # error = test bug, never retried.
                for attempt in (0, 1):
                    try:
                        status, body = _get(srv, path, params)
                        break
                    except urllib.error.HTTPError as exc:
                        detail = (
                            f"thread {tid} request {i} shape {k} {path} "
                            f"{params} -> {exc.code}: {exc.read()[:500]!r}"
                        )
                        if exc.code >= 500 and attempt == 0:
                            transient_5xx.append(detail)
                            continue
                        raise AssertionError(detail) from exc
                assert status == 200
                assert body == serial[k], (
                    f"thread {tid} request {i} diverged on shape {k}"
                )
                ok += 1
            return ok

        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            done = list(pool.map(client, range(n_threads)))
        assert done == [per_thread] * n_threads
        # transients must be RARE — a systematic failure retries its
        # way through every request and shows up here as a flood
        # (budget 16/4000 = 0.4%; a GC-pressure phase produces a few)
        assert len(transient_5xx) <= 16, transient_5xx[:3]

    # entry bound: the LRU never outgrew its configured size
    with api._plan_cache_lock:
        assert len(api._plan_cache) <= 8
    # RSS bounds: 4000 requests of eviction churn must not accrete
    # state on either process (bounds are multiples of any plausible
    # jitter; a pinned-plan leak at this request count is ~GBs)
    # bounds are multiples of any plausible jitter (8 threads of
    # arena fragmentation, a missed advisory GC) while a real leak of
    # 4000 pinned plans is GBs — loosened from 300 MB/one-reading
    # after a host GC-pressure phase flaked the tighter form in-suite
    gc.collect()
    py_growth = _rss_kb(os.getpid()) - py_rss0
    assert py_growth < 400_000, f"python RSS grew {py_growth} kB"
    jvm_growth = jvm_used_min() - jvm_used0
    assert jvm_growth < 600 * 1024 * 1024, (
        f"JVM post-GC used heap grew {jvm_growth / 1e6:.0f} MB"
    )
