"""API dispatcher + CLI: the reference's operational surface
(endpoints per api-library-olap/README.md:4-19; CLI flags per
OLAP.php:388-403) must work end to end over the synthetic star."""

import json

import pytest

from opl_spark.api import OlapApi
from opl_spark.cli import main as cli_main
from opl_spark.cube import CubeEngine
from opl_spark.facts import build_loans_fact, default_catalog


@pytest.fixture(scope="module")
def api(spark, sf_dir):
    eng = CubeEngine(default_catalog())
    eng.register_fact("loans2", build_loans_fact(spark, sf_dir))
    return OlapApi(eng)


def test_fact_tables_route(api):
    names = {f["name"] for f in api.handle("/olap/fact_tables")}
    assert {"loans2", "enabled_users"} <= names


def test_dimensions_route(api):
    dims = {d["name"]: d for d in api.handle("/olap/loans2/dimensions")}
    assert dims["date"]["hierarchies"] == [
        {"name": "calendar", "order": ["year", "month", "day"]},
        {"name": "iso_week", "order": ["iso_year", "week"]},
    ]
    assert dims["organization_level"]["levels"][0]["attributes"] == ["consortia_label"]


def test_measures_route(api):
    ms = {m["name"]: m for m in api.handle("/olap/loans2/measures")}
    assert ms["value"]["aggregates"] == ["sum", "avg", "median", "approx_median"]


def test_aggregate_route_matches_engine(api):
    resp = api.handle(
        "/olap/loans2/aggregate",
        {"cut": "date:1995", "drilldown": "loan_type", "measure": "value"},
    )
    direct = api.engine.aggregate(
        "loans2", cut="date:1995", drilldown="loan_type", measure="value"
    ).collect()
    assert resp["data"] == [r.asDict() for r in direct]
    assert len(resp["data"]) > 0


def test_aggregate_output_table_shape(api):
    table = api.handle(
        "/olap/loans2/aggregate",
        {"cut": "date:1995", "drilldown": "loan_type", "output": "table"},
    )
    assert table[0] == ["loan_type", "value"]
    assert len(table) > 1


def test_empty_dataset_marker(api):
    resp = api.handle(
        "/olap/loans2/aggregate", {"cut": "date:2099", "drilldown": "loan_type"}
    )
    assert resp == {"message": "empty_dataset"}


def test_unknown_route(api):
    with pytest.raises(KeyError):
        api.handle("/olap/loans2/nope")


def test_cli_add_then_aggregate(spark, sf_dir, tmp_path, capsys):
    from opl_spark.facts import ACTIVE_USERS_SQL

    settings = tmp_path / "olapSettings.json"
    settings.write_text(
        json.dumps(
            {
                "fact_tables": [
                    {
                        "name": "enabled_users",
                        "fact_queries": [
                            {"id": 1, "query": ACTIVE_USERS_SQL, "cron": "daily", "enable": 1}
                        ],
                    }
                ]
            }
        )
    )
    wh = str(tmp_path / "wh")
    rc = cli_main(
        [
            "-c", "add", "-d", "1998-06-01",
            "--settings", str(settings), "--sources", sf_dir, "--warehouse", wh,
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["written"]["enabled_users"] > 0

    rc = cli_main(
        [
            "-c", "aggregate", "--warehouse", wh, "-f", "enabled_users",
            "--cut", "date:1998", "--drilldown", "age_group", "--measure", "value",
        ]
    )
    assert rc == 0
    resp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    groups = {r["age_group"] for r in resp["data"]}
    assert groups and groups <= {"0-14", "15-25", "26-40", "41-60", "61+", "n/a"}


def test_script_source_end_to_end(spark, tmp_path):
    """S2 literal form (OLAP.php:73-79, 344-346): an olapSettings entry
    of type "script" executes the configured command with the pivot
    date appended, ingests its stdout JSON rows with the reference's
    first-row type inference (OLAP.php:251-285: int → LONG, date-string
    → DATETIME, everything else → STRING), and snapshots them."""
    import datetime
    import sys
    import textwrap

    from opl_spark.cli import load_settings
    from opl_spark.snapshot import SnapshotEngine

    script = tmp_path / "gen_rows.py"
    script.write_text(
        textwrap.dedent(
            """
            import json, sys
            pivot = sys.argv[1]  # the runner appends the pivot date
            rows = [
                {"library_id": 3, "label": "Main",   "snap_date": pivot, "ratio": 1.5},
                {"library_id": 7, "label": "Branch", "snap_date": pivot, "ratio": 2.25},
            ]
            print(json.dumps(rows))
            """
        )
    )
    settings = tmp_path / "olapSettings.json"
    settings.write_text(
        json.dumps(
            {
                "fact_tables": [
                    {
                        "name": "script_fact",
                        "fact_queries": [
                            {
                                "id": 9,
                                "query": {
                                    "type": "script",
                                    "value": f"{sys.executable} {script}",
                                },
                                "cron": "daily",
                                "enable": 1,
                            }
                        ],
                    }
                ]
            }
        )
    )
    facts = load_settings(str(settings))
    assert facts[0].query_type == "script"
    eng = SnapshotEngine(spark, str(tmp_path / "wh"))
    written = eng.run("1998-06-01", facts)
    assert written == {"script_fact": 2}

    df = eng.fact_frame("script_fact")
    types = dict(df.dtypes)
    assert types["library_id"] == "bigint"  # integer → LONG
    assert types["snap_date"] == "timestamp"  # date-string → DATETIME
    assert types["ratio"] == "string"  # the reference's default arm
    rows = {r["library_id"]: r for r in df.collect()}
    assert rows[3]["label"] == "Main"
    assert rows[3]["snap_date"] == datetime.datetime(1998, 6, 1)
    assert rows[7]["ratio"] == "2.25"
    assert rows[3]["queryId"] == 9 and rows[3]["year"] == 1998  # audit attached
    # idempotent re-run: same scope appends nothing (E4)
    assert eng.run("1998-06-01", facts) == {}


def test_cli_compact_and_vacuum(spark, sf_dir, tmp_path, capsys):
    """Maintenance commands: compact rewrites a fact's files; vacuum
    reports stale staging removal — both as one-line JSON like the
    other commands."""
    import os

    from opl_spark.facts import ACTIVE_USERS_SQL

    settings = tmp_path / "olapSettings.json"
    settings.write_text(
        json.dumps(
            {"fact_tables": [{"name": "enabled_users", "fact_queries": [
                {"id": 1, "query": ACTIVE_USERS_SQL, "cron": "daily", "enable": 1}
            ]}]}
        )
    )
    wh = str(tmp_path / "wh")
    assert cli_main([
        "-c", "add", "-d", "1998-06-01",
        "--settings", str(settings), "--sources", sf_dir, "--warehouse", wh,
    ]) == 0
    capsys.readouterr()
    assert cli_main(["-c", "compact", "--warehouse", wh, "-f", "enabled_users"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"compacted": "enabled_users"}
    # plant stale staging, vacuum reports it
    os.makedirs(os.path.join(wh, "enabled_users__compacting"), exist_ok=True)
    assert cli_main(["-c", "vacuum", "--warehouse", wh]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"removed": ["enabled_users__compacting"]}


def test_cli_advise_recommends_from_query_log(spark, sf_dir, tmp_path, capsys):
    """`-c advise` wires the lattice advisor to the operational surface:
    a warehouse fact + a JSON query log in, benefit-ranked
    materialization advice out."""
    from opl_spark.facts import ACTIVE_USERS_SQL

    settings = tmp_path / "olapSettings.json"
    settings.write_text(
        json.dumps(
            {
                "fact_tables": [
                    {
                        "name": "enabled_users",
                        "fact_queries": [
                            {"id": 1, "query": ACTIVE_USERS_SQL,
                             "cron": "daily", "enable": 1}
                        ],
                    }
                ]
            }
        )
    )
    wh = str(tmp_path / "wh")
    assert cli_main(
        ["-c", "add", "-d", "1998-06-01",
         "--settings", str(settings), "--sources", sf_dir, "--warehouse", wh]
    ) == 0
    capsys.readouterr()

    log = tmp_path / "qlog.json"
    log.write_text(
        json.dumps(
            [{"cut": "date:1998", "drilldown": "age_group", "measure": "value"}] * 4
            + [{"drilldown": "age_group", "measure": "value"}]
        )
    )
    assert cli_main(
        ["-c", "advise", "--warehouse", wh, "-f", "enabled_users",
         "--query-log", str(log), "--max-rollups", "2"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fact"] == "enabled_users"
    recs = out["recommendations"]
    assert recs and all(r["est_rows"] > 0 and r["cols"] for r in recs)
    assert sum(r["covers"] for r in recs) == 5

    # advice is actionable from the CLI alone: `-c materialize` writes
    # the top recommendation into the SHARED <warehouse>/_lattice
    # path, then `-c aggregate` answers THROUGH it — pinned at the
    # PLAN level via `--explain`'s scan_locations (output parity alone
    # is what broken routing produces too), with the same output as
    # the pre-materialize live run
    params = ["-c", "aggregate", "--warehouse", wh, "-f", "enabled_users",
              "--drilldown", "age_group", "--measure", "value"]
    assert cli_main(params) == 0
    before = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert cli_main(
        ["-c", "materialize", "--warehouse", wh, "-f", "enabled_users",
         "--grouping", ",".join(recs[0]["cols"])]
    ) == 0
    mat = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert mat["materialized"] and mat["materialized"][0]["rows"] > 0

    def explain_locations():
        assert cli_main(params + ["--explain"]) == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        return " ".join(report["scan_locations"])

    assert "_lattice" in explain_locations(), (
        "CLI aggregate did not route through the materialized lattice"
    )
    assert cli_main(params) == 0
    after = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert after == before

    # staleness guard (route-time fact_version check): new snapshot
    # files appended after materialize make every rollup stale — the
    # CLI falls back to the live fact instead of serving pre-ingest
    # aggregates, and results stay correct
    assert cli_main(
        ["-c", "add", "-d", "1998-06-02",
         "--settings", str(settings), "--sources", sf_dir, "--warehouse", wh]
    ) == 0
    capsys.readouterr()
    assert "_lattice" not in explain_locations(), (
        "stale lattice still routed after new data was ingested"
    )
    # deliberately-broken store (manifest gone) must ALSO trip the
    # plan-level pin the way it trips the HTTP test, while output
    # stays live-engine-correct
    import os

    os.remove(os.path.join(wh, "_lattice", "enabled_users", "_LATTICE.json"))
    assert "_lattice" not in explain_locations()
    assert cli_main(params) == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])  # still serves


def test_cli_lsh_advise(capsys):
    """`-c lsh-advise` surfaces the banding advisor without a Spark
    session or warehouse: jaccard and cosine kinds, recommendation
    marked, budget factorized exactly."""
    assert cli_main(
        ["-c", "lsh-advise", "--lsh-threshold", "0.5",
         "--signature-budget", "64"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "jaccard"
    pick = out["bandings"][0]
    assert pick["recommended"] and pick["bands"] * pick["rows_per_band"] == 64
    assert pick["recall_at_threshold"] >= 0.9

    assert cli_main(
        ["-c", "lsh-advise", "--lsh-threshold", "0.8", "--lsh-kind", "cosine",
         "--signature-budget", "24"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "cosine"
    assert out["bandings"][0]["bit_agreement_at_threshold"] < 0.8

    # missing threshold and missing warehouse both fail loudly
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli_main(["-c", "lsh-advise"])
    with _pytest.raises(SystemExit):
        cli_main(["-c", "vacuum"])


def test_cli_explain_only_valid_on_aggregate(tmp_path, capsys):
    """--explain on a MUTATING command must refuse before any side
    effect (it previously fell through and ran the command); bad
    lsh-advise thresholds exit cleanly instead of raising a raw
    ValueError traceback."""
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="only valid with -c aggregate"):
        cli_main(["-c", "vacuum", "--warehouse", str(tmp_path / "wh"),
                  "--explain"])
    assert not (tmp_path / "wh").exists()  # nothing ran
    with _pytest.raises(SystemExit, match="lsh-advise.*threshold"):
        cli_main(["-c", "lsh-advise", "--lsh-threshold", "1.0"])


@pytest.mark.slow  # r14 slow tier
def test_cli_srp_probe_closes_build_probe_append_loop(spark, sf_dir, tmp_path, capsys):
    """The CLI twin of test_srp_dedup_incremental_store (r9 verdict
    task 5): `-c srp-probe` alone closes the whole index lifecycle —
    batch 0 bootstraps the store (empty report), batch 1 detects a
    verbatim copy of a batch-0 vector via the appended signatures,
    --report-out lands the full parquet report, --no-append probes
    read-only, and missing args refuse loudly."""
    from pyspark.sql import functions as F

    from opl_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "srp_store")
    b0_path = str(tmp_path / "batch0")
    b1_path = str(tmp_path / "batch1")
    emb.limit(5).write.parquet(b0_path)
    first = emb.orderBy("vec_id").first()
    spark.createDataFrame(
        [(900001, [float(v) for v in first["embedding"]])],
        "vec_id long, embedding array<double>",
    ).write.parquet(b1_path)

    # batch 0: bootstrap — store created, no dups, signatures appended
    assert cli_main(["-c", "srp-probe", "--store", store, "--batch", b0_path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["store"] == store and out["appended"] is True
    assert out["bootstrap"] is True and out["dups"] == 0 and out["probed"] == 5

    # batch 1: the verbatim copy reports its batch-0 original at 1.0
    rep = str(tmp_path / "report")
    assert cli_main([
        "-c", "srp-probe", "--store", store, "--batch", b1_path,
        "--threshold", "0.95", "--report-out", rep,
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrap"] is False and out["dups"] == 1
    row = spark.read.parquet(rep).first()
    assert (row["vec_id"], row["dup_of"], row["cos"]) == (
        900001, first["vec_id"], 1.0
    )

    # --no-append + --exclude-self: read-only replay-safe probe gives
    # the same single dup (its own appended signatures are invisible)
    n_store = spark.read.parquet(store).count()
    assert cli_main([
        "-c", "srp-probe", "--store", store, "--batch", b1_path,
        "--threshold", "0.95", "--no-append", "--exclude-self",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dups"] == 1 and out["appended"] is False
    assert spark.read.parquet(store).count() == n_store  # untouched

    with pytest.raises(SystemExit, match="srp-probe requires"):
        cli_main(["-c", "srp-probe", "--store", store])
    with pytest.raises(SystemExit, match="needs columns"):
        cli_main(["-c", "srp-probe", "--store", store, "--batch",
                  str(sf_dir) + "/documents.parquet"])


def test_aggregate_plan_cache_reuses_and_invalidates(spark, sf_dir):
    """The request plan cache (r11): identical aggregate requests
    reuse the built DataFrame (no re-analysis), different params build
    fresh plans, re-registering the fact invalidates structurally, and
    results are identical cached or not."""
    from pyspark.sql import functions as F

    eng = CubeEngine(default_catalog())
    eng.register_fact("loans2", build_loans_fact(spark, sf_dir))
    api = OlapApi(eng)
    p = {"cut": "date:1997", "drilldown": "date", "measure": "loans"}

    d1 = api._build_aggregate_df("loans2", p)
    d2 = api._build_aggregate_df("loans2", p)
    assert d1 is d2  # cache hit: same analyzed plan object
    # output=table vs json share the plan (output excluded from key)
    assert api._build_aggregate_df("loans2", {**p, "output": "table"}) is d1
    d3 = api._build_aggregate_df("loans2", {**p, "measure": "value"})
    assert d3 is not d1

    # served results equal an uncached engine's
    uncached = OlapApi(eng, plan_cache_size=0)
    assert uncached._build_aggregate_df(
        "loans2", p
    ) is not uncached._build_aggregate_df("loans2", p)
    assert api.handle("/olap/loans2/aggregate", p) == uncached.handle(
        "/olap/loans2/aggregate", p
    )

    # re-registration bumps the frame version -> fresh plan over the
    # new frame (here: a filtered frame, so the answer changes too)
    before = api.handle("/olap/loans2/aggregate", p)
    eng.register_fact(
        "loans2", build_loans_fact(spark, sf_dir).filter(F.col("month") <= 6)
    )
    d4 = api._build_aggregate_df("loans2", p)
    assert d4 is not d1
    after = api.handle("/olap/loans2/aggregate", p)
    assert before != after  # stale cache would have answered 'before'

    # malformed requests are not cached and still raise each time
    bad = {"cut": "date", "drilldown": "date"}
    for _ in range(2):
        with pytest.raises(ValueError):
            api.handle("/olap/loans2/aggregate", bad)


def test_poisoned_cached_plan_evicts_and_retries(spark, sf_dir, tmp_path):
    """The cache's execution-failure recovery path (code review r11):
    a cached plan whose scanned files vanished (in-place rollup
    re-materialization on an object store; files GC'd between listing
    and read) must be evicted and rebuilt once — not served as a
    permanent 400.  Poison injected white-box: the local-FS overwrite
    happens to re-resolve listings, so the failure is planted
    directly to pin the branch deterministically."""
    import shutil

    from pyspark.sql import functions as F

    eng = CubeEngine(default_catalog())
    eng.register_fact("loans2", build_loans_fact(spark, sf_dir))
    api = OlapApi(eng)
    p = {"cut": "date:1997", "drilldown": "date", "measure": "loans"}
    good = api.handle("/olap/loans2/aggregate", p)

    # a df whose EXECUTION fails: parquet read whose files are deleted
    doomed_dir = str(tmp_path / "doomed")
    spark.range(5).select(
        F.col("id").alias("month"), F.col("id").alias("loans")
    ).write.parquet(doomed_dir)
    doomed = spark.read.parquet(doomed_dir)
    shutil.rmtree(doomed_dir)
    # unknown/ignored params must not mint new LRU slots (ADVICE r12)
    assert api._cache_key("loans2", p) == api._cache_key(
        "loans2", {**p, "junk": "1", "output": "table"}
    )
    key = api._cache_key("loans2", p)
    with api._plan_cache_lock:
        api._plan_cache[key] = doomed
    # fails on execution -> evict -> rebuild -> correct answer
    assert api.handle("/olap/loans2/aggregate", p) == good
    with api._plan_cache_lock:
        assert api._plan_cache[key] is not doomed
    # with the cache disabled, the same execution failure raises
    u = OlapApi(eng, plan_cache_size=0)
    spark.range(3).write.parquet(doomed_dir)
    doomed2 = spark.read.parquet(doomed_dir)
    shutil.rmtree(doomed_dir)
    u._build_aggregate_df = lambda fact, params: doomed2
    with pytest.raises(Exception):
        u.handle("/olap/loans2/aggregate", p)
