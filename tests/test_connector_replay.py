"""End-to-end replays of the five recorded Data Studio getData traces
(DataStudio-connector/Codice.gs:239-254) through the connector's
synthesis rules (Codice.gs:283-349, re-expressed in
``opl_spark.connector``) and ``OlapApi.handle``.

Adaptation to the synthetic star (FIXTURES.md §3): date ranges are
shifted into the synthetic data's span (orders/lineitem 1995-2001;
the enabled_users snapshot pivots at 1998-06-01), and field ids are
the synthetic metadata's — e.g. the trace's ``localLoans`` measure is
``value``, and ``consortia_id`` arrives as its exposed attribute
``consortia_label`` (the connector exposes a level's *attributes* as
field ids when it has any, Codice.gs:90-99)."""

import pytest

from opl_spark.api import OlapApi
from opl_spark.connector import (
    connector_field_ids,
    synthesize_drilldown,
    synthesize_request,
)
from opl_spark.cube import CubeEngine
from opl_spark.facts import (
    ACTIVE_USERS_SQL,
    build_general_indexes_fact,
    build_loans_fact,
    build_patrimonio_fact,
    default_catalog,
)


@pytest.fixture(scope="module")
def api(spark, sf_dir, tmp_path_factory):
    eng = CubeEngine(default_catalog())
    eng.register_fact("loans2", build_loans_fact(spark, sf_dir))
    eng.register_fact("general_indexes", build_general_indexes_fact(spark, sf_dir))
    eng.register_fact("patrimonio", build_patrimonio_fact(spark, sf_dir))
    # enabled_users through the real snapshot path (audit year/month
    # scope columns are what its date hierarchy cuts against)
    from opl_spark.snapshot import FactQuery, SnapshotEngine
    from opl_spark.sources import register_sources

    register_sources(spark, sf_dir)
    snap = SnapshotEngine(spark, str(tmp_path_factory.mktemp("replay_wh")))
    written = snap.run(
        "1998-06-01", [FactQuery(1, "enabled_users", ACTIVE_USERS_SQL, cron="daily")]
    )
    assert written["enabled_users"] > 0
    eng.register_fact("enabled_users", snap.fact_frame("enabled_users"))
    return OlapApi(eng)


def _replay(api, fact, fields, start, end):
    path, params = synthesize_request(api.catalog, fact, fields, start, end)
    table = api.handle(path, params)
    header, rows = table[0], table[1:]
    # the synthesized call must be literally what the engine computes
    direct = api.engine.aggregate(
        fact,
        cut=params["cut"],
        drilldown=params.get("drilldown"),
    )
    assert header == direct.columns
    assert rows == [list(r) for r in direct.collect()]
    return header, rows


def test_field_universe_matches_connector_extraction(api):
    # extractDimensions semantics (Codice.gs:68-105) over loans2:
    # attribute-bearing levels expose their attributes, not their name
    ids = connector_field_ids(api.catalog, "loans2")
    assert ids == [
        "consortia_label", "library_id", "date",
        "loan_type", "priority", "segment", "library_id",
    ]


def test_replay_loans2_consortia_by_range(api):
    """Codice.gs:239 — loans2, fields [consortia_id, localLoans, month,
    year]: month/year are not connector date field ids (only 'date'
    is), so they contribute nothing; the org hierarchy drills at the
    consortia level, addressed by its exposed attribute."""
    fields = ["consortia_label", "value", "month", "year"]
    assert (
        synthesize_drilldown(api.catalog, "loans2", fields)
        == "organization_level:consortia_label"
    )
    header, rows = _replay(api, "loans2", fields, "1996-04-25", "1996-05-22")
    assert header == ["consortia_id", "consortia_label", "value"]
    assert len(rows) > 0


def test_replay_loans2_full_drill_with_date(api):
    """Codice.gs:241 — loans2, fields [consortia_label, date,
    library_id, localLoans]: deepest org level wins (library_id over
    consortia_label), date always drills to day, and the flat
    library_id dimension's duplicate group column dedups."""
    fields = ["consortia_label", "date", "library_id", "value"]
    assert (
        synthesize_drilldown(api.catalog, "loans2", fields)
        == "organization_level:library_id|date:day|library_id"
    )
    header, rows = _replay(api, "loans2", fields, "1996-04-26", "1996-05-23")
    assert header == ["consortia_id", "consortia_label", "library_id", "day", "value"]
    assert len(rows) > 0


def test_replay_enabled_users_patrons_by_library(api):
    """Codice.gs:244 — enabled_users, fields [consortia_id,
    patron_count] ≅ [library_id, value]: a single-day Data Studio range
    over the snapshot fact; the Y,M,D cut truncates to the fact's
    (year, month) hierarchy depth."""
    fields = ["library_id", "value"]
    assert synthesize_drilldown(api.catalog, "enabled_users", fields) == "library_id"
    header, rows = _replay(api, "enabled_users", fields, "1998-06-01", "1998-06-01")
    assert header == ["library_id", "value"]
    assert len(rows) > 0


def test_replay_general_indexes_morning_by_class_day(api):
    """Codice.gs:246 — general_indexes, fields [apertura_mattutina,
    date, library_class]: flat class dim + date→day; the default
    (first) measure is apertura_mattutina."""
    fields = ["apertura_mattutina", "date", "library_class"]
    assert (
        synthesize_drilldown(api.catalog, "general_indexes", fields)
        == "library_class|date:day"
    )
    header, rows = _replay(api, "general_indexes", fields, "1996-05-10", "1996-06-06")
    assert header == ["library_class", "day", "apertura_mattutina"]
    assert len(rows) > 0


def test_replay_patrimonio_value_by_consortia(api):
    """Codice.gs:248 — patrimonio, fields [consortia_id, value]."""
    fields = ["consortia_id", "value"]
    assert synthesize_drilldown(api.catalog, "patrimonio", fields) == "consortia_id"
    header, rows = _replay(api, "patrimonio", fields, "1996-05-20", "1996-06-16")
    assert header == ["consortia_id", "value"]
    assert len(rows) > 0
    # decimal measure surfaces in canonical round(double, 2) form
    assert all(isinstance(r[1], float) for r in rows)
