"""The real JDBC source leg (r10 verdict task 3): the reference's
production topology is operator SQL pushed down to a live MySQL over
PDO (OLAP.php:306-315,334-343).  The Spark-native equivalent —
``register_jdbc_sources`` → temp views → fact SQL — existed but was
never exercised against a live database.  These tests stand up an
embedded Apache Derby (ships with Spark's jars), seed a Clavis-shaped
source, and drive the full path: registration, filter/projection
pushdown INTO the JDBC scan, parallel partitioned reads, and a
``SnapshotEngine.run`` end-to-end on top of the JDBC views.
"""

import datetime as dt
import os

import pytest

from opl_spark.plans import formatted_plan
from opl_spark.sources.registry import register_jdbc_sources

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _seed_derby(spark, db_path: str) -> str:
    """Create an embedded Derby database with a Clavis-shaped loan
    table + library dimension; returns the JDBC url."""
    url = f"jdbc:derby:{db_path}"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE loan (id INT PRIMARY KEY, library_id INT, "
        "loan_date DATE, val DOUBLE)"
    )
    st.executeUpdate(
        "CREATE TABLE library (id INT PRIMARY KEY, consortia_id INT, "
        "name VARCHAR(40))"
    )
    for i in range(200):
        st.executeUpdate(
            "INSERT INTO loan VALUES ({}, {}, DATE('2024-01-{:02d}'), {})".format(
                i, i % 5, (i % 28) + 1, float(i)
            )
        )
    for lid in range(5):
        st.executeUpdate(
            f"INSERT INTO library VALUES ({lid}, {lid % 2}, 'lib{lid}')"
        )
    st.close()
    conn.close()
    return url


@pytest.fixture(scope="module")
def jdbc_url(spark, tmp_path_factory):
    return _seed_derby(spark, str(tmp_path_factory.mktemp("derby") / "clavis"))


@pytest.fixture(scope="module")
def jdbc_views(spark, jdbc_url):
    register_jdbc_sources(
        spark,
        jdbc_url,
        ("loan", "library"),
        partition_specs={"loan": ("id", 4)},
        driver=DRIVER,
    )
    return jdbc_url


def test_jdbc_view_reads_and_parallelizes(spark, jdbc_views):
    df = spark.sql("SELECT * FROM loan")
    assert df.count() == 200
    # the fact spine reads over 4 JDBC partitions, not one connection
    assert df.rdd.getNumPartitions() == 4
    assert spark.sql("SELECT * FROM library").count() == 5


def test_jdbc_scan_pushes_filters_and_prunes_columns(spark, jdbc_views):
    """The S1 contract on a REAL JDBC scan: a fact-query WHERE must
    reach the remote database (PushedFilters in the scan node), and
    the projection must prune to the referenced columns."""
    df = spark.sql("SELECT id, val FROM loan WHERE val > 50.0")
    plan = formatted_plan(df)
    assert "PushedFilters:" in plan, plan
    assert "GreaterThan(VAL,50.0)" in plan.replace('"', ""), plan
    # column pruning: the remote SELECT carries only id/val
    assert "LOAN_DATE" not in plan.split("PushedFilters")[0].split("Scan")[-1]
    assert df.count() == 149  # vals 51..199


def test_jdbc_snapshot_run_end_to_end(spark, jdbc_views, tmp_path):
    """SnapshotEngine.run with operator SQL over the JDBC views — the
    reference's production mode (two PDO connections: read Clavis,
    write OLAP; OLAP.php:306-315) re-expressed as JDBC views → fact
    SQL → partitioned parquet warehouse."""
    from opl_spark.snapshot import AUDIT_COLUMNS, FactQuery, SnapshotEngine

    eng = SnapshotEngine(spark, str(tmp_path / "wh"))
    fq = FactQuery(
        query_id=7,
        fact_table="jdbc_loans",
        sql=(
            "SELECT l.library_id, lb.consortia_id, "
            "COUNT(*) AS loans, SUM(l.val) AS total_value "
            "FROM loan l JOIN library lb ON l.library_id = lb.id "
            "WHERE l.loan_date <= @date GROUP BY l.library_id, lb.consortia_id"
        ),
        cron="daily",
    )
    written = eng.run("2024-01-28", [fq])
    assert written and list(written) == ["jdbc_loans"]
    out = eng.fact_frame("jdbc_loans")
    assert set(AUDIT_COLUMNS) <= set(out.columns)
    rows = {r["library_id"]: r["loans"] for r in out.collect()}
    assert sum(rows.values()) == 200  # all Jan loans <= the 28th
    # idempotent re-run on the same pivot date writes nothing
    assert eng.run("2024-01-28", [fq]) == {}


def test_jdbc_date_filter_pushdown_reaches_scan(spark, jdbc_views):
    """The @date-bound cutoff itself must be pushed into the remote
    scan — at 100 TB the source database prunes on its loan_date
    index; shipping every historical row to Spark first would be the
    reference's full-table mistake, not an equivalent."""
    from opl_spark.snapshot import bind_date

    sql = "SELECT library_id, val FROM loan WHERE loan_date <= @date"
    plan = formatted_plan(spark.sql(bind_date(sql, dt.date(2024, 1, 10))))
    assert "PushedFilters:" in plan
    assert "LessThanOrEqual(LOAN_DATE" in plan.replace('"', ""), plan


def test_jdbc_v2_catalog_pushes_aggregates_into_source(spark, jdbc_url):
    """The DSv2 catalog leg: GROUP BY + COUNT/SUM execute INSIDE the
    source database — the plan's scan node carries PushedAggregates /
    PushedGroupByExpressions, so at scale the source returns
    group-count rows instead of the fact spine.  (Identifier case is
    the remote database's: Derby uppercases unquoted names.)"""
    from opl_spark.sources.registry import register_jdbc_catalog

    register_jdbc_catalog(
        spark, "clavis", jdbc_url, driver=DRIVER
    )
    df = spark.sql(
        "SELECT LIBRARY_ID, COUNT(*) AS n, SUM(VAL) AS s "
        "FROM clavis.APP.LOAN GROUP BY LIBRARY_ID"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregates: [COUNT(*), SUM(VAL)]" in plan, plan
    assert "PushedGroupByExpressions: [LIBRARY_ID]" in plan, plan
    rows = {r["LIBRARY_ID"]: (r["n"], r["s"]) for r in df.collect()}
    # 200 loans over 5 libraries: ids i with i%5==lib, val=i
    assert rows[0] == (40, float(sum(i for i in range(200) if i % 5 == 0)))
    assert set(rows) == set(range(5)) and all(n == 40 for n, _ in rows.values())


def test_jdbc_v2_snapshot_aggregation_runs_in_source(spark, jdbc_url, tmp_path):
    """The full production topology with the aggregation ITSELF pushed
    to the source: SnapshotEngine.run over catalog-qualified fact SQL —
    the source database computes the group-by (PushedAggregates on the
    scan), Spark attaches audit columns and writes the warehouse.
    This is exactly the reference's architecture (MySQL executes the
    operator SQL, PHP stamps and stores rows) with Spark as the
    stamping/storage tier."""
    from opl_spark.snapshot import FactQuery, SnapshotEngine
    from opl_spark.sources.registry import register_jdbc_catalog

    register_jdbc_catalog(spark, "clavis2", jdbc_url, driver=DRIVER)
    sql = (
        "SELECT LIBRARY_ID AS library_id, COUNT(*) AS loans, "
        "SUM(VAL) AS total_value "
        "FROM clavis2.APP.LOAN WHERE LOAN_DATE <= @date GROUP BY LIBRARY_ID"
    )
    from opl_spark.snapshot import bind_date

    plan = (
        spark.sql(bind_date(sql, "2024-01-28"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedAggregates: [COUNT(*), SUM(VAL)]" in plan, plan
    assert "LOAN_DATE" in plan.split("PushedFilters: [", 1)[1].split("]")[0], plan

    eng = SnapshotEngine(spark, str(tmp_path / "wh"))
    written = eng.run("2024-01-28", [FactQuery(9, "jdbc_loans_v2", sql)])
    assert written == {"jdbc_loans_v2": 5}
    rows = {
        r["library_id"]: (r["loans"], r["total_value"])
        for r in eng.fact_frame("jdbc_loans_v2").collect()
    }
    assert rows[0] == (40, float(sum(i for i in range(200) if i % 5 == 0)))


def test_jdbc_v2_catalog_reregistration_takes_effect(spark, jdbc_url):
    """Re-registering a catalog name must actually apply the new
    options: Spark caches catalog INSTANCES by name on first
    resolution, so register_jdbc_catalog resets the manager's cache
    when overwriting (code review r11 — without it the old connection
    silently kept serving)."""
    from opl_spark.sources.registry import register_jdbc_catalog

    register_jdbc_catalog(spark, "clavis3", jdbc_url, driver=DRIVER)
    q = "SELECT LIBRARY_ID, COUNT(*) AS n FROM clavis3.APP.LOAN GROUP BY LIBRARY_ID"
    plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregates" in plan  # instance now cached by name

    register_jdbc_catalog(
        spark, "clavis3", jdbc_url, pushdown_aggregates=False, driver=DRIVER
    )
    spark.conf.set("spark.sql.catalog.clavis3.pushDownAggregate", "false")
    plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregates" not in plan, plan  # new conf took effect

    # the cache reset must not snap a live USE <catalog>.<ns> context
    # back to spark_catalog (ADVICE r12)
    spark.sql("USE clavis3.APP")
    try:
        register_jdbc_catalog(
            spark, "clavis3", jdbc_url, pushdown_aggregates=False, driver=DRIVER
        )
        assert spark.catalog.currentCatalog() == "clavis3"
        assert spark.sql("SELECT current_schema()").first()[0] == "APP"
        # unqualified resolution still works post-reregistration
        assert spark.sql("SELECT COUNT(*) FROM LOAN").first()[0] > 0
    finally:
        spark.sql("USE spark_catalog.default")
