"""Runnable warehouse-analytics tour over the synthetic star schema.

Usage:
    python examples/warehouse_analytics.py [SF_DIR]

Composes the OLAP + analytics surface the way a BI/ops team would use
it end to end:

1.  nightly snapshot ETL into a partitioned fact warehouse
    (idempotent re-runs, audit columns);
2.  cube queries over it — cut, drilldown, top-N-per-group, having,
    percent-of-total shares — the same calls the HTTP API serves;
3.  event analytics next to the cubes: funnels, retention, rolling
    actives, new-vs-returning, peak concurrency;
4.  warehouse hygiene: SCD2 history, CDC snapshot diff, data-contract
    checks, id-sequence audit;
5.  incremental restatement via the SCD1 upsert merge.

Every stage is a lazy DataFrame; outputs are report-sized.  The same
composition runs unchanged on a cluster — sf_dir just points at
bigger parquet.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from opl_spark.cube import CubeEngine  # noqa: E402
from opl_spark.facts import (  # noqa: E402
    ACTIVE_USERS_SQL,
    build_loans_fact,
    default_catalog,
)
from opl_spark.operators.analytics import (  # noqa: E402
    funnel,
    new_vs_returning,
    retention_cohorts,
    rolling_active,
    scd2_intervals,
    validate_contract,
)
from opl_spark.session import get_spark  # noqa: E402
from opl_spark.snapshot import FactQuery, SnapshotEngine  # noqa: E402
from opl_spark.sources import load_table, register_sources  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="warehouse-analytics")
    register_sources(spark, sf_dir)

    # 1 — nightly snapshot into the warehouse (re-run is a no-op)
    wh = tempfile.mkdtemp(prefix="opl_wh_")
    etl = SnapshotEngine(spark, wh)
    facts = [FactQuery(1, "enabled_users", ACTIVE_USERS_SQL, cron="daily")]
    print("snapshot:", etl.run("1998-06-01", facts))
    print("re-run:  ", etl.run("1998-06-01", facts), "(idempotent)")

    # 2 — cube queries (identical semantics to GET /olap/loans2/aggregate)
    cube = CubeEngine(default_catalog())
    cube.register_fact("loans2", build_loans_fact(spark, sf_dir))
    print("\n-- per-consortium loan share (share=true) --")
    cube.aggregate(
        "loans2", drilldown="organization_level", measure="value", share=True
    ).show(truncate=False)
    print("-- top-2 libraries per consortium (top_n/top_within) --")
    cube.aggregate(
        "loans2",
        drilldown="organization_level:library_id",
        measure="value",
        top_n=2,
        top_within="consortia_id",
    ).show(5, truncate=False)

    # 3 — event analytics
    ev = load_table(spark, sf_dir, "events")
    print("-- view->click->purchase funnel --")
    funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]).show()
    print("-- weekly retention (first 5 cells) --")
    retention_cohorts(ev, "user_id", "ts").orderBy(
        "cohort_week", "week_offset"
    ).show(5)
    print("-- 7-day rolling actives / new-vs-returning (first 5 days) --")
    rolling_active(ev, "user_id", "ts").orderBy("day").show(5)
    new_vs_returning(ev, "user_id", "ts").orderBy("day").show(5)

    # 4 — warehouse hygiene
    orders = load_table(spark, sf_dir, "orders")
    print("-- SCD2 history (one customer) --")
    scd2_intervals(
        orders, "o_custkey", "o_orderdate", ["o_orderstatus"], "o_orderkey"
    ).filter(F.col("o_custkey") == 1).orderBy("valid_from").show(truncate=False)
    print("-- data-contract checks --")
    li = load_table(spark, sf_dir, "lineitem")
    validate_contract(
        li,
        checks=[
            ("nonpositive_qty", F.col("l_quantity") <= 0),
            ("null_shipdate", F.col("l_shipdate").isNull()),
        ],
        fk=[("fk_order", "l_orderkey", orders, "o_orderkey")],
    ).show()

    # 5 — SCD1 restatement: correct one row of the snapshot fact
    fact = etl.fact_frame("enabled_users")
    patch = fact.limit(1).withColumn("value", F.col("value") + 1)
    print("upsert:", etl.upsert(patch, "enabled_users", ["library_id"]))

    spark.stop()


if __name__ == "__main__":
    main()
