"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's documented
active-users fact query, library_olap/README.md:39-49, re-expressed
over the synthetic star schema) at sf0.001.

``queries()`` / ``oracle_sql()`` export the full t2 workload from
``opl_spark.workload`` — one entry per implemented operator from
SURVEY.md §2, each with an ANSI-SQL DuckDB oracle where expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opl_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return workload.queries()["q_active_users"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return workload.oracle_sql()
