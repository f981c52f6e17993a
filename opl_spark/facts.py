"""The golden workload: OPL's documented fact tables re-expressed over
the driver's synthetic star schema (FIXTURES.md §3 mapping).

Two facts cover every documented cube instance (SURVEY.md §2.8):

- ``loans2``        — dated transactions with an organization hierarchy
  (consortia → library) and a date hierarchy (year → month → day);
  built from ``orders ⋈ customer ⋈ nation ⋈ region``.  Stand-in for the
  reference's loans2/accessions/patrimonio facts (Codice.gs:239-254).
- ``enabled_users`` — the reference's documented active-users fact
  query (library_olap/README.md:39-49): age-bucket CASE + 12-month
  activity window + group-count, over ``customer``/``orders``.

Every builder has a SQL twin (ANSI, runs verbatim on DuckDB) used by
the correctness oracle — the dual encoding is the unit test
(SURVEY.md §5.2).

Scale notes: nation (25 rows) and region (5 rows) are broadcast by
Catalyst/AQE automatically — the orders⋈customer join is the only
shuffle; both sides hash-partition on the join key.  Key columns are
cast to ``long`` and money to ``decimal(18,2)`` so aggregates are
exact and engine-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opl_spark.catalog import Catalog, Dimension, FactMeta, Hierarchy, Level, Measure
from opl_spark.sources import load_table

#: Fixed pivot date for all deterministic test snapshots — inside the
#: orders date range (1995-2001) with a full prior 12 months.
PIVOT_DATE = "1998-06-01"

# ---------------------------------------------------------------------------
# loans2 — the cube-query workhorse fact
# ---------------------------------------------------------------------------

#: ANSI-SQL twin of :func:`build_loans_fact` — DuckDB-ready CTE body.
LOANS_FACT_SQL = """
SELECT
    CAST(r.r_regionkey AS BIGINT)              AS consortia_id,
    r.r_name                                   AS consortia_label,
    CAST(n.n_nationkey AS BIGINT)              AS library_id,
    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)  AS year,
    CAST(EXTRACT(MONTH FROM o.o_orderdate) AS BIGINT) AS month,
    CAST(EXTRACT(DAY FROM o.o_orderdate) AS BIGINT)   AS day,
    o.o_orderstatus                            AS loan_type,
    o.o_orderpriority                          AS priority,
    c.c_mktsegment                             AS segment,
    CAST(o.o_totalprice AS DECIMAL(18,2))      AS value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
"""


def build_loans_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API twin of :data:`LOANS_FACT_SQL`.

    ``date`` hierarchy columns here are (year → month → day-of-month) —
    the API drilldown grain (api-library-olap/README.md:44-49), distinct
    from the snapshot audit ``day`` which is day-of-year (OLAP.php:41;
    SURVEY.md §7.3b keeps both, named apart).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("r_regionkey").cast("long").alias("consortia_id"),
            F.col("r_name").alias("consortia_label"),
            F.col("n_nationkey").cast("long").alias("library_id"),
            F.year("o_orderdate").cast("long").alias("year"),
            F.month("o_orderdate").cast("long").alias("month"),
            F.dayofmonth("o_orderdate").cast("long").alias("day"),
            F.col("o_orderstatus").alias("loan_type"),
            F.col("o_orderpriority").alias("priority"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("value"),
        )
    )


#: Fact metadata for loans2 — shape per the reference's loans2/accessions
#: metadata (Codice.gs:239-243; api-library-olap/README.md:96-161).
LOANS_META = FactMeta(
    name="loans2",
    label="Loans (synthetic)",
    dimensions=(
        Dimension(
            name="organization_level",
            levels=(
                Level("consortia_id", attributes=("consortia_label",)),
                Level("library_id"),
            ),
            hierarchies=(Hierarchy("organization", ("consortia_id", "library_id")),),
        ),
        Dimension(
            name="date",
            levels=(Level("year"), Level("month"), Level("day")),
            hierarchies=(Hierarchy("calendar", ("year", "month", "day")),),
        ),
        Dimension(name="loan_type"),
        Dimension(name="priority"),
        Dimension(name="segment"),
        Dimension(name="library_id"),
    ),
    measures=(
        Measure("value", column="value", aggregates=("sum", "avg")),
        Measure("loans", column="library_id", aggregates=("count",)),
        Measure("avg_value", column="value", aggregates=("avg",)),
    ),
)

#: Wrap a cube-result body over the fact CTE for the DuckDB oracle.
ORACLE_CTE = "WITH fact AS (" + LOANS_FACT_SQL + ")\n"


# ---------------------------------------------------------------------------
# enabled_users — the reference's documented active-users query
# ---------------------------------------------------------------------------

#: Re-expression of library_olap/README.md:39-49 over the synthetic
#: schema (mapping: FIXTURES.md §3 — patron→customer, loan→orders,
#: preferred_library_id→c_nationkey, birth year proxied from c_custkey,
#: card_expire proxied by account balance, last_seen by latest order).
#: Runs verbatim on Spark SQL AND DuckDB with @date bound.
ACTIVE_USERS_SQL = """
SELECT
    CAST(c.c_nationkey AS BIGINT) AS library_id,
    CASE
        WHEN c.c_mktsegment = 'HOUSEHOLD' THEN 'n/a'
        WHEN EXTRACT(YEAR FROM @date) - (1930 + c.c_custkey % 80) <= 14 THEN '0-14'
        WHEN EXTRACT(YEAR FROM @date) - (1930 + c.c_custkey % 80) <= 25 THEN '15-25'
        WHEN EXTRACT(YEAR FROM @date) - (1930 + c.c_custkey % 80) <= 40 THEN '26-40'
        WHEN EXTRACT(YEAR FROM @date) - (1930 + c.c_custkey % 80) <= 60 THEN '41-60'
        ELSE '61+'
    END AS age_group,
    COUNT(*) AS value
FROM customer c
WHERE c.c_acctbal > 9000
   OR EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >  @date - INTERVAL '12' MONTH
          AND o.o_orderdate <= @date
   )
GROUP BY 1, 2
"""

ENABLED_USERS_META = FactMeta(
    name="enabled_users",
    label="Enabled users (synthetic)",
    dimensions=(
        Dimension(name="library_id"),
        Dimension(name="age_group"),
        Dimension(
            name="date",
            levels=(Level("year"), Level("month")),
            hierarchies=(Hierarchy("calendar", ("year", "month")),),
        ),
    ),
    measures=(Measure("value", column="value", aggregates=("sum", "count")),),
)


def default_catalog() -> Catalog:
    cat = Catalog()
    cat.add(LOANS_META)
    cat.add(ENABLED_USERS_META)
    return cat
