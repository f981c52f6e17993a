"""JDBC snapshot sink — the reference's write topology.

The reference snapshots INTO a database: a second PDO connection to
the OLAP MySQL, ``CREATE TABLE`` on first write, ``ALTER TABLE ADD``
on schema drift, then a prepared-INSERT loop one row at a time
(OLAP.php:128-164 ``prepareWriting``/``writeRow``, loop
OLAP.php:373-375).  This module closes that topology asymmetry for the
Spark engine: :class:`JdbcSink` plugs into ``SnapshotEngine`` and

- auto-creates the fact table on first append (S6) via Spark's JDBC
  writer — a parallel batched INSERT per partition, not a row loop;
- widens the table with ``ALTER TABLE ADD COLUMN`` when a fact query
  grows columns (S7, ``modifyTableStruct`` OLAP.php:177-199) — add
  -only, never narrowing, matching the parquet sink's contract;
- honors the E4 re-run guard with a scope-pruned remote read (the
  predicate pushes into the database, so the check is index-sized);
- makes re-materialization idempotent by DELETE-then-INSERT on the
  (queryId, scope) slice — the reference's ``alreadyExecuted`` skip
  plus a cure for half-written scopes that its row loop cannot offer.

Scale note: the snapshot RESULT is aggregate-sized (group rows, not
the fact spine), so a JDBC sink is legitimate at any corpus scale —
the 100 TB never crosses this connection, only the report does.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opl_spark.timescope import Scope


def _sql_literal(value) -> str:
    """Render a scope value as a SQL literal (engine-generated values
    only — query ids, year/month/day ints, ISO week labels)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, (_dt.date, _dt.datetime)):
        return f"'{value.isoformat()}'"
    return "'" + str(value).replace("'", "''") + "'"


@dataclass
class JdbcSink:
    """Target-database sink for ``SnapshotEngine`` fact tables.

    ``options`` pass through to Spark's JDBC reader/writer (e.g.
    ``batchsize``, ``isolationLevel``); ``createTableColumnTypes`` is
    auto-derived for string columns when absent (``VARCHAR(255)``) —
    several dialects (Derby included) would otherwise map StringType
    to CLOB/TEXT, which cannot sit in the scope-equality predicates
    the E4 guard and the per-scope DELETE need."""

    url: str
    driver: str | None = None
    options: dict = field(default_factory=dict)

    # -- driver-side JDBC plumbing ------------------------------------

    def _connect(self, spark: SparkSession):
        jvm = spark._jvm
        if self.driver:
            jvm.java.lang.Class.forName(self.driver)
        return jvm.java.sql.DriverManager.getConnection(self.url)

    def _quote(self, spark: SparkSession, name: str) -> str:
        dialect = spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(self.url)
        return dialect.quoteIdentifier(name)

    def _resolve_table(self, conn, table: str) -> str | None:
        """The stored name of ``table`` (dialect case rules apply:
        Spark creates it unquoted, so e.g. Derby uppercases), or None
        if absent.  JDBC metadata treats the name as a PATTERN where
        ``_`` is a single-char wildcard — and every fact table name
        has underscores — so each row is re-checked for an exact
        match (``olap_loans`` must not resolve via ``olap0loans``)."""
        meta = conn.getMetaData()
        for candidate in (table, table.upper(), table.lower()):
            rs = meta.getTables(None, None, candidate, None)
            try:
                while rs.next():
                    if rs.getString("TABLE_NAME") == candidate:
                        return candidate
            finally:
                rs.close()
        return None

    def _table_columns(self, conn, stored: str) -> list[str]:
        # same wildcard caveat as _resolve_table: filter to the exact
        # table so a wildcard-sibling's columns never leak in
        rs = conn.getMetaData().getColumns(None, None, stored, None)
        cols = []
        try:
            while rs.next():
                if rs.getString("TABLE_NAME") == stored:
                    cols.append(rs.getString("COLUMN_NAME"))
        finally:
            rs.close()
        return cols

    def _jdbc_type(self, spark: SparkSession, dt: T.DataType) -> str:
        """The dialect's DDL type for a Catalyst type (dialect first,
        common JDBC mapping as fallback — mirrors JdbcUtils), with the
        same VARCHAR override the table-create path applies to strings."""
        if isinstance(dt, T.StringType):
            return "VARCHAR(255)"
        jvm = spark._jvm
        jdt = jvm.org.apache.spark.sql.types.DataType.fromJson(dt.json())
        dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(self.url)
        jt = dialect.getJDBCType(jdt)
        if not jt.isDefined():
            jt = (
                jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
                .getCommonJDBCType(jdt)
            )
        if not jt.isDefined():
            raise ValueError(f"no JDBC type for {dt.simpleString()}")
        return jt.get().databaseTypeDefinition()

    def _scope_where(
        self, spark: SparkSession, query_id: int, scope: Scope
    ) -> str:
        parts = [f"{self._quote(spark, 'queryId')} = {query_id}"]
        for name, val in scope.as_dict().items():
            q = self._quote(spark, name)
            if val is None:
                parts.append(f"{q} IS NULL")
            else:
                parts.append(f"{q} = {_sql_literal(val)}")
        return " AND ".join(parts)

    # -- the SnapshotEngine surface -----------------------------------

    def exists(self, spark: SparkSession, table: str) -> bool:
        conn = self._connect(spark)
        try:
            return self._resolve_table(conn, table) is not None
        finally:
            conn.close()

    def fact_frame(self, spark: SparkSession, table: str) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        for k, v in self.options.items():
            reader = reader.option(k, str(v))
        return reader.load()

    def already_executed(
        self, spark: SparkSession, table: str, query_id: int, scope: Scope
    ) -> bool:
        """E4 against the TARGET database: the scope predicate pushes
        into the remote scan (PushedFilters), so on an indexed OLAP
        table this is an index probe, not a table pull."""
        if not self.exists(spark, table):
            return False
        df = self.fact_frame(spark, table)
        cond = F.col("queryId") == F.lit(query_id)
        for name, val in scope.as_dict().items():
            cond = cond & F.col(name).eqNullSafe(F.lit(val))
        return df.filter(cond).limit(1).count() > 0

    def delete_scope(
        self, spark: SparkSession, table: str, query_id: int, scope: Scope
    ) -> int:
        """Idempotence half of delete+insert: drop the (queryId, scope)
        slice in one driver-side statement (the slice is report-sized
        by construction).  Returns rows deleted."""
        conn = self._connect(spark)
        try:
            stored = self._resolve_table(conn, table)
            if stored is None:
                return 0
            st = conn.createStatement()
            try:
                return st.executeUpdate(
                    f"DELETE FROM {stored} "
                    f"WHERE {self._scope_where(spark, query_id, scope)}"
                )
            finally:
                st.close()
        finally:
            conn.close()

    def ensure_columns(
        self, spark: SparkSession, df: DataFrame, table: str
    ) -> list[str]:
        """Schema evolution on append (S7): ``ALTER TABLE ADD COLUMN``
        for fact-query columns the target table lacks — add-only, like
        ``modifyTableStruct`` (OLAP.php:177-199); existing rows read
        the new columns as NULL.  Narrowing/type changes are NOT
        attempted (the parquet sink's contract, kept symmetric)."""
        conn = self._connect(spark)
        try:
            stored = self._resolve_table(conn, table)
            if stored is None:
                return []
            have = {c.lower() for c in self._table_columns(conn, stored)}
            added = []
            for f_ in df.schema.fields:
                if f_.name.lower() in have:
                    continue
                ddl = self._jdbc_type(spark, f_.dataType)
                st = conn.createStatement()
                try:
                    st.executeUpdate(
                        f"ALTER TABLE {stored} ADD COLUMN "
                        f"{self._quote(spark, f_.name)} {ddl}"
                    )
                finally:
                    st.close()
                added.append(f_.name)
            return added
        finally:
            conn.close()

    def write_scope(
        self,
        spark: SparkSession,
        df: DataFrame,
        table: str,
        query_id: int,
        scope: Scope,
    ) -> None:
        """Idempotent per-scope materialization: widen the table if the
        fact grew columns, DELETE the (queryId, scope) slice (cures a
        half-written scope a crashed run left behind — the case the
        reference's row loop turns into permanent duplicates), then
        parallel batched INSERT via Spark's JDBC writer.  First write
        auto-creates the table (S6)."""
        if self.exists(spark, table):
            self.ensure_columns(spark, df, table)
            self.delete_scope(spark, table, query_id, scope)
        writer = (
            df.write.format("jdbc")
            .mode("append")
            .option("url", self.url)
            .option("dbtable", table)
        )
        if self.driver:
            writer = writer.option("driver", self.driver)
        opts = dict(self.options)
        if "createTableColumnTypes" not in opts:
            strings = [
                f.name for f in df.schema.fields
                if isinstance(f.dataType, T.StringType)
            ]
            if strings:
                opts["createTableColumnTypes"] = ", ".join(
                    f"{c} VARCHAR(255)" for c in strings
                )
        for k, v in opts.items():
            writer = writer.option(k, str(v))
        writer.save()
