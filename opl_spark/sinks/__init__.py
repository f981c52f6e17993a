"""Snapshot sinks beyond the parquet warehouse."""

from opl_spark.sinks.jdbc import JdbcSink

__all__ = ["JdbcSink"]
