"""Physical-plan inspection — the engine's scale contract is that cut
compilation reaches the scan (partition pruning / predicate pushdown /
column pruning), and these helpers make that checkable in tests and
operable in production triage ("why is this query scanning history?").

Built on ``EXPLAIN FORMATTED`` over a temp view — public SQL surface,
no JVM internals.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_PROBE = "_opl_plan_probe"


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of a DataFrame's plan."""
    df.createOrReplaceTempView(_PROBE)
    rows = df.sparkSession.sql(f"EXPLAIN FORMATTED SELECT * FROM {_PROBE}").collect()
    return "\n".join(r[0] for r in rows)


def _scan_lines(df: DataFrame, field: str) -> list[str]:
    pat = re.compile(rf"{field}:\s*\[(.*?)\]")
    out = []
    for ln in formatted_plan(df).splitlines():
        m = pat.search(ln)
        if m is not None:
            out.append(m.group(1))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Per-scan partition filter lists (empty string = unpruned scan)."""
    return _scan_lines(df, "PartitionFilters")


def pushed_filters(df: DataFrame) -> list[str]:
    """Per-scan pushed-down data filter lists."""
    return _scan_lines(df, "PushedFilters")


def read_schemas(df: DataFrame) -> list[str]:
    """Per-scan read schemas (column-pruning evidence)."""
    out = []
    for ln in formatted_plan(df).splitlines():
        if "ReadSchema:" in ln:
            out.append(ln.split("ReadSchema:", 1)[1].strip())
    return out
