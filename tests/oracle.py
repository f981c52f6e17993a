"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
tables and compares row count, column names, and an order-insensitive
value hash — so operators can be verified at sf0.001/sf0.01 before the
driver's gate runs.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb

from opl_spark.sources.registry import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_signature(columns, rows) -> tuple[int, tuple[str, ...], str]:
    cols = list(columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = tuple(cols[i] for i in order)
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(lines), sorted_cols, digest


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    """Returns a dict with per-aspect match booleans + diagnostics."""
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    con = duck_connection(sf_dir)
    res = con.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()
    sn, sc, sh = frame_signature(scols, srows)
    on, oc, oh = frame_signature(ocols, orows)
    return {
        "rows_match": sn == on,
        "schema_match": sc == oc,
        "hash_match": sh == oh,
        "spark": {"rows": sn, "cols": sc, "hash": sh},
        "oracle": {"rows": on, "cols": oc, "hash": oh},
        "spark_sample": srows[:3],
        "oracle_sample": orows[:3],
    }


def assert_parity(spark_df, oracle_sql: str, sf_dir: str) -> None:
    from pyspark.sql import types as T

    # decimal output columns are forbidden across the whole workload:
    # trailing-zero decimal reprs canonicalize differently between the
    # driver's two hash sides (the round-1 hash-red class). Fractional
    # results must surface as round(cast(double), n).
    decs = [
        f.name for f in spark_df.schema.fields if isinstance(f.dataType, T.DecimalType)
    ]
    assert not decs, f"decimal-typed output columns {decs} — emit round(double, n) instead"
    r = compare(spark_df, oracle_sql, sf_dir)
    assert r["rows_match"], f"row count mismatch: {r['spark']['rows']} vs {r['oracle']['rows']}"
    assert r["schema_match"], f"schema mismatch: {r['spark']['cols']} vs {r['oracle']['cols']}"
    assert r["hash_match"], (
        f"value hash mismatch\nspark sample: {r['spark_sample']}\noracle sample: {r['oracle_sample']}"
    )
