"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
tables and compares row count, column names, and an order-insensitive
value hash — so operators can be verified at sf0.001/sf0.01 before the
driver's gate runs.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

import duckdb

# pandas Timestamp (ns resolution) bounds: the driver's compare path
# converts oracle results through pandas, so any datetime outside
# [1677-09-21, 2262-04-11] raises OutOfBoundsDatetime there even though
# fetchall() handles it fine here (the r4 q_scd2 red: a 9999-12-31
# Kimball sentinel).  Screen values, not types — the type is innocent.
_NS_MIN = datetime.datetime(1677, 9, 22)
_NS_MAX = datetime.datetime(2262, 4, 11)


def out_of_ns_bounds_columns(columns, rows) -> list[str]:
    bad = set()
    for r in rows:
        for c, v in zip(columns, r):
            if c in bad:
                continue
            if isinstance(v, datetime.datetime):
                if not (_NS_MIN <= v.replace(tzinfo=None) <= _NS_MAX):
                    bad.add(c)
            elif isinstance(v, datetime.date):
                if not (_NS_MIN.date() <= v <= _NS_MAX.date()):
                    bad.add(c)
    return sorted(bad)

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
    """Returns a dict with per-aspect match booleans + diagnostics.

    ``oracle_types`` carries the DuckDB result column types so callers
    can reject version-sensitive emissions (see EXOTIC_ORACLE_TYPES).
    """
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    con = duck_connection(sf_dir)
    rel = con.sql(oracle_sql)
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()
    con.close()
    sn, sc, sh = frame_signature(scols, srows)
    on, oc, oh = frame_signature(ocols, orows)
    return {
        "rows_match": sn == on,
        "schema_match": sc == oc,
        "hash_match": sh == oh,
        "spark": {"rows": sn, "cols": sc, "hash": sh},
        "oracle": {"rows": on, "cols": oc, "hash": oh},
        "oracle_types": dict(zip(ocols, otypes)),
        "spark_sample": srows[:3],
        "oracle_sample": orows[:3],
        "out_of_ns_bounds": out_of_ns_bounds_columns(ocols, orows)
        + out_of_ns_bounds_columns(scols, srows),
    }


def exotic_oracle_columns(types: dict[str, str]) -> list[str]:
    """Oracle output columns whose DuckDB type does not survive every
    client conversion path identically.

    This replica fetches via ``fetchall()`` (HUGEINT → Python int →
    str(v) matches Spark's bigint), but the driver's compare converts
    through pandas/arrow, where HUGEINT becomes float64 or
    decimal128 depending on the DuckDB version — the round-3 class of
    hash-red-with-green-rows failures (q_repetition, q_split_sample,
    q_vocab_build, q_token_entropy, q_corpus_stats: each emitted a
    bare ``SUM(bigint)``, which DuckDB widens to HUGEINT).  Oracles
    must CAST every integer aggregate to BIGINT; DECIMAL is already
    forbidden on the Spark side by assert_parity.
    """
    bad = []
    for c, t in types.items():
        u = t.upper()
        if (
            u in ("HUGEINT", "UHUGEINT")
            or u.startswith("UINT")
            or u.startswith("UTINYINT")
            or u.startswith("USMALLINT")
            or u.startswith("UBIGINT")
            or u.startswith("DECIMAL")
        ):
            bad.append(f"{c}:{t}")
    return bad


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
    exotic = exotic_oracle_columns(r["oracle_types"])
    assert not exotic, (
        f"oracle emits version-sensitive column types {exotic} — "
        "CAST integer aggregates to BIGINT (driver hash-red class)"
    )
    assert not r["out_of_ns_bounds"], (
        f"datetime values outside pandas ns bounds in {r['out_of_ns_bounds']} — "
        "the driver's pandas compare raises OutOfBoundsDatetime (r4 q_scd2 red); "
        "use a sentinel within [1677-09-22, 2262-04-11]"
    )
    assert r["rows_match"], f"row count mismatch: {r['spark']['rows']} vs {r['oracle']['rows']}"
    assert r["schema_match"], f"schema mismatch: {r['spark']['cols']} vs {r['oracle']['cols']}"
    assert r["hash_match"], (
        f"value hash mismatch\nspark sample: {r['spark_sample']}\noracle sample: {r['oracle_sample']}"
    )
