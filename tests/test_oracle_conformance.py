"""Driver-compare contract conformance for every registered oracle.

The driver's correctness gate hashes the DuckDB oracle result after a
pandas/arrow conversion, while the local replica (tests/oracle.py)
fetches native Python values.  Types whose client conversion differs by
DuckDB version (HUGEINT/unsigned → float64 or decimal128) therefore
pass locally and hash-red at the driver — the round-3 failure class
(q_repetition, q_split_sample, q_vocab_build, q_token_entropy,
q_corpus_stats, each emitting a bare SUM(bigint) = HUGEINT).

This test mechanically rejects any registered oracle that EMITS such a
type, so the failure class dies locally before a driver round ever
sees it.  Normalization notes for the replica:

- floats: repr() of the Python float (both engines emit IEEE doubles;
  ROUND(x, 6) keeps cross-engine formatting stable — never hash a raw
  transcendental),
- NULL → "NULL"; bool → "0"/"1" (int-normalized),
- integers: str(int) — requires the oracle side to be BIGINT-or-
  narrower so every fetch path yields a Python int.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from opl_spark import workload
from tests.oracle import exotic_oracle_columns

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    from opl_spark.sources.registry import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t + '.parquet')}')"
        )
    yield con
    con.close()


@pytest.mark.slow  # r14 slow tier
def test_oracle_values_survive_pandas_conversion(duck):
    """Conversion-path invariance: every oracle's result must carry
    the SAME canonical values whether fetched natively (fetchall —
    the local replica's path) or through pandas (a driver-like
    conversion path).  Representation-only differences that every
    client normalizes identically on both sides are canonicalized
    away (date → midnight Timestamp, nullable int → float64); what
    must NOT survive is true value drift — precision loss from a wide
    integer squeezed through float64 (the HUGEINT class: 2⁵³-adjacent
    totals), decimal scale artifacts, overflow wraps."""
    import datetime
    import math
    from decimal import Decimal

    from tests.oracle import frame_signature

    def canon(v):
        if v is None or v != v:  # None, NaN, NaT (all non-self-equal)
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            if v.is_integer() and abs(v) < 2**53:
                return int(v)
            return v
        if isinstance(v, Decimal):
            return int(v) if v == v.to_integral_value() else float(v)
        if isinstance(v, datetime.datetime):
            return v.isoformat()
        if isinstance(v, datetime.date):
            return datetime.datetime(v.year, v.month, v.day).isoformat()
        if hasattr(v, "isoformat"):  # pandas Timestamp
            return canon(v.to_pydatetime())
        return v

    oracles = workload.oracle_sql()
    bad = {}
    for name, sql in oracles.items():
        rel = duck.sql(sql)
        cols = list(rel.columns)
        native = [tuple(canon(x) for x in r) for r in rel.fetchall()]
        pdf = duck.sql(sql).df()
        via_pandas = [
            tuple(canon(x) for x in row)
            for row in pdf.itertuples(index=False, name=None)
        ]
        _, _, h1 = frame_signature(cols, native)
        _, _, h2 = frame_signature(cols, via_pandas)
        if h1 != h2:
            bad[name] = {"native": native[:2], "pandas": via_pandas[:2]}
    assert not bad, f"pandas-path value drift in {len(bad)} oracles: {bad}"


def test_documents_corpus_is_ascii(duck):
    """The fake-codec multimodal oracles (phash / scene-change /
    waveform / ocr in workload_ext.py) equate DuckDB characters with
    UTF-8 bytes (len(text), ascii()); the operators run on encoded
    media BYTES.  Parity therefore assumes an ASCII-only corpus —
    assert it loudly so a corpus change fails here, not as a silent
    driver hash-red."""
    n = duck.sql(
        "SELECT count(*) FROM documents "
        "WHERE text IS NULL OR octet_length(encode(text)) <> len(text)"
    ).fetchone()[0]
    assert n == 0, (
        f"{n} non-ASCII/null documents — the multimodal char=byte "
        "oracle assumption is broken; rewrite those oracles byte-based"
    )


@pytest.mark.slow  # r14 slow tier
def test_no_oracle_emits_out_of_ns_bounds_datetimes(duck):
    """The driver's compare path converts oracle results through
    pandas ns-resolution Timestamps (bounds 1677-09-22 .. 2262-04-11).
    duckdb's own .df() conversion tolerates wider values, so the
    pandas-drift test above cannot catch them — the r4 q_scd2 red (a
    9999-12-31 Kimball sentinel → OutOfBoundsDatetime at the driver,
    green locally).  Screen raw values per oracle."""
    from tests.oracle import out_of_ns_bounds_columns

    oracles = workload.oracle_sql()
    offenders = {}
    for name, sql in oracles.items():
        rel = duck.sql(sql)
        cols = list(rel.columns)
        bad = out_of_ns_bounds_columns(cols, rel.fetchall())
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting datetimes outside pandas ns bounds (driver "
        f"OutOfBoundsDatetime class — use an in-bounds sentinel): {offenders}"
    )


def test_no_oracle_emits_version_sensitive_types(duck):
    oracles = workload.oracle_sql()
    assert oracles, "no oracles registered"
    offenders = {}
    for name, sql in oracles.items():
        rel = duck.sql(sql)
        types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        bad = exotic_oracle_columns(types)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting HUGEINT/unsigned/DECIMAL columns (driver "
        f"hash-red class — CAST to BIGINT): {offenders}"
    )
