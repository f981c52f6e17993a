"""Data-layout operators: Z-order (Morton) interleaving for
multi-dimensional file clustering.

A 100 TB table cut on TWO dimensions (e.g. `date` AND
`organization`) can only be range-partitioned on one of them; sorting
files by the bit-interleaved Z-key of both keeps rows close in BOTH
dimensions, so every file's min/max footer stats span a small
rectangle and a cut on either dimension skips most files.  This is
the standard `OPTIMIZE ... ZORDER BY` layout trick expressed as plain
column arithmetic — a sort key, not a new storage format.

Everything is literal-shift bit math (codegen'd, no UDF), and
`zorder_sql` emits the byte-identical ANSI-SQL expression so the
transform is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative) input
    column into one Morton key: bit ``b`` of dimension ``d`` lands at
    output bit ``b * ndims + d``.  All shifts are by literal amounts —
    the whole key is one codegen'd expression."""
    ndims = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ndims + d))
    return key


def zorder_sql(exprs: list[str], bits: int = 8) -> str:
    """The ANSI-SQL expression computing ``zorder_key`` over the given
    column expressions — same bit placement, engine-portable (`&`,
    `|`, `>>`, `<<`)."""
    ndims = len(exprs)
    terms = []
    for b in range(bits):
        for d, e in enumerate(exprs):
            # every term fully parenthesized: engines disagree on the
            # relative precedence of `<<` vs `&`/`|`
            terms.append(f"(((({e}) >> {b}) & 1) << {b * ndims + d})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame, dims: list[Column], bits: int = 8, key_name: str = "zkey"
) -> DataFrame:
    """Attach the Z-key and repartition-by-range + sort on it — the
    write-side layout step.  `repartitionByRange` samples the key
    distribution, so output files tile the Z-curve evenly even when
    the dimensions are skewed."""
    keyed = df.withColumn(key_name, zorder_key(dims, bits))
    return keyed.repartitionByRange(key_name).sortWithinPartitions(key_name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
) -> None:
    """Range-clustered parquet write: repartitionByRange on the sort
    key (each output file owns a contiguous, non-overlapping key
    range) + sortWithinPartitions (rows ordered inside each file, so
    every parquet ROW GROUP's min/max footer stats span a narrow
    slice).  A point or range filter on the key then skips whole
    files from the footer alone — the single-dimension complement to
    the Z-order key (use zorder for multi-dimension cuts).

    Writer-side only: no new storage format, no table metadata — the
    pruning contract is plain parquet statistics, verified in
    tests/test_bucketing.py by reading the footers back."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
) -> None:
    """Parquet write with column BLOOM FILTERS: point-lookup pruning
    for high-cardinality columns whose min/max stats are useless
    (uuids, hashes — every file spans the whole value range, so range
    stats skip nothing, but a bloom probe skips files that provably
    lack the key).  Complements ``write_sorted`` (range keys) and
    Z-order (multi-dim): bloom is the layout tool for exact-match
    predicates on unsorted keys.  ``ndv`` sizes the filter
    (~1.2 bytes/value at the default FPP)."""
    w = df.write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
        )
    w.parquet(path)
