"""Skew mitigation: salted two-phase aggregation.

A groupBy on a skewed key (one event type = 40% of a 100 TB stream)
sends the hot key's entire volume to one reducer.  Salting splits each
key into ``salt_buckets`` sub-groups for a partial aggregate, then
re-aggregates the partials — the hot key's work spreads across
``salt_buckets`` tasks and the second shuffle moves only
keys×buckets rows.  Semantically transparent for any reassociative
aggregate (sum/count/min/max), so results stay oracle-identical.

Note Spark's hash aggregation already does map-side partial
aggregation, which handles *moderate* skew; explicit salting matters
when per-key state is too big for the map side (huge distinct sets,
collect_list) or when AQE's skew handling can't apply (it only splits
sort-merge-join partitions, not aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 32,
    salt_from: Column | None = None,
) -> DataFrame:
    """Two-phase salted sum: partial sums per (key, salt), then final
    per key.  ``salt_from`` picks the column(s) the salt hashes —
    ideally something high-cardinality; the default hashes the value
    column itself, which is always present and keeps the salt a pure
    function of the row (deterministic under task retry and across
    runs, unlike ``monotonically_increasing_id``).  Sums are
    reassociative, so any salt distribution is correct — determinism
    just makes retries and run-to-run plans reproducible."""
    salt = F.pmod(
        F.xxhash64(salt_from if salt_from is not None else F.col(value_col)),
        F.lit(salt_buckets),
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(f"sum_{value_col}"))


def salted_distinct_count(
    df: DataFrame, key_cols: list[str], distinct_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT) without hot-key distinct-set state: stage
    1 dedups on (key, value) — the value spreads the hot key across
    reducers naturally — stage 2 counts per key."""
    deduped = df.select(*key_cols, distinct_col).distinct()
    return deduped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias(f"n_distinct_{distinct_col}")
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[tuple[str, str]],
    salt_buckets: int = 16,
    salt_from: Column | None = None,
) -> DataFrame:
    """Hot-key equi-join without a hot partition: the (small) build
    side is REPLICATED once per salt bucket and the probe side hashes
    each row to one bucket, so a key holding 40% of the probe stream
    spreads over ``salt_buckets`` reducers instead of one.

    ``on`` is a list of (probe_col, build_col) pairs.  The salt is a
    pure function of the probe row (``salt_from``, default the first
    probe key) — deterministic under task retry.  Semantically
    transparent for any join type that doesn't need the build side's
    multiplicity changed (inner/left-semi style equi-joins): every
    probe row still meets every matching build row exactly once,
    because it lands in exactly one of the replicas.

    When AQE's skew-join split applies (sort-merge joins) prefer it —
    this operator is for the cases it can't touch: shuffled hash
    joins, aggregate-state hot spots downstream, or a deliberately
    pinned physical layout.  Replication cost = build_rows ×
    salt_buckets, so keep the build side dimension-sized.
    """
    pkeys = [p for p, _ in on]
    salt = F.pmod(
        F.xxhash64(salt_from if salt_from is not None else F.col(pkeys[0])),
        F.lit(salt_buckets),
    )
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    cond = [p[pc] == b[bc] for pc, bc in on] + [p["__salt"] == b["__salt"]]
    return p.join(b, cond).drop(b["__salt"]).drop("__salt")
