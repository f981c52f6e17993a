"""Event-stream analytics: ordered funnels, retention cohorts,
outlier screens — the product-analytics tier a warehouse serves next
to its OLAP cubes (the reference's events use case generalized; no
reference analogue, same Spark-first discipline).

Scale shapes:
- every per-user reduction is a map-side-combinable groupBy on
  ``user_id``; chained funnel stages join on that same key, so one
  hash partitioning serves the whole pipeline (no re-shuffle between
  stages under AQE);
- outputs are report-sized (steps, cohort×offset cells, event types),
  never event-sized;
- the z-score screen is EXACT integer/decimal arithmetic — no float
  mean/variance on the comparison path, so borderline rows cannot
  flip across engines or partitionings (the same determinism rule the
  cube's decimal money sums follow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel: a user reaches step i by doing ``steps[i]``
    STRICTLY AFTER their step i-1 time (first qualifying occurrence).
    Emits ``(step, step_name, n_users)`` — one row per step.

    Stage i is a groupBy(user).min(ts) over events of type i gated by
    the previous stage's time: user-keyed joins all the way down, and
    the final count-per-stage is one pass over the joined per-user
    step-time table (counts are column counts, so no per-step jobs).
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    )
    stage = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t0"))
    )
    acc = stage
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("et") == s)
            .join(acc.select("u", F.col(f"t{i-1}")), "u")
            .filter(F.col("t") > F.col(f"t{i-1}"))
            .groupBy("u")
            .agg(F.min("t").alias(f"t{i}"))
        )
        acc = acc.join(nxt, "u", "left")
    counts = acc.agg(
        *[F.count(F.col(f"t{i}")).alias(f"n{i}") for i in range(len(steps))]
    )
    stack = ", ".join(
        f"{i}, '{s}', n{i}" for i, s in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, step_name, n_users)"
    )


def retention_cohorts(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted distinct in each later week —
    ``(cohort_week, week_offset, n_users)``.

    Two combinable aggregations around one user-keyed join: first-seen
    is a user-sized groupBy-min; the event stream joins that on
    ``user_id`` (broadcast when the user dimension fits, hash
    co-partitioned otherwise) and reduces straight to cohort×offset
    cells.  The distinct is over (cohort, offset, user) — bounded by
    users × active weeks, not events.
    """
    ev = df.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("w"),
    )
    firsts = ev.groupBy("u").agg(F.min("w").alias("cohort_week"))
    return (
        ev.join(firsts, "u")
        .select(
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            "u",
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z: int = 3,
    value_decimals: int = 2,
) -> DataFrame:
    """Per-group outlier screen: count values with ``|value - mean| >
    z·stddev_pop`` — computed EXACTLY.

    Float means/variances differ across engines and reduce orders in
    the last ulps, which can flip borderline rows and break result
    reproducibility.  Instead, values are scaled to integers
    (``value_decimals`` fixed decimals), and the test
    ``(v-μ)² > z²σ²`` is cleared of divisions:

        (n·V - S)² > z² · (n·S2 - S²)

    with S=Σv, S2=Σv² as DECIMAL(38,0) sums — exact, order-independent,
    identical on any engine.  Emits ``(group, n, n_outliers, mean)``;
    the reported mean is the one float op (one division of two exact
    integers — bit-identical everywhere).
    """
    scale = 10**value_decimals
    big = "decimal(38,0)"
    v = F.round(F.col(value_col) * scale).cast("long")
    ev = df.select(F.col(group_col).alias("grp"), v.alias("v"))
    stats = ev.groupBy("grp").agg(
        F.count(F.lit(1)).cast(big).alias("n"),
        F.sum(F.col("v").cast(big)).alias("s"),
        F.sum((F.col("v").cast(big) * F.col("v").cast(big))).alias("s2"),
    )
    dev = F.col("n") * F.col("v").cast(big) - F.col("s")
    bound = F.lit(z * z).cast(big) * (
        F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    )
    return (
        ev.join(stats, "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((dev * dev > bound).cast("long")).alias("n_outliers"),
            F.round(
                F.max(F.col("s")).cast("double")
                / (F.max(F.col("n")).cast("double") * scale),
                6,
            ).alias("mean"),
        )
    )
