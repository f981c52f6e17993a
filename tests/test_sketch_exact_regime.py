"""The sketch tier's exact regimes (r10 verdict task 6): below their
entry budgets, Theta / DataSketches-HLL / KLL sketches are exact data
structures, which is what lets q_theta_audience / q_hll_rollup /
q_kll_quantiles carry hash-checked DuckDB oracles at the sf0.01 gate
scale.  These tests pin the exactness CONVENTIONS the oracles rely on
— on adversarial sizes the sf0.01 data doesn't hit — so a Spark
upgrade that changes a rank rule or an exact-mode threshold fails here
first, not in a driver hash mismatch.

Past the budgets the sketches go probabilistic; that regime is covered
by the error-bound tests in test_operators.py.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("n", [1, 2, 3, 10, 99, 100, 101, 1000])
@pytest.mark.slow  # r14 slow tier
def test_kll_exact_regime_matches_quantile_disc(spark, n):
    """KLL(k=4096) below its k-item buffer holds every value, and its
    inclusive-rank get_quantile must equal DuckDB's quantile_disc on
    the same data — including the boundary cases where p·n is an exact
    integer (n=100 at p=0.5/0.9) and the degenerate n=1/2/3."""
    random.seed(17 + n)
    vals = [round(random.uniform(0, 1000), 3) for _ in range(n)]
    random.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "value: double").repartition(4)
    sk = df.agg(F.kll_sketch_agg_double("value", F.lit(4096)).alias("sk"))
    got = sk.select(
        *[
            F.round(
                F.kll_sketch_get_quantile_double("sk", F.lit(p)), 6
            ).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.5, 0.9, 0.99)
        ]
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES {}) v(x)".format(
        ", ".join(f"({v})" for v in vals)
    ))
    for p in (0.25, 0.5, 0.9, 0.99):
        want = con.execute(
            f"SELECT ROUND(CAST(quantile_disc(x, {p}) AS DOUBLE), 6) FROM t"
        ).fetchone()[0]
        assert got[f"p{int(p * 100)}"] == want, (n, p)


def test_kll_merge_preserves_exactness(spark):
    """Merging uncompacted KLL sketches (the daily→weekly rollup leg)
    stays exact: quantiles of the merged sketch equal exact order
    statistics of the concatenated stream."""
    random.seed(91)
    groups = [[round(random.uniform(0, 100), 3) for _ in range(sz)]
              for sz in (7, 40, 123)]
    rows = [(gi, v) for gi, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, "g: int, value: double")
    daily = df.groupBy("g").agg(
        F.kll_sketch_agg_double("value", F.lit(4096)).alias("sk")
    )
    merged = daily.agg(F.kll_merge_agg_double("sk").alias("sk"))
    got = merged.select(
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 6).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 6).alias("p99"),
    ).collect()[0]
    allv = sorted(v for g in groups for v in g)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES {}) v(x)".format(
        ", ".join(f"({v})" for v in allv)
    ))
    for col, p in (("p50", 0.5), ("p99", 0.99)):
        want = con.execute(
            f"SELECT ROUND(CAST(quantile_disc(x, {p}) AS DOUBLE), 6) FROM t"
        ).fetchone()[0]
        assert got[col] == want, p


def test_theta_exact_mode_set_algebra(spark):
    """Theta sketches below nominal k retain every hash: union /
    intersection / difference estimates equal exact set counts —
    the q_theta_audience oracle contract, on sets whose overlap
    pattern (disjoint / nested / partial) the event data may miss."""
    a = list(range(0, 300))          # 300 ids
    b = list(range(200, 450))        # overlap 100, new 150
    df = spark.createDataFrame(
        [("a", x) for x in a] + [("b", x) for x in b], "s: string, uid: long"
    )
    sks = df.groupBy("s").agg(F.theta_sketch_agg("uid").alias("sk"))
    row = (
        sks.groupBy()
        .pivot("s", ["a", "b"])
        .agg(F.first("sk"))
        .select(
            F.theta_sketch_estimate(F.theta_union("a", "b")).cast("long").alias("u"),
            F.theta_sketch_estimate(F.theta_intersection("a", "b")).cast("long").alias("i"),
            F.theta_sketch_estimate(F.theta_difference("b", "a")).cast("long").alias("new"),
            F.theta_sketch_estimate(F.theta_difference("a", "b")).cast("long").alias("gone"),
        )
        .collect()[0]
    )
    assert (row["u"], row["i"], row["new"], row["gone"]) == (450, 100, 150, 200)


def test_hll_coupon_mode_is_exact_and_union_preserves_it(spark):
    """DataSketches HLL below its coupon budget is exact, and unioning
    exact sketches stays exact — the q_hll_rollup oracle contract at
    gate scale (~150 distinct users)."""
    rows = [(d, u) for d in range(7) for u in range(d * 20, d * 20 + 60)]
    df = spark.createDataFrame(rows, "d: int, uid: long")
    daily = df.groupBy("d").agg(F.hll_sketch_agg("uid").alias("sk"))
    est = (
        daily.agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").cast("long").alias("n"))
        .collect()[0]["n"]
    )
    exact = len({u for _, u in rows})
    assert est == exact
