"""Runnable tour of the rank-statistics + experimentation tier.

Usage:
    python examples/rank_and_experiment_stats.py [SF_DIR]

The round-10 second tranche: classical distribution-free statistics,
each computed the only way that survives 100 TB — the exact
tie-averaged rank comes from a two-pass range-partition scheme
(operators/ranking.py:avg_rank2; windows keyed by the partition id,
NEVER the single-task global window), and every moment sum is exact
decimal until the closing division:

1.  association, three ways: Pearson r (linear), Spearman ρ (monotone
    — rank-based, outlier-proof), Kendall τ-b (concordance from the
    joint contingency table: |cells|² broadcast work, never n²) over
    the same quantity↔price pair, so the three answers can disagree
    meaningfully;
2.  inequality: the Gini coefficient of per-customer revenue plus the
    Lorenz decile table it summarizes ("the bottom 40% of customers
    hold x% of revenue") — the whole-curve complement to the HHI
    report (q_revenue_concentration);
3.  two-sample testing: Mann-Whitney rank-sum z for "do urgent orders
    carry stochastically larger totals?" — distribution-free, so the
    heavy revenue tail can't fake or mask the shift;
4.  experiment readout: CUPED variance reduction (Deng et al., WSDM
    2013) over the event stream — pre-period spend as each user's
    covariate shrinks the readout variance by ρ², the same decision
    at a fraction of the sample.

Every statistic here is registered in the workload with a DuckDB
oracle (q_spearman, q_kendall_tau, q_gini, q_lorenz_deciles,
q_mann_whitney, q_cuped) and hash-checked per round; this tour just
makes the tier visible end to end.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from opl_spark.operators.evaluate import cuped_adjustment  # noqa: E402
from opl_spark.operators.ranking import (  # noqa: E402
    gini_coefficient,
    kendall_tau_b,
    lorenz_deciles,
    mann_whitney_u,
    spearman_rho,
)
from opl_spark.session import get_spark  # noqa: E402
from opl_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="rank-stats-tour", shuffle_partitions=8)

    # -- 1. association: Pearson vs Spearman vs Kendall ------------------
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
    )
    rho = spearman_rho(li, "x", "y").collect()[0]
    tau = kendall_tau_b(li, "x", "y").collect()[0]
    print(f"quantity↔price   spearman ρ = {rho['spearman_rho']}  "
          f"kendall τ-b = {tau['kendall_tau_b']}  (n = {rho['n']})")
    tau_d = kendall_tau_b(li, "x", "d").collect()[0]
    print(f"quantity↔discount kendall τ-b = {tau_d['kendall_tau_b']} "
          "(≈0: discounts don't track quantity)")

    # -- 2. inequality: Gini + the Lorenz table it summarizes ------------
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    g = gini_coefficient(per, "cents").collect()[0]
    print(f"\ncustomer revenue gini = {g['gini']}  "
          f"({g['n']} customers, {g['total'] / 100:.0f} total)")
    for r in sorted(lorenz_deciles(per, "cents").collect(),
                    key=lambda r: r["bucket"]):
        bar = "#" * int(round(50 * r["cum_share"]))
        print(f"  decile {r['bucket']:>2}  cum {r['cum_share']:>8.4f}  {bar}")

    # -- 3. two-sample: Mann-Whitney on priority vs order total ----------
    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("g"),
    )
    mw = mann_whitney_u(orders, "x", "g").collect()[0]
    print(f"\nurgent-vs-rest totals: U₁ = {mw['u1']:.1f}, "
          f"z = {mw['z']} (n₁ = {mw['n1']}, n₂ = {mw['n2']})")

    # -- 4. experimentation: CUPED readout over the event stream ---------
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    units = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, cents).otherwise(F.lit(0))).alias("x"),
            F.sum(F.when(F.col("ts") >= cut, cents).otherwise(F.lit(0))).alias("y"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    rows = {r["arm"]: r for r in cuped_adjustment(units, "x", "y", "arm").collect()}
    a, b = rows[0], rows[1]
    print(f"\nCUPED (θ = {a['theta']}):")
    print(f"  arm 0: raw {a['mean_raw']:.2f} → cuped {a['mean_cuped']:.2f}")
    print(f"  arm 1: raw {b['mean_raw']:.2f} → cuped {b['mean_cuped']:.2f}")
    print(f"  diff:  raw {b['mean_raw'] - a['mean_raw']:+.2f} → "
          f"cuped {b['mean_cuped'] - a['mean_cuped']:+.2f}")


if __name__ == "__main__":
    main()
