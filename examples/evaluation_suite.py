"""Runnable evaluation + data-governance tour.

Usage:
    python examples/evaluation_suite.py [SF_DIR]

The round-5 tier: once a pipeline filters, dedups, and indexes data,
it needs SCORES for its own machinery — this tour runs the full report
card end to end:

1.  classifier quality: histogram-binned ROC-AUC (the bin-table
    algorithm — no global sort at any scale) and expected calibration
    error of a pseudo-probability against held labels;
2.  labelling-heuristic agreement: Cohen's kappa between the corpus's
    language labels and the marker-based detector;
3.  retrieval quality of the embedding index: precision@10, nDCG@10,
    and MRR@10 against label agreement — per-query rows so misses are
    attributable;
4.  distribution health: per-source Zipf slope (template-spam signal),
    PSI drift between month halves, readability bands, and
    Kneser-Ney bigram scores (the boilerplate detector raw-MLE
    bigrams miss);
5.  governance: k-anonymity's companion l-diversity audit, and the
    deterministic curriculum interleave that turns mixing weights into
    an exact training order.

Every metric reduces to BIGINT sums with one final division — the same
integer-exactness contract the DuckDB oracles hash-check per round.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from opl_spark.operators.evaluate import (  # noqa: E402
    cohens_kappa,
    ece_binned,
    mrr_eval,
    psi_drift,
    retrieval_eval,
    roc_auc_binned,
)
from opl_spark.operators.sampling import curriculum_interleave  # noqa: E402
from opl_spark.operators.text import (  # noqa: E402
    kneser_ney_logprob,
    lang_id_col,
    readability_scores,
    zipf_slope,
)
from opl_spark.session import get_spark  # noqa: E402
from opl_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="opl-evaluation-tour")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    events = load_table(spark, sf_dir, "events")

    print("== classifier quality ==")
    auc = roc_auc_binned(
        emb, F.col("embedding")[0], (F.col("label") < 5).cast("long")
    ).collect()[0]
    print(f"ROC-AUC of dim0 vs label<5: {auc['auc']} "
          f"({auc['n_pos']} pos / {auc['n_neg']} neg)")
    prob = F.least(
        F.greatest(F.col("embedding")[0].cast("double") + F.lit(0.5), F.lit(0.0)),
        F.lit(1.0),
    )
    ece = ece_binned(emb, prob, (F.col("label") < 5).cast("long")).collect()[0]
    print(f"ECE: {ece['ece']} (worst bin {ece['worst_bin']})")

    print("\n== labelling agreement ==")
    kap = cohens_kappa(docs, F.col("lang"), lang_id_col(F.col("text"))).collect()[0]
    print(f"lang label vs detector: kappa={kap['kappa']} "
          f"(po={kap['po']}, pe={kap['pe']})")

    print("\n== retrieval quality (20 queries, k=10) ==")
    rq = retrieval_eval(emb, "embedding", "vec_id", "label").agg(
        F.round(F.avg("precision"), 4).alias("p"),
        F.round(F.avg("ndcg"), 4).alias("n"),
    ).collect()[0]
    mrr = mrr_eval(emb, "embedding", "vec_id", "label").agg(
        F.round(F.avg("rr"), 4).alias("m")
    ).collect()[0]
    print(f"precision@10={rq['p']}  nDCG@10={rq['n']}  MRR@10={mrr['m']}")

    print("\n== distribution health ==")
    for r in zipf_slope(docs, "text", "source").orderBy("grp").limit(3).collect():
        print(f"zipf slope {r['grp']}: {r['slope']}")
    psi = psi_drift(
        events, F.col("value"),
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp"),
        bin_width=25.0, n_bins=20,
    ).collect()[0]
    print(f"PSI first-half vs second-half: {psi['psi']}")
    fre = readability_scores(docs, "text", "doc_id").agg(
        F.round(F.avg("fre"), 2).alias("f")
    ).collect()[0]
    print(f"mean Flesch reading-ease: {fre['f']}")
    kn = kneser_ney_logprob(docs, "text", "doc_id")
    worst = kn.orderBy(F.col("avg_nll").desc()).limit(3).collect()
    print("highest-NLL docs (boilerplate candidates):",
          [(r["doc"], r["avg_nll"]) for r in worst])

    print("\n== governance + ordering ==")
    risky = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count_distinct("user_id").alias("l")).filter(F.col("l") < 3).count()
    print(f"l-diversity (l=3) failing groups: {risky}")
    sched = curriculum_interleave(docs, "doc_id", "source")
    head = sched.orderBy("sched_key", "grp", "id").limit(6).collect()
    print("training-order head:", [(r["grp"], r["id"]) for r in head])

    spark.stop()


if __name__ == "__main__":
    main()
