"""Runnable end-to-end training-data pipeline over the synthetic corpus.

Usage:
    python examples/training_pipeline.py [SF_DIR] [OUT_DIR]

Composes the public operator API the way a production corpus build
would: clean -> language/quality gates -> exact dedup -> quality-aware
near dedup -> benchmark decontamination -> per-domain budget ->
sequence packing -> sharded JSONL export.  Every stage stays a lazy
DataFrame; nothing corpus-sized touches the driver.  The same
composition runs unchanged on a cluster — the sf_dir just points at
bigger parquet.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from opl_spark.operators.dedup import (  # noqa: E402
    contamination,
    exact_dedup,
    keep_best_dedup,
    ngram_jaccard_pairs,
)
from opl_spark.operators.sampling import budget_sample  # noqa: E402
from opl_spark.operators.text import (  # noqa: E402
    clean_text_col,
    export_jsonl,
    lang_id_col,
    pack_sequences,
    quality_columns,
    token_count_col,
)
from opl_spark.session import get_spark  # noqa: E402
from opl_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/opl_corpus"
    spark = get_spark(app_name="training-pipeline")

    docs = load_table(spark, sf_dir, "documents")
    qc = quality_columns(F.col("text"))
    staged = docs.select(
        "doc_id",
        "source",
        clean_text_col(F.col("text")).alias("text"),
        lang_id_col(F.col("text")).alias("lang"),
        qc["n_words"].alias("n_words"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )
    gated = staged.filter((F.col("lang") == "en") & (F.col("n_words") >= 10))

    keepers = exact_dedup(gated, ["text"], "doc_id").select(
        F.col("keeper").alias("doc_id")
    )
    exact_kept = gated.join(keepers, "doc_id")

    # exact near-dup pair generation; at larger thresholds swap in
    # setsim_join (prefix filtering — same exact output, candidates
    # bounded by the rare-token tail instead of max_doc_freq), or
    # minhash_dedup_pairs for the approximate-candidate LSH path —
    # pick its (bands x rows) with the advisor, and pass
    # band_skip=True when only the thresholded pair SET feeds the
    # keep rule (all-bands-agreeing pairs bypass the exact verify):
    #   pick = lsh_banding_advise(threshold=0.5, signature_budget=64)[0]
    #   pairs = minhash_dedup_pairs(exact_kept, "text", "doc_id",
    #       threshold=0.5, bands=pick["bands"], band_skip=True)
    # (minhash_bucket_stats reports the measured candidate bill per
    # band before you commit to a banding at corpus scale)
    pairs = ngram_jaccard_pairs(exact_kept, "text", "doc_id", n=3, threshold=0.2)
    keep = keep_best_dedup(pairs, exact_kept, "doc_id", "n_tokens")
    drop = keep.filter(F.col("doc") != F.col("keeper")).select(
        F.col("doc").alias("doc_id")
    )
    deduped = exact_kept.join(drop, "doc_id", "left_anti")

    bench = docs.filter(F.col("doc_id") < 5)
    contaminated = (
        contamination(deduped, bench, "text", "doc_id", n=5)
        .filter(F.col("n_overlap") > 0)
        .select(F.col("doc").alias("doc_id"))
    )
    final_docs = deduped.join(contaminated, "doc_id", "left_anti")

    capped = budget_sample(final_docs, "source", "doc_id", budget=1000)
    packed = pack_sequences(capped, "text", "doc_id", "source", budget=2048)

    export_jsonl(capped.select("doc_id", "source", "lang", "text"), out_dir, shards=8)
    print(
        {
            "raw": docs.count(),
            "gated": gated.count(),
            "after_dedup": deduped.count(),
            "final": capped.count(),
            "sequences": packed.select("grp", "shard", "seq_id").distinct().count(),
            "out": out_dir,
        }
    )


if __name__ == "__main__":
    main()
