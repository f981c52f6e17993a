"""End-to-end training-data pipeline: the full corpus path a user of
the engine would run — clean → language gate → quality gate → exact +
near dedup → decontaminate vs a bench set → per-domain budget → pack →
export — composed from the public operator API, with invariants checked
at every stage boundary.

This is the integration story: each stage is individually oracle- or
property-tested elsewhere; here the point is that they compose on one
SparkSession, every intermediate stays a DataFrame (nothing collects
the corpus), and the final artifact round-trips.
"""

import os

from pyspark.sql import functions as F

from opl_spark.operators.dedup import contamination, exact_dedup, ngram_jaccard_pairs, keep_best_dedup
from opl_spark.operators.sampling import budget_sample
from opl_spark.operators.text import (
    clean_text_col,
    export_jsonl,
    lang_id_col,
    pack_sequences,
    quality_columns,
    token_count_col,
)
from opl_spark.sources import load_table


def test_full_training_pipeline(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. clean + annotate (one fused map stage)
    qc = quality_columns(F.col("text"))
    staged = docs.select(
        "doc_id",
        "source",
        clean_text_col(F.col("text")).alias("text"),
        lang_id_col(F.col("text")).alias("lang"),
        qc["n_words"].alias("n_words"),
        qc["stopword_ratio"].alias("stopword_ratio"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )

    # 2. language + quality gates
    gated = staged.filter((F.col("lang") == "en") & (F.col("n_words") >= 10))
    assert 0 < gated.count() <= n_raw

    # 3. exact dedup (keep min-id representative)
    keepers = exact_dedup(gated, ["text"], "doc_id").select(
        F.col("keeper").alias("doc_id")
    )
    exact_kept = gated.join(keepers, "doc_id")

    # 4. near-dedup with quality-aware keep rule
    pairs = ngram_jaccard_pairs(exact_kept, "text", "doc_id", n=3, threshold=0.2)
    keep = keep_best_dedup(pairs, exact_kept, "doc_id", "n_tokens")
    drop = keep.filter(F.col("doc") != F.col("keeper")).select(
        F.col("doc").alias("doc_id")
    )
    deduped = exact_kept.join(drop, "doc_id", "left_anti")
    n_dedup = deduped.count()
    assert n_dedup <= exact_kept.count()

    # 5. decontaminate against a held-out "benchmark" (first 5 docs)
    bench = docs.filter(F.col("doc_id") < 5)
    contaminated = contamination(deduped, bench, "text", "doc_id", n=5).filter(
        F.col("n_overlap") > 0
    ).select(F.col("doc").alias("doc_id"))
    final_docs = deduped.join(contaminated, "doc_id", "left_anti")

    # 6. per-domain budget, then pack into training sequences
    capped = budget_sample(final_docs, "source", "doc_id", budget=40)
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 40 for r in per)
    packed = pack_sequences(capped, "text", "doc_id", "source", budget=512)
    seq_sizes = packed.groupBy("grp", "shard", "seq_id").agg(
        F.sum("n_tokens").alias("toks"), F.count(F.lit(1)).alias("docs")
    )
    # a sequence overflows its budget by at most one document
    assert seq_sizes.filter(
        (F.col("docs") > 1) & (F.col("toks") > 512 + capped.agg(F.max("n_tokens")).first()[0])
    ).count() == 0

    # 7. export + round-trip
    out = os.path.join(str(tmp_path), "corpus")
    export_jsonl(capped.select("doc_id", "source", "lang", "text"), out, shards=4)
    back = spark.read.json(out)
    assert back.count() == capped.count()
    assert sorted(back.columns) == ["doc_id", "lang", "source", "text"]
