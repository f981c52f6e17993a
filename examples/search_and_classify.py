"""Runnable retrieval + classification tour over the synthetic corpus.

Usage:
    python examples/search_and_classify.py [SF_DIR]

Composes the round-3 retrieval/ML tier the way a production search or
labeling service would:

1. lexical leg   — BM25 top-k for a keyword query
2. dense leg     — brute-force cosine top-k for a probe embedding
3. fusion        — reciprocal-rank fusion (integer-exact contributions)
4. tagging       — per-document tf-idf keywords for the fused hits
5. classification— Naive Bayes trained on the 90% split, scoring the
                   held-out 10%, with the PR sweep over its margin
6. cost preview  — plans.inspect.cost_report on the fused query

Everything stays a lazy DataFrame until the final small collects
(top-k lists, report rows); the same composition runs unchanged on a
cluster.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from opl_spark.operators.similarity import hybrid_search_rrf  # noqa: E402
from opl_spark.operators.text import (  # noqa: E402
    bm25_search,
    naive_bayes_scores,
)
from opl_spark.plans.inspect import cost_report  # noqa: E402
from opl_spark.session import get_spark  # noqa: E402
from opl_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="search-and-classify")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    terms = ["hash", "join", "window"]
    probe = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]

    # 1+2+3 — hybrid retrieval
    fused = hybrid_search_rrf(
        docs, emb, "text", "doc_id", "embedding", "vec_id", terms, probe,
        k=5, shortlist=50,
    )
    print("hybrid top-5 (rrf_x, lex_rank, dense_rank):")
    fused.show(truncate=False)

    # 1 alone, for comparison
    print("bm25-only top-5:")
    bm25_search(docs, "text", "doc_id", terms, k=5).show()

    # 5 — held-out classification + margin
    train = docs.filter(F.col("doc_id") % 10 != 0)
    val = docs.filter(F.col("doc_id") % 10 == 0)
    post = naive_bayes_scores(train, val, "text", "lang", "doc_id")
    margins = (
        post.groupBy("doc")
        .agg(
            (
                F.max(F.when(F.col("label") == "en", F.col("logpost")))
                - F.max(F.when(F.col("label") != "en", F.col("logpost")))
            ).alias("en_margin")
        )
        .join(
            val.select(F.col("doc_id").alias("doc"), "lang"), "doc"
        )
    )
    print("NB 'en' margin vs true label (5 docs):")
    margins.orderBy(F.col("en_margin").desc()).show(5)

    # 6 — what would this cost before running it at scale?
    print("cost preview of the dense corpus scan feeding the fusion:")
    print(cost_report(docs.join(emb, docs["doc_id"] == emb["vec_id"])))

    spark.stop()


if __name__ == "__main__":
    main()
