"""widen_narrow_scan (r13): the scale-adaptive parallelism floor for
compute-bound map stages over narrow (single-row-group / few-split)
scans.  Pins the three contract points: identity on already-wide
input, widening on narrow input, and result invariance through a
partitioning-sensitive-looking consumer (grouped-bucket collect)."""

from pyspark.sql import functions as F

from opl_spark.operators.dedup import (
    ngram_jaccard_pairs,
    widen_narrow_scan,
)
from opl_spark.sources import load_table


def test_widen_narrow_scan_widens_single_partition_scan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.rdd.getNumPartitions()
    target = spark.sparkContext.defaultParallelism
    widened = widen_narrow_scan(docs)
    if n0 >= target:
        # already wide: MUST be the identity (no exchange added) —
        # this is what makes the helper scale-safe
        assert widened is docs
    else:
        assert widened.rdd.getNumPartitions() == target


def test_widen_narrow_scan_identity_on_wide_input(spark, sf_dir):
    target = spark.sparkContext.defaultParallelism
    wide = load_table(spark, sf_dir, "documents").repartition(target + 4)
    assert widen_narrow_scan(wide) is wide


def test_widened_shingle_pairs_identical(spark, sf_dir):
    """The shingle-pair pipeline (sort_array'd grouped buckets) must
    emit the identical pair set on 1-partition and widened inputs —
    the house partitioning-invariance rule the widen relies on."""
    docs = load_table(spark, sf_dir, "documents")
    narrow = docs.coalesce(1)
    a = set(
        map(tuple, ngram_jaccard_pairs(narrow, "text", "doc_id", 3, 0.2).collect())
    )
    b = set(
        map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.2).collect())
    )
    assert a == b
