"""Edge-semantics tests for the round-2 pipeline operators: weighted
mixing (sampling), Bloom-prefiltered decontamination, Z-order layout,
and int8 embedding quantization.

The oracle parity suite (test_workload_parity) already checks these
end-to-end vs DuckDB; this file pins the semantics the hash compare
can't see — determinism across runs, exactness of the Bloom path vs
the broadcast path, and the Morton-key bit placement.
"""

import pytest
from pyspark.sql import functions as F

from opl_spark.operators.dedup import (
    bloom_contamination,
    bloom_might_contain,
    build_bloom,
    contamination,
)
from opl_spark.operators.layout import zorder_key, zorder_layout, zorder_sql
from opl_spark.operators.sampling import mix_sources
from opl_spark.operators.similarity import quantize_embeddings
from opl_spark.sources import load_table


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def _docs(spark):
    rows = [(i, f"src{i % 3}") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mix_weights_exact_epoch_counts(spark):
    df = _docs(spark)
    out = mix_sources(df, "source", "doc_id", {"src0": 2.5, "src1": 0.4, "src2": 0.0})
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # src0: 100 docs x 2 whole epochs + deterministic half => 250
    assert per["src0"] == 250
    # src1: deterministic 40% of 100 docs appear once
    assert per["src1"] == 40
    # src2: weight 0 drops every doc (and never hits sequence(1, 0))
    assert "src2" not in per


def test_mix_is_deterministic_and_epochs_are_1_based(spark):
    df = _docs(spark)
    w = {"src0": 1.7}
    a = sorted(map(tuple, mix_sources(df, "source", "doc_id", w).collect()))
    b = sorted(map(tuple, mix_sources(df, "source", "doc_id", w).collect()))
    assert a == b
    epochs = {r[-1] for r in a}
    assert min(epochs) == 1


# ---------------------------------------------------------------------------
# Bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_has_no_false_negatives(spark):
    hashes = spark.range(0, 500).select(F.xxhash64("id").alias("sh"))
    bloom = build_bloom(hashes, "sh", m_bits=1 << 12, k=5)
    misses = (
        spark.range(0, 500)
        .select(F.xxhash64("id").alias("sh"))
        .filter(~bloom_might_contain(F.col("sh"), bloom, 1 << 12, 5))
        .count()
    )
    assert misses == 0


def test_bloom_contamination_matches_broadcast_path(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)
    exact = sorted(map(tuple, contamination(corpus, bench, "text", "doc_id", n=5).collect()))
    bloomed = sorted(
        map(tuple, bloom_contamination(corpus, bench, "text", "doc_id", n=5).collect())
    )
    assert exact == bloomed


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zorder_bit_placement(spark):
    # x=0b11, y=0b01 at 2 bits/dim: bits interleave as y1 x1 y0 x0 = 0b0111
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    key = df.select(zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")).first()["z"]
    assert key == 0b0111


def test_zorder_sql_matches_column_expr(spark):
    df = spark.createDataFrame([(i, (i * 7) % 256) for i in range(64)], "x long, y long")
    via_col = df.select(zorder_key([F.col("x"), F.col("y")], bits=8).alias("z"))
    via_sql = df.select(F.expr(zorder_sql(["x", "y"], bits=8)).alias("z"))
    assert sorted(r["z"] for r in via_col.collect()) == sorted(
        r["z"] for r in via_sql.collect()
    )


def test_zorder_layout_sorts_within_partitions(spark):
    df = spark.createDataFrame(
        [(i % 50, (i * 13) % 50) for i in range(400)], "x long, y long"
    )
    out = zorder_layout(df, [F.col("x"), F.col("y")], bits=6)
    ordered = out.withColumn("pid", F.spark_partition_id())
    rows = ordered.select("pid", "zkey").collect()
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["zkey"])
    for keys in by_pid.values():
        assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------


def test_quantize_codes_bounded_and_error_small(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "embedding", "vec_id")
    row = q.agg(
        F.max("max_err").alias("worst"),
        F.min("scale").alias("smin"),
        F.max(F.col("q_l1")).alias("l1max"),
    ).first()
    assert row["smin"] > 0
    # one int8 step of the largest |scale| bounds the reconstruction error
    assert row["worst"] <= q.agg(F.max("scale")).first()[0] / 127 * 0.5 + 1e-9
    # abs codes sum over <=64 dims of |code|<=127
    assert row["l1max"] <= 127 * 64


def test_quantize_drops_zero_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])], "vec_id long, embedding array<float>"
    )
    out = quantize_embeddings(df, "embedding", "vec_id")
    assert [r["vec_id"] for r in out.collect()] == [2]


# ---------------------------------------------------------------------------
# stratified sampling / incremental dedup / quantized search
# ---------------------------------------------------------------------------


def test_hash_gate_rate_and_determinism(spark):
    from opl_spark.operators.sampling import hash_gate

    df = spark.range(0, 10_000)
    kept = df.filter(hash_gate(F.col("id"), 0.3)).count()
    # well-mixed gate: close to the nominal rate
    assert abs(kept / 10_000 - 0.3) < 0.03
    assert df.filter(hash_gate(F.col("id"), 0.3)).count() == kept


def test_stratified_sample_respects_zero_and_full_rates(spark):
    from opl_spark.operators.sampling import stratified_sample

    df = _docs(spark)  # 300 docs over src0/src1/src2
    out = stratified_sample(df, "source", "doc_id", {"src0": 0.0, "src1": 1.0})
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "src0" not in per
    assert per["src1"] == 100
    assert per["src2"] == 100


def test_incremental_dedup_batch_and_history(spark):
    from opl_spark.operators.dedup import incremental_dedup

    seen = spark.createDataFrame([(0, "aa"), (1, "bb")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "aa"), (11, "cc"), (12, "cc"), (13, "dd")],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r["batch_copies"] for r in
            incremental_dedup(batch, seen, "text", "doc_id").collect()}
    # "aa" already ingested -> dropped; "cc" deduped to min id with copies=2
    assert rows == {11: 2, 13: 1}


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    from opl_spark.operators.similarity import cosine_topk, quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["id"] for r in cosine_topk(emb, "embedding", "vec_id", probe, k=10).collect()}
    quant = {r["id"] for r in quantized_topk(emb, "embedding", "vec_id", probe, k=10).collect()}
    # int8 codes keep >= 8/10 of the exact top-10 on this corpus
    assert len(exact & quant) >= 8


def test_semantic_dedup_keeps_cluster_representative(spark):
    from opl_spark.operators.similarity import semantic_dedup

    # two obvious clusters; ids 1/2 near-dup in cluster A, 10 alone in B
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (10, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = semantic_dedup(df, "embedding", "vec_id", cents, threshold=0.95)
    got = [(r["dropped"], r["cell"]) for r in out.collect()]
    # the lower id (1) survives as representative; 2 is dropped from cell 0
    assert got == [(2, 0)]


def test_srp_lsh_finds_planted_duplicate_without_blocking_key(spark):
    """An exact duplicate vector shares every SRP sign bit, so it MUST
    collide in every band and verify at cosine 1.0 — with no label /
    blocking column anywhere.  A far (low-cosine) vector must not be
    paired above the threshold even when buckets collide."""
    from opl_spark.operators.similarity import srp_lsh_pairs

    d = 8
    base = [1.0, 0.5, -0.25, 0.125, 0.75, -0.5, 0.3, -0.7]
    far = [-x for x in base]  # cosine -1 with base
    rows = [(1, base), (2, list(base)), (3, far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in srp_lsh_pairs(
            df, "embedding", "vec_id", dims=d, threshold=0.9
        ).collect()
    }
    assert got == {(1, 2): 1.0}


def test_srp_lsh_portable_integer_exact_verify(spark):
    """portable=True verifies on the quantized integer grid with an
    exact-integer threshold test: the planted duplicate still pairs at
    cosine 1.0, the far vector stays excluded, and a pair sitting
    EXACTLY at the threshold in exact arithmetic is included — the
    float-boundary class the mode exists to remove."""
    from opl_spark.operators.similarity import srp_lsh_pairs

    d = 8
    base = [1.0, 0.5, -0.25, 0.125, 0.75, -0.5, 0.3, -0.7]
    far = [-x for x in base]
    rows = [(1, base), (2, list(base)), (3, far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in srp_lsh_pairs(
            df, "embedding", "vec_id", dims=d, threshold=0.9, portable=True
        ).collect()
    }
    assert got == {(1, 2): 1.0}

    # exact-threshold inclusion (one shared bucket, banding bypassed):
    # u=(1,0,..), v=(3,4,0,..) integer coords ⇒ cosine exactly 3/5; the
    # integer predicate 25·d² ≥ 9·na·nb holds with EQUALITY — included,
    # where a float verify is at the mercy of the last ulp.  w=(4,3,..)
    # vs v has cosine 24/25 = 0.96 > 0.6 (included); u vs w cosine 4/5.
    u = [1.0] + [0.0] * (d - 1)
    v = [3.0, 4.0] + [0.0] * (d - 2)
    w = [4.0, 3.0] + [0.0] * (d - 2)
    from opl_spark.operators.similarity import embedding_dup_pairs

    df2 = spark.createDataFrame(
        [(10, u, 0), (11, v, 0), (12, w, 0)],
        "vec_id long, q array<double>, bk int",
    )
    got2 = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_dup_pairs(
            df2, "q", "vec_id", "bk", threshold=0.6, integer_exact=True
        ).collect()
    }
    assert got2 == {(10, 11): 0.6, (10, 12): 0.8, (11, 12): 0.96}


def test_unigram_logprob_ranks_rare_tokens_higher(spark):
    from opl_spark.operators.text import unigram_logprob

    rows = [(1, "the the the the"), (2, "zyxgly qwfpbju")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r["avg_nll"] for r in unigram_logprob(df, "text", "doc_id").collect()}
    # doc of common tokens scores lower (more probable) than rare-token doc
    assert out[1] < out[2]


def test_percentile_filter_keeps_top_fraction_per_group(spark):
    from opl_spark.operators.text import percentile_filter

    rows = [(i, "a" if i < 10 else "b", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = percentile_filter(df, F.col("score"), "source", "doc_id", keep_frac=0.3)
    got = sorted(r["doc_id"] for r in out.collect())
    # top 30% of 10 docs per group = the 3 highest scores of each
    assert got == [7, 8, 9, 17, 18, 19]


def test_heavy_hitters_uses_doc_frequency_not_raw_counts(spark):
    from opl_spark.operators.text import heavy_hitters

    rows = [(1, "spam spam spam spam unique1"), (2, "other words here"),
            (3, "more other stuff")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["tok"]: r["n_docs"] for r in
           heavy_hitters(df, "text", "doc_id", min_doc_frac=0.6).collect()}
    # "spam" appears 4 times but in only 1/3 docs -> excluded;
    # "other" is in 2/3 docs -> included
    assert "spam" not in got
    assert got["other"] == 2


# ---------------------------------------------------------------------------
# vocab / chunking / keep-best / ccnet buckets
# ---------------------------------------------------------------------------


def test_vocab_build_orders_and_counts(spark):
    rows = [(1, "a a b c"), (2, "a b b"), (3, "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from opl_spark.operators.text import build_vocab

    out = {r["term"]: (r["corpus_freq"], r["doc_freq"]) for r in build_vocab(df, "text", "doc_id", 10).collect()}
    assert out == {"a": (3, 2), "b": (3, 2), "c": (2, 2)}
    # deterministic order: freq desc then term asc
    top = [r["term"] for r in build_vocab(df, "text", "doc_id", 2).collect()]
    assert top == ["a", "b"]


def test_chunk_documents_windows_and_tail(spark):
    from opl_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        map(tuple, chunk_documents(df, "text", "doc_id", size=5, overlap=2).collect())
    )
    # step 3: starts 0,3,6,9 — last window is the 3-token tail
    assert [r[1] for r in rows] == [0, 1, 2, 3]
    assert rows[0][2] == "w0 w1 w2 w3 w4"
    assert rows[3][2] == "w9 w10 w11"
    assert [r[3] for r in rows] == [5, 5, 5, 3]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from opl_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", size=5, overlap=5)


def test_keep_best_prefers_quality_then_min_id(spark):
    from opl_spark.operators.dedup import keep_best_dedup

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    quality = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)], "doc_id long, score long"
    )
    out = {r["doc"]: r["keeper"] for r in keep_best_dedup(pairs, quality, "doc_id", "score").collect()}
    # cluster {1,2,3}: max score 9 tied between 2 and 3 -> min id 2
    assert out == {1: 2, 2: 2, 3: 2, 10: 10, 11: 10}


def test_keep_best_partial_quality_coverage(spark):
    """Clusters must never vanish when quality coverage is partial:
    unscored members lose to scored ones, and a fully-unscored cluster
    falls back to the min-id keeper instead of disappearing (callers
    computing drops as doc != keeper would otherwise fail open)."""
    from opl_spark.operators.dedup import keep_best_dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    # 3 unscored in cluster {1,2,3}; cluster {10,11} wholly unscored
    quality = spark.createDataFrame([(1, 5), (2, 9)], "doc_id long, score long")
    out = {
        r["doc"]: r["keeper"]
        for r in keep_best_dedup(pairs, quality, "doc_id", "score").collect()
    }
    assert out == {1: 2, 2: 2, 3: 2, 10: 10, 11: 10}


def test_quantile_buckets_exact_thirds(spark):
    from opl_spark.operators.text import quantile_buckets

    rows = [(i, "en", float(i)) for i in range(9)] + [(100, "it", 1.0)]
    df = spark.createDataFrame(rows, "doc long, lang string, score double")
    out = {r["doc"]: r["bucket"] for r in quantile_buckets(df, F.col("score"), "lang", "doc").collect()}
    assert [out[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # a 1-row group: rn*3=3 > 2*n=2, so the single row lands in tail
    assert out[100] == "tail"


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def _pq_lossless_df(spark):
    # vectors built from 2 distinct patterns per 2-dim subspace: the
    # codebook can represent every vector exactly, so PQ is lossless
    pats = [[0.0, 1.0], [1.0, 0.0]]
    rows = []
    for i in range(32):
        v = pats[i % 2] + pats[(i // 2) % 2] + pats[(i // 4) % 2] + pats[(i // 8) % 2]
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_deterministic_and_bounded(spark):
    from opl_spark.operators.similarity import pq_encode, pq_train

    df = _pq_lossless_df(spark)
    book = pq_train(df, "embedding", "vec_id", m=4, k=2, sample=32)
    a = {r["id"]: tuple(r["codes"]) for r in pq_encode(df, "embedding", "vec_id", book).collect()}
    b = {r["id"]: tuple(r["codes"]) for r in pq_encode(df, "embedding", "vec_id", book).collect()}
    assert a == b
    assert all(0 <= c < 2 for codes in a.values() for c in codes)
    assert all(len(codes) == 4 for codes in a.values())


def test_pq_topk_exact_on_lossless_data(spark):
    from opl_spark.operators.similarity import cosine_topk, pq_topk, pq_train

    df = _pq_lossless_df(spark)
    book = pq_train(df, "embedding", "vec_id", m=4, k=2, sample=32)
    q = [0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.0]
    exact = [(r["id"], r["sim"]) for r in cosine_topk(df, "embedding", "vec_id", q, k=5).collect()]
    pq = [(r["id"], r["psim"]) for r in pq_topk(df, "embedding", "vec_id", q, book, k=5).collect()]
    # codebook represents the data exactly -> ADC score == true cosine
    assert pq == exact


def test_pq_train_rejects_indivisible_dims(spark):
    import pytest as _pytest

    from opl_spark.operators.similarity import pq_train

    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        pq_train(df, "embedding", "vec_id", m=2, k=2)


def test_pq_topk_rejects_zero_norm_query(spark):
    """cosine(0, ·) is undefined; every psim would be NaN and NaN sorts
    above all doubles descending — fail loudly instead of returning
    arbitrary top-k rows."""
    import pytest as _pytest

    from opl_spark.operators.similarity import pq_topk, pq_train

    df = _pq_lossless_df(spark)
    book = pq_train(df, "embedding", "vec_id", m=4, k=2, sample=32)
    with _pytest.raises(ValueError, match="zero norm"):
        pq_topk(df, "embedding", "vec_id", [0.0] * 8, book, k=3)


def test_budget_sample_exact_counts_and_determinism(spark):
    from opl_spark.operators.sampling import budget_sample

    df = _docs(spark)  # 100 docs per src0/src1/src2
    out = budget_sample(df, "source", "doc_id", budget=30)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"src0": 30, "src1": 30, "src2": 30}
    # budget over group size keeps the whole group
    assert budget_sample(df, "source", "doc_id", budget=500).count() == 300
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in budget_sample(df, "source", "doc_id", 30).collect())
    assert a == b


def test_bigram_logprob_flags_improbable_transitions(spark):
    import math

    from opl_spark.operators.text import bigram_logprob

    rows = [(1, "a b a b"), (2, "a c"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: (r["n_bigrams"], r["avg_nll2"]) for r in bigram_logprob(df, "text", "doc_id").collect()}
    # 1-token doc has no bigrams and is absent
    assert set(out) == {1, 2}
    # corpus bigrams: "a b"x2, "b a"x1, "a c"x1 -> p(b|a)=2/3, p(a|b)=1,
    # p(c|a)=1/3; the rare transition scores strictly worse
    exp_1 = round((2 * -math.log(2 / 3) + 1 * -math.log(1.0)) / 3, 6)
    exp_2 = round(-math.log(1 / 3), 6)
    assert out[1] == (3, exp_1)
    assert out[2] == (1, exp_2)
    assert out[2][1] > out[1][1]


def test_token_entropy_extremes(spark):
    import math

    from opl_spark.operators.text import token_entropy

    rows = [(1, "a a a a"), (2, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: (r["n_tokens"], r["entropy"]) for r in token_entropy(df, "text", "doc_id").collect()}
    # all-same tokens -> 0 nats; all-distinct -> ln(4)
    assert out[1] == (4, 0.0)
    assert out[2] == (4, round(math.log(4), 6))


def test_ivfpq_self_hit_and_pool_pruning(spark, sf_dir):
    from opl_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
        pq_train,
        seed_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = seed_centroids(emb, "embedding", "vec_id", ncells=8)
    book = pq_train(emb, "embedding", "vec_id", m=4, k=16, sample=512, iters=4)
    got = ivfpq_topk(emb, "embedding", "vec_id", probe, cents, book, k=10, nprobe=4).collect()
    assert len(got) == 10
    # probing all cells must equal plain PQ over the whole corpus
    full = ivfpq_topk(emb, "embedding", "vec_id", probe, cents, book, k=10, nprobe=8).collect()
    plain = pq_topk(emb, "embedding", "vec_id", probe, book, k=10).collect()
    assert [(r["id"], r["psim"]) for r in full] == [(r["id"], r["psim"]) for r in plain]


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


@pytest.mark.slow  # r14 slow tier
def test_cms_never_undercounts_and_merges(spark):
    from opl_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
        count_min_merge,
    )

    rows = [(f"t{i % 17}",) for i in range(600)] + [("hot",)] * 200
    df = spark.createDataFrame(rows, "tok string")
    sketch = count_min_build(df, "tok", width=64, depth=4)
    # fixed size: at most depth*width cells exist
    assert sketch.count() <= 64 * 4
    terms = df.distinct()
    truth = {r["tok"]: r["n"] for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {r["term"]: r["est"] for r in count_min_estimate(sketch, terms, "tok", 64, 4).collect()}
    assert set(est) == set(truth)
    for t, n in truth.items():
        assert est[t] >= n  # overcount-only guarantee
    # merging two disjoint half-sketches equals sketching the whole stream
    h1 = count_min_build(df.filter(F.col("tok") != "hot"), "tok", 64, 4)
    h2 = count_min_build(df.filter(F.col("tok") == "hot"), "tok", 64, 4)
    merged = count_min_merge(h1, h2)
    est2 = {r["term"]: r["est"] for r in count_min_estimate(merged, terms, "tok", 64, 4).collect()}
    assert est2 == est


def test_pq_rerank_full_shortlist_equals_exact(spark, sf_dir):
    from opl_spark.operators.similarity import cosine_topk, pq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    book = pq_train(emb, "embedding", "vec_id", m=4, k=16, sample=256, iters=3)
    n = emb.count()
    # shortlist covering the whole corpus -> rerank IS exact top-k
    full = pq_topk(emb, "embedding", "vec_id", probe, book, k=10, rerank=(n // 10) + 1)
    exact = cosine_topk(emb, "embedding", "vec_id", probe, k=10)
    assert [(r["id"], r["psim"], r["rank"]) for r in full.collect()] == [
        (r["id"], r["sim"], r["rank"]) for r in exact.collect()
    ]


def test_chunk_documents_no_fully_contained_tail(spark):
    from opl_spark.operators.text import chunk_documents

    # n=10, size=5, overlap=2 (step 3): a start at 9 would re-emit a
    # window fully inside the chunk at 6 — it must not be generated
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk"]) for r in
        chunk_documents(df, "text", "doc_id", size=5, overlap=2).collect()
    )
    assert [r[0] for r in rows] == [0, 1, 2]
    assert rows[-1][1] == "w6 w7 w8 w9"


def test_chunk_documents_rejects_negative_overlap(spark):
    import pytest as _pytest

    from opl_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", size=5, overlap=-3)


def test_keep_best_supports_string_ids(spark):
    from opl_spark.operators.dedup import keep_best_dedup

    pairs = spark.createDataFrame([("a", "b"), ("b", "c")], "id_a string, id_b string")
    quality = spark.createDataFrame(
        [("a", 1), ("b", 9), ("c", 9)], "doc_id string, score long"
    )
    out = {r["doc"]: r["keeper"] for r in keep_best_dedup(pairs, quality, "doc_id", "score").collect()}
    # max score tie between b and c -> lexicographically smallest id b
    assert out == {"a": "b", "b": "b", "c": "b"}


@pytest.mark.slow  # r14 slow tier
def test_minhash_keep_best_subsets_exact_composition(spark, sf_dir):
    """The LSH-candidate composition must emit a SUBSET of the exact
    inverted-index composition (banded LSH can miss low-similarity
    pairs near the threshold, never invent them), and catch the
    high-similarity mass."""
    from opl_spark import workload

    exact = {(r["doc"], r["keeper"]) for r in workload.queries()["q_keep_best"](spark, sf_dir).collect()}
    lsh = {(r["doc"], r["keeper"]) for r in workload.queries()["q_minhash_keep_best"](spark, sf_dir).collect()}
    assert lsh  # nonempty at sf0.001
    assert lsh <= exact
    assert len(lsh) >= len(exact) * 0.8


def test_ivf_index_append_grows_cells_without_rewrite(spark, sf_dir, tmp_path):
    from opl_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 150)
    newer = emb.filter(F.col("vec_id") >= 150)
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(base, "embedding", "vec_id", path, ncells=4)
    n_base = spark.read.parquet(path).count()
    ivf_index_append(newer, "embedding", "vec_id", path, cents)
    assert spark.read.parquet(path).count() == n_base + newer.count()
    # a probe against the grown index can surface an appended vector:
    # query WITH one of the new vectors -> it is its own top hit
    probe_id = newer.agg(F.min("vec_id")).first()[0]
    probe = [float(x) for x in emb.filter(F.col("vec_id") == probe_id).first()["embedding"]]
    top = ivf_topk_indexed(spark, path, "embedding", "vec_id", probe, cents, k=1, nprobe=4)
    assert top.first()["id"] == probe_id


# ---------------------------------------------------------------------------
# BPE merge learning
# ---------------------------------------------------------------------------


def test_bpe_learns_expected_merges(spark):
    from opl_spark.operators.bpe import learn_bpe_merges

    # "aaab" x3, "ab" x2: pair counts round 1: (a,a)=6, (a,b)=5 ->
    # merge (a,a); round 2: (aa,a)=3, (aa,b)=0... recount: "aaab" ->
    # [aa, a, b]: pairs (aa,a)=3, (a,b)=3+2=5 -> merge (a,b)
    df = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab ab"), (3, "ab")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, "text", num_merges=3)
    assert merges[0] == (0, "a", "a", 6)
    assert merges[1] == (1, "a", "b", 5)


@pytest.mark.slow  # r14 slow tier
def test_bpe_segment_compresses_with_merges(spark):
    from opl_spark.operators.bpe import bpe_segment, learn_bpe_merges

    df = spark.createDataFrame([(1, "banana banana bandana")], "doc_id long, text string")
    merges = learn_bpe_merges(df, "text", num_merges=5)
    seg = bpe_segment(df, "text", "doc_id", merges).first()
    raw_chars = len("bananabananabandana")
    # merges strictly reduce token count below character count
    assert seg["n_tokens"] < raw_chars
    # replaying zero merges yields exactly the character count
    seg0 = bpe_segment(df, "text", "doc_id", []).first()
    assert seg0["n_tokens"] == raw_chars


def test_bpe_many_merges_one_distributed_pass(spark):
    """Learning 200+ merges must run ONE Spark counting job plus a
    constant number of bookkeeping jobs — never one job per merge
    (30k-50k merges is a real tokenizer; 30k sequential Spark jobs is
    the scale anti-pattern this pins against)."""
    import random

    from opl_spark.operators.bpe import learn_bpe_merges

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(10)) for _ in range(800)
    ]
    # every word twice so every pair count is >= 2
    text = " ".join(words + words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    sc = spark.sparkContext
    sc.setJobGroup("bpe-one-pass", "bpe merge learning job-count probe")
    try:
        merges = learn_bpe_merges(df, "text", num_merges=250)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-one-pass")
    assert len(merges) >= 200
    # one count job (+ possible AQE sub-jobs), far below one-per-merge
    assert len(jobs) <= 6, f"per-merge Spark jobs detected: {len(jobs)}"
    # merge table is well-formed and deterministic in shape
    assert [m[0] for m in merges] == list(range(len(merges)))
    assert all(m[3] >= 2 for m in merges)


def test_bpe_segment_encodes_per_type_not_per_occurrence(spark):
    """The encode pass runs over the DISTINCT-word table (per-type),
    and the per-doc token totals equal a per-occurrence reference
    replay."""
    from opl_spark.operators.bpe import (
        _encode_len,
        bpe_segment,
        encode_vocab,
        learn_bpe_merges,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the cat cat"),
        (3, "a banana and a bandana"),
        (4, "   "),  # whitespace-only doc -> 0 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe_merges(df, "text", num_merges=6)

    # per-type probe: encode_vocab emits exactly one row per distinct word
    distinct_words = {
        w for _, t in rows for w in t.strip().lower().split()
    }
    words_df = df.selectExpr(
        "explode(split(lower(trim(text)), '\\\\s+')) AS w"
    ).filter("w != ''").distinct()
    enc = encode_vocab(words_df, merges)
    assert enc.count() == len(distinct_words)

    # equality with the per-occurrence reference
    ordered = [(m[1], m[2]) for m in sorted(merges)]
    expect = {
        doc: sum(_encode_len(w, ordered) for w in t.strip().lower().split())
        for doc, t in rows
    }
    got = {
        r["doc"]: r["n_tokens"]
        for r in bpe_segment(df, "text", "doc_id", merges).collect()
    }
    assert got == expect
    assert got[4] == 0


# ---------------------------------------------------------------------------
# PCA + salted join (round 3)
# ---------------------------------------------------------------------------


def test_pca_components_variance_ordering_and_orthogonality(spark, sf_dir):
    import numpy as np

    from opl_spark.operators.similarity import pca_components

    emb = load_table(spark, sf_dir, "embeddings")
    mu, comps, vars_ = pca_components(emb, "embedding", k=3)
    # eigenvalues come back sorted descending and non-negative
    assert vars_[0] >= vars_[1] >= vars_[2] >= -1e-9
    w = np.asarray(comps)
    # components are unit-norm and mutually orthogonal
    assert np.allclose(w @ w.T, np.eye(3), atol=1e-8)
    # sign canonicalization: the largest-|entry| of each component is positive
    for v in w:
        assert v[np.argmax(np.abs(v))] > 0


def test_pca_projection_is_decorrelated_with_matching_variance(spark, sf_dir):
    import numpy as np

    from opl_spark.operators.similarity import pca_components, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    _, _, vars_ = pca_components(emb, "embedding", k=2)
    rows = pca_project(emb, "embedding", "vec_id", k=2).collect()
    p = np.asarray([[r["pc1"], r["pc2"]] for r in rows])
    # projected coordinates reproduce the eigenvalue variances...
    got = p.var(axis=0)
    assert abs(got[0] - vars_[0]) < 1e-3 * max(1.0, vars_[0])
    assert abs(got[1] - vars_[1]) < 1e-3 * max(1.0, vars_[1])
    # ...and are uncorrelated (covariance ~ 0 relative to the scales)
    c = np.cov(p.T)[0, 1]
    assert abs(c) < 1e-3 * (vars_[0] * vars_[1]) ** 0.5


def test_pca_power_project_matches_eigh_direction(spark, sf_dir):
    """The integer power-iteration PCA (oracle-replayable) must agree
    with the float eigensolver: per-component correlation |r| ≈ 1
    against pca_project's coordinates (sign-free — canonicalizations
    differ in scale only), and the two quantized coordinates must be
    (near-)uncorrelated with each other."""
    import numpy as np

    from opl_spark.operators.similarity import pca_power_project, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = {r["id"]: (r["pc1_q"], r["pc2_q"])
             for r in pca_power_project(emb, "embedding", "vec_id", k=2).collect()}
    frows = {r["vec_id"]: (r["pc1"], r["pc2"])
             for r in pca_project(emb, "embedding", "vec_id", k=2).collect()}
    assert set(qrows) == set(frows)
    ids = sorted(qrows)
    q = np.array([qrows[i] for i in ids], dtype=np.float64)
    f = np.array([frows[i] for i in ids], dtype=np.float64)
    for c in range(2):
        r = np.corrcoef(q[:, c], f[:, c])[0, 1]
        assert abs(r) > 0.999, f"component {c + 1}: |corr|={abs(r):.4f}"
    cross = np.corrcoef(q[:, 0], q[:, 1])[0, 1]
    assert abs(cross) < 0.05


def test_salted_join_matches_plain_join(spark, sf_dir):
    from opl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    salted = salted_join(
        li, supp, [("l_suppkey", "s_suppkey")], salt_buckets=4,
        salt_from=F.col("l_orderkey"),
    )
    plain = li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
    # same multiset of joined rows: every probe row meets each match once
    assert salted.count() == plain.count()
    a = {tuple(r) for r in salted.groupBy("s_nationkey").count().collect()}
    b = {tuple(r) for r in plain.groupBy("s_nationkey").count().collect()}
    assert a == b
    # no residual salt columns leak into the output schema
    assert "__salt" not in salted.columns


@pytest.mark.slow  # r14 slow tier
def test_star_components_equal_min_label_propagation(spark, sf_dir):
    """Large-star/small-star components must produce EXACTLY the
    min-label propagation labelling on the same pair set (both resolve
    every member to its component minimum)."""
    from opl_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_star,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2)
    a = {(r["doc"], r["keeper"]) for r in dedup_clusters(pairs).collect()}
    b = {(r["doc"], r["keeper"]) for r in dedup_clusters_star(pairs).collect()}
    assert a == b


@pytest.mark.slow  # r14 slow tier
def test_star_components_converge_on_long_chain(spark):
    """A pure path graph (diameter = n-1) is min-label's worst case;
    the star algorithm must still resolve it to one component in its
    bounded round budget — and every node must map to the chain
    head."""
    from opl_spark.operators.dedup import dedup_clusters_star

    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = dedup_clusters_star(pairs, max_iter=12)
    rows = {r["doc"]: r["keeper"] for r in out.collect()}
    assert len(rows) == n
    assert set(rows.values()) == {0}


# ---------------------------------------------------------------------------
# unigram tokenizer (round 3)
# ---------------------------------------------------------------------------


def test_unigram_learns_frequent_pieces_and_loss_decreases(spark):
    from opl_spark.operators.unigram import unigram_train

    rows = [(i, "abab abab abc xy") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab, losses = unigram_train(df, "text", vocab_size=12, iters=3)
    pieces = {p for p, _ in vocab}
    # the dominant substring survives pruning; singles always kept
    assert "abab" in pieces or "ab" in pieces
    assert {"a", "b", "c", "x", "y"} <= pieces
    # hard-EM loss is non-increasing
    assert all(l2 <= l1 + 1e-9 for l1, l2 in zip(losses, losses[1:])), losses
    # deterministic: same corpus → identical vocab
    vocab2, _ = unigram_train(df, "text", vocab_size=12, iters=3)
    assert vocab2 == vocab


def test_unigram_segment_counts_per_type(spark, sf_dir):
    from opl_spark.operators.unigram import (
        _viterbi,
        unigram_segment,
        unigram_train,
    )
    from opl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    vocab, _ = unigram_train(docs, "text", vocab_size=48, iters=2)
    out = unigram_segment(docs, "text", "doc_id", vocab)
    rows = out.collect()
    assert rows and all(r["n_pieces"] >= r["n_words"] >= 1 for r in rows)
    # spot-check one doc against a local Viterbi decode — under the
    # SAME micro-unit scores the operator decodes with (LOG_SCALE)
    from opl_spark.operators.unigram import quantize_scores

    scores = quantize_scores(dict(vocab))
    first = docs.orderBy("doc_id").first()
    words = first["text"].lower().strip().split()
    want = sum(len(_viterbi(w, scores, 4)[0]) for w in words)
    got = {r["doc"]: r["n_pieces"] for r in rows}[first["doc_id"]]
    assert got == want


def test_unigram_viterbi_prefers_longer_pieces_on_ties(spark):
    from opl_spark.operators.unigram import _viterbi

    scores = {"a": -1.0, "b": -1.0, "ab": -2.0}
    pieces, sc = _viterbi("ab", scores, 4)
    # equal total score (-2.0): the longer piece wins deterministically
    assert pieces == ["ab"] and sc == -2.0


def test_export_manifest_counts_and_hash_are_partition_invariant(spark, sf_dir, tmp_path):
    from opl_spark.operators.text import export_jsonl_manifest
    from opl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m4 = export_jsonl_manifest(docs, str(tmp_path / "e4"), shards=4)
    m2 = export_jsonl_manifest(docs, str(tmp_path / "e2"), shards=2)
    assert m4["total_rows"] == m2["total_rows"] == docs.count()
    assert len(m4["shards"]) == 4 and len(m2["shards"]) == 2
    assert all(s["rows"] > 0 for s in m4["shards"].values())
    # content hash is a reassociative sum — shard layout can't change it
    tot4 = sum(int(s["content_hash"]) for s in m4["shards"].values())
    tot2 = sum(int(s["content_hash"]) for s in m2["shards"].values())
    assert tot4 == tot2
    import json, os
    on_disk = json.load(open(os.path.join(str(tmp_path / "e4"), "_MANIFEST.json")))
    assert on_disk == m4


def test_unigram_segments_out_of_vocab_characters(spark):
    """Applying a trained vocab to text with characters the corpus
    never contained must DECODE (UNK single-char fallback), not hang
    or crash — the train-here/segment-there deployment case."""
    from opl_spark.operators.unigram import UNK_LOGPROB, _viterbi, unigram_train

    rows = [(i, "abab abab xy") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab, _ = unigram_train(df, "text", vocab_size=10, iters=2)
    scores = dict(vocab)
    pieces, sc = _viterbi("abéz", scores, 4)
    assert "".join(pieces) == "abéz"
    assert sc > 3 * UNK_LOGPROB  # only the unseen chars pay the UNK price


@pytest.mark.slow  # r14 slow tier
def test_udf_queries_run_with_driver_outside_repo(sf_dir):
    """The external harness imports __spark_entry__ from OUTSIDE the
    repo; Python workers then cannot import opl_spark, so every Arrow
    closure must pickle BY VALUE (no module-global references).  This
    runs the closure-bearing tokenizer queries in a clean subprocess
    with cwd=/tmp to reproduce that environment."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as e\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')"
        ".config('spark.sql.shuffle.partitions','2')"
        ".config('spark.ui.enabled','false').getOrCreate())\n"
        "q = e.queries()\n"
        f"assert q['q_unigram_train'](spark, '{sf_dir}').count() > 0\n"
        f"assert q['q_unigram_tokenize'](spark, '{sf_dir}').count() > 0\n"
        "print('SELFCONTAINED_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd="/tmp", capture_output=True,
        text=True, timeout=240,
    )
    assert "SELFCONTAINED_OK" in out.stdout, out.stderr[-2000:]


def test_stupid_backoff_levels(spark):
    """Hand corpus where each backoff level fires: a seen trigram
    scores c3/c2; a seen-bigram-only trigram scores 0.4*c2/c1; an
    unseen-everything trigram hits the Laplace unigram floor."""
    import math

    from opl_spark.operators.text import stupid_backoff_score

    train = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "b d e")], ["doc_id", "text"]
    )
    # train counts: c1: a2 b3 c2 d1 e1 (N=9, V=5)
    # c3: (a,b,c)=2, (b,c,a)=1, (c,a,b)=1, (b,d,e)=1
    # c2: (a,b)=2, (b,c)=2, (c,a)=1, (b,d)=1, (d,e)=1
    val = spark.createDataFrame(
        [
            (10, "a b c"),   # seen trigram: 2/2 = 1.0
            (20, "e b d"),   # (e,b,d) unseen, (b,d) seen: 0.4 * 1/3
            (30, "z z q"),   # everything unseen, q OOV: 0.16 * 1/14
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc"]: r
        for r in stupid_backoff_score(train, val, "text", "doc_id").collect()
    }
    assert got[10]["n_trigrams"] == 1
    assert abs(got[10]["avg_logscore"] - round(math.log(1.0), 6)) < 1e-9
    assert abs(got[20]["avg_logscore"] - round(math.log(0.4 * 1 / 3), 6)) < 1e-9
    # (z,z,q): c3 miss, (z,q) bigram miss -> 0.4^2 * (c1(q)+1)/(N+V) with q OOV
    assert abs(
        got[30]["avg_logscore"] - round(math.log(0.16 * 1 / 14), 6)
    ) < 1e-9


def test_random_projection_distance_preservation(spark, sf_dir):
    """JL contract: per-pair squared-distance ratios concentrate
    around 1 with the ~sqrt(2/k) spread the lemma predicts, and the
    projection is deterministic."""
    import numpy as np
    from pyspark.sql import functions as F

    from opl_spark.operators.similarity import random_projection
    from opl_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    rows = random_projection(emb, "embedding", "vec_id", 16, 64).collect()
    proj = {}
    for r in rows:
        proj.setdefault(r["id"], [0.0] * 16)[r["dim"] - 1] = r["value"]
    ids = sorted(orig)
    ratios = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d0 = float(np.sum((orig[ids[x]] - orig[ids[y]]) ** 2))
            d1 = float(
                np.sum((np.array(proj[ids[x]]) - np.array(proj[ids[y]])) ** 2)
            )
            ratios.append(d1 / d0)
    r = np.array(ratios)
    # JL at k=16: ratio mean ~1, std ~sqrt(2/16); band test over pairs
    assert abs(float(r.mean()) - 1.0) < 0.15, r.mean()
    assert float(((r > 0.3) & (r < 1.7)).mean()) > 0.9, r
    again = random_projection(emb, "embedding", "vec_id", 16, 64).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_naive_bayes_hand_corpus(spark):
    """NB math pinned on a hand corpus: priors, Laplace smoothing and
    the log-posterior sum computed by hand for one val doc."""
    import math

    from opl_spark.operators.text import naive_bayes_scores

    train = spark.createDataFrame(
        [
            (1, "ja ja nein", "de"),
            (2, "ja gut", "de"),
            (3, "yes no", "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    val = spark.createDataFrame([(10, "ja yes")], ["doc_id", "text"])
    got = {
        r["label"]: r["logpost"]
        for r in naive_bayes_scores(train, val, "text", "lang", "doc_id").collect()
    }
    # vocab = {ja, nein, gut, yes, no} -> V=5; de: T=5, en: T=2
    # de: prior ln(2/3); ja c=3 -> (3+1)/10; yes c=0 -> 1/10
    want_de = math.log(2 / 3) + math.log(4 / 10) + math.log(1 / 10)
    # en: prior ln(1/3); ja 0 -> 1/7; yes 1 -> 2/7
    want_en = math.log(1 / 3) + math.log(1 / 7) + math.log(2 / 7)
    assert abs(got["de"] - round(want_de, 6)) < 1e-9
    assert abs(got["en"] - round(want_en, 6)) < 1e-9
    assert got["de"] > got["en"]  # 'ja' dominates


def test_line_dedup_within_doc(spark):
    """Crafted doc: repeated sentence dropped at second occurrence
    (case-insensitive), order preserved, counts exact."""
    from opl_spark.operators.text import dedup_lines_within_doc

    df = spark.createDataFrame(
        [(1, "Buy now. Read more. buy NOW. The end"),
         (2, "All unique. Sentences here")],
        ["doc_id", "text"],
    )
    got = {r["doc"]: r for r in dedup_lines_within_doc(df, "text", "doc_id").collect()}
    assert got[1]["clean_text"] == "Buy now. Read more. The end"
    assert got[1]["n_sents"] == 4 and got[1]["n_removed"] == 1
    assert got[2]["clean_text"] == "All unique. Sentences here"
    assert got[2]["n_removed"] == 0


def test_cdc_chunks_shift_robust(spark):
    """The CDC contract: prepending words to a document shifts every
    fixed-width shingle, but the interior content-defined chunks
    survive — chunk hashes after the edit share most of the original
    multiset (first chunk absorbs the insertion)."""
    from opl_spark.operators.text import cdc_chunks

    base = " ".join(f"w{i}" for i in range(400))
    edited = "zzz yyy xxx " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], ["doc_id", "text"]
    )
    rows = cdc_chunks(df, "text", "doc_id", mask=15).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc"] == 2}
    assert len(h1) > 5  # the rule actually chunks
    # only the first chunk (which absorbed the insertion) may differ
    assert len(h1 - h2) <= 1, (len(h1), len(h1 - h2))
    # chunk word counts reassemble the doc exactly
    assert sum(r["n_words"] for r in rows if r["doc"] == 1) == 400


def test_bpe_fertility_consistency(spark, sf_dir):
    """Fertility identities: corpus tokens from the per-language
    report equal the sum of per-doc bpe_segment tokens under the same
    merge table; fertility >= 1e6 (a word is never fewer than one
    token); chars/token <= mean word length."""
    from pyspark.sql import functions as F

    from opl_spark.operators.bpe import bpe_fertility, bpe_segment, learn_bpe_merges
    from opl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    merges = learn_bpe_merges(docs, "text", num_merges=10)
    fert = bpe_fertility(docs, "text", "lang", merges).collect()
    seg_total = (
        bpe_segment(docs, "text", "doc_id", merges)
        .agg(F.sum("n_tokens"))
        .first()[0]
    )
    assert sum(r["n_tokens"] for r in fert) == seg_total
    for r in fert:
        assert r["fertility_x1e6"] >= 1_000_000
        assert 0 < r["chars_per_token"] <= r["n_chars"] / r["n_words"] + 1e-9


def test_count_min_weighted_build_equals_raw_stream(spark):
    """r14: building the sketch from a pre-aggregated (value, count)
    frame with weight_col must yield the BIT-EQUAL sketch the raw
    value stream does — Σ over distinct values of freq(v) per cell is
    the same integer by commutativity.  This is what lets q_cms_counts
    share one corpus pass between the sketch and the vocabulary."""
    from pyspark.sql import functions as F

    from opl_spark.operators.sketch import count_min_build

    rows = [("a",), ("b",), ("a",), ("c",), ("a",), ("b",)]
    raw = spark.createDataFrame(rows, "tok string")
    pre = raw.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    s_raw = sorted(
        map(tuple, count_min_build(raw, "tok", width=32, depth=3).collect())
    )
    s_pre = sorted(
        map(
            tuple,
            count_min_build(
                pre, "tok", width=32, depth=3, weight_col="freq"
            ).collect(),
        )
    )
    assert s_raw == s_pre and s_raw
