"""Structured Streaming: the batch-expressed window operators must
produce identical results when run as real streams (availableNow
replay), and the stateful dedup must emit exactly once per key."""

from pyspark.sql import functions as F

from opl_spark.sources import load_table
from opl_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    sessionize,
    stream_to_fact,
    windowed_counts,
)
from opl_spark.streaming.stateful import first_seen_stream


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_counts_stream_equals_batch(spark, sf_dir):
    batch = windowed_counts(load_table(spark, sf_dir, "events"))
    stream = windowed_counts(read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    got = run_to_memory(stream, "t_windowed")
    assert _sorted_rows(got) == _sorted_rows(batch)


def test_sessionize_stream_equals_batch(spark, sf_dir):
    batch = sessionize(load_table(spark, sf_dir, "events"))
    stream = sessionize(read_events_stream(spark, sf_dir))
    got = run_to_memory(stream, "t_sessions")
    assert _sorted_rows(got) == _sorted_rows(batch)


def test_stream_to_fact_appends_and_restart_is_noop(spark, sf_dir, tmp_path):
    """The streamed windowed aggregate must land in the parquet fact
    (final per-window values matching batch), and a restart against the
    same checkpoint must append nothing — the exactly-once contract."""
    from pyspark.sql.window import Window

    fact = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")
    stream_to_fact(
        windowed_counts(read_events_stream(spark, sf_dir)), fact, ckpt
    )
    written = spark.read.parquet(fact)
    # update mode can emit a window several times across microbatches;
    # the LAST emission per window is the final value
    w = F.row_number().over(
        Window.partitionBy("window_start", "event_type").orderBy(
            F.col("__batch_id").desc()
        )
    )
    final = (
        written.withColumn("rn", w)
        .filter(F.col("rn") == 1)
        .select("window_start", "event_type", "n_events", "total_value")
    )
    batch = windowed_counts(load_table(spark, sf_dir, "events"))
    assert _sorted_rows(final) == _sorted_rows(batch)

    n_rows_before = written.count()
    stream_to_fact(
        windowed_counts(read_events_stream(spark, sf_dir)), fact, ckpt
    )
    assert spark.read.parquet(fact).count() == n_rows_before


def test_first_seen_emits_exactly_once_per_key(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    dedup = first_seen_stream(events, ["user_id", "event_type"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("t_first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_first_seen")
    batch_keys = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    # one row per distinct key, no key twice
    assert got.count() == batch_keys.count()
    assert got.select("user_id", "event_type").distinct().count() == got.count()
    # every emitted first_id is a real event id for that key
    joined = got.join(
        load_table(spark, sf_dir, "events"), ["user_id", "event_type"]
    )
    assert joined.filter(F.col("first_id") == F.col("event_id")).count() == got.count()
