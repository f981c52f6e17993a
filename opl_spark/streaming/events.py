"""Structured Streaming over the events stream.

The reference's cadence is a nightly batch snapshot
(library_olap/README.md:17) — it has no sub-day streaming surface
(SURVEY.md §2.9).  This module is the additive streaming tier: the
same windowed aggregations, expressed once, runnable in batch AND in
``readStream`` mode — Structured Streaming's core promise.

Scale/correctness notes:
- watermarks bound state: late events beyond the horizon are dropped
  deterministically instead of growing executor state forever;
- aggregations are map-side-combinable (count / decimal sum), so
  per-microbatch shuffle volume is the number of open windows, not
  the number of events;
- ``run_to_memory`` uses ``trigger(availableNow=True)`` — the
  batch-replay mode that drains the source then stops, which makes
  streaming logic testable without a live feed.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Explicit schema — readStream cannot infer, and the parquet ships
#: TIMESTAMP(NANOS) (read as long, normalized below like the batch path).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanos (legacy nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as a file stream (one-file-per-trigger replay).

    ``FileStreamSource`` monitors a DIRECTORY of arriving files — the
    production shape — while the testdata ships one flat file, so the
    file is staged into a scratch directory via symlink first."""
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(src):
        stage = os.path.join(
            tempfile.gettempdir(), f"opl_events_stage_{abs(hash(sf_dir))}"
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "events-000.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
        src = stage
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + exact value sum per event type.

    Batch-or-streaming polymorphic: watermark only attaches on
    streaming inputs (it is meaningless — and rejected — on batch).
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            # exact decimal sum internally; canonical round(double,6) on
            # the wire (trailing-zero decimals hash unstably cross-engine)
            F.round(F.col("total_value").cast("double"), 6).alias("total_value"),
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user (gap-based), the canonical stateful
    stream op: ``session_window`` keeps state per open session and
    closes it ``gap`` after the last event (watermark bounds state)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").cast("string").alias("session_start"),
            F.col("s.end").cast("string").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_to_fact(
    stream_df: DataFrame,
    fact_path: str,
    checkpoint_path: str,
    timeout_sec: int = 120,
) -> None:
    """Streaming fact maintenance: continuously append a streaming
    aggregate into a parquet fact table the OLAP layer reads.

    ``foreachBatch`` + the streaming checkpoint give exactly-once
    appends across restarts (a replayed microbatch re-runs with the
    same batch id and the sink commit log skips it); ``update`` output
    mode emits only windows the batch changed, so steady-state append
    volume tracks the open-window count, not history.  Drains with
    ``availableNow`` so the same entry point serves replay/testing and
    a live trigger."""

    def append_batch(df: DataFrame, batch_id: int) -> None:
        df.withColumn("__batch_id", F.lit(batch_id)).write.mode("append").parquet(
            fact_path
        )

    q = (
        stream_df.writeStream.foreachBatch(append_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def run_to_memory(stream_df: DataFrame, name: str, timeout_sec: int = 120):
    """Drain a streaming DataFrame into an in-memory table and stop
    (availableNow trigger) — returns the query's result as a batch DF."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
