"""Generic file-format connectors: one load/save surface over the
formats Spark ships natively (parquet, csv, json, orc, text).

The reference ingests from exactly two source kinds — operator SQL
and script stdout (library_olap/OLAP.php:81-89, 73-79) — but its
users' replacement engine must read whatever lands in the lake.  The
rules that matter at 100 TB:

- **Schema is an argument, not an inference.**  ``inferSchema`` on
  CSV/JSON is a full extra pass over the data; callers pass the
  schema (or a ``samplingRatio``) in production.  Inference is the
  interactive/dev default here, flagged as such.
- **Formats that carry their schema (parquet/orc) prune columns and
  push filters**; CSV/JSON scans parse every byte of selected rows.
  The loader is format-transparent so the workload SQL doesn't care,
  but conversion-to-columnar is the first step of any pipeline that
  rereads its inputs.
- **Writes partition and compress.**  ``save_any`` accepts the same
  ``partition_by`` the snapshot sink uses; default codecs (snappy /
  zstd for text-likes) stay splittable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: extension → Spark datasource name
_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
    ".txt": "text",
}


def infer_format(path: str) -> str:
    """Datasource name from the path's extension (directories of part
    files keep the extension on their basename by convention)."""
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    fmt = _EXT_FORMAT.get(ext.lower())
    if fmt is None:
        raise ValueError(
            f"cannot infer format from {path!r}; pass fmt= explicitly "
            f"(known extensions: {sorted(_EXT_FORMAT)})"
        )
    return fmt


def load_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in any native format.

    With ``schema`` the scan is single-pass (the 100 TB path).  Without
    it, self-describing formats (parquet/orc) read their footer;
    csv/json fall back to ``inferSchema`` — a full extra pass, dev-only.
    TSV gets its tab delimiter; csv defaults to ``header=true``.
    """
    fmt = fmt or infer_format(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if path.rstrip("/").endswith(".tsv"):
            reader = reader.option("sep", "\t")
        if schema is None:
            reader = reader.option("inferSchema", "true")  # dev-only double pass
    if fmt == "json" and schema is None:
        # Spark samples JSON for schema by default; full accuracy needs
        # samplingRatio=1.0 which callers can override
        reader = reader.option("samplingRatio", options.pop("samplingRatio", "1.0"))
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def save_any(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in any native format, optionally
    partitioned by columns (directory layout = partition pruning for
    every later reader)."""
    fmt = fmt or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
        if path.rstrip("/").endswith(".tsv"):
            writer = writer.option("sep", "\t")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_media_dir(spark, path: str, glob: str | None = None):
    """Ingest a directory of opaque media files as the canonical
    binary-media layout (``media.media_bytes / mime / media_id`` plus
    provenance path/length): Spark's built-in ``binaryFile`` source
    reads file contents distributed (each executor reads its own
    split of files; nothing routes through the driver), so this is
    the REAL ingestion path the ``with_media_column`` test fixture
    stands in for.

    ``media_id`` is the xxhash64 of the file path — stable across
    runs and executors; dedup on ``md5(media_bytes)`` downstream via
    :func:`opl_spark.operators.multimodal.media_metadata`.
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = (
        F.when(ext == "png", "image/png")
        .when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "wav", "audio/wav")
        .when(ext == "mp4", "video/mp4")
        .otherwise("application/octet-stream")
    )
    return raw.select(
        F.struct(
            F.col("content").alias("media_bytes"),
            mime.alias("mime"),
            F.xxhash64("path").alias("media_id"),
        ).alias("media"),
        F.col("path").alias("source_path"),
        F.col("length").alias("byte_len"),
    )
