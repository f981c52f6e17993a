"""Round-trip tests for the generic format connectors: every native
format must write-then-read value-identically, explicit schemas must
skip inference, and partitioned writes must land in PartitionFilters
on read-back."""

import pytest
from pyspark.sql import functions as F

from opl_spark.plans import partition_filters
from opl_spark.sources import load_any, load_table, save_any
from opl_spark.sources.formats import infer_format


def _nations(spark, sf_dir):
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_value_identical(spark, sf_dir, tmp_path, fmt):
    src = _nations(spark, sf_dir)
    path = str(tmp_path / f"nation_rt.{fmt}")
    save_any(src, path, mode="overwrite")
    back = load_any(
        spark, path, schema="n_nationkey long, n_name string, n_regionkey long"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_infers_types_without_schema(spark, sf_dir, tmp_path):
    src = _nations(spark, sf_dir)
    path = str(tmp_path / "nation_inf.csv")
    save_any(src, path, mode="overwrite")
    back = load_any(spark, path)
    # inferSchema promotes the key columns back to integers
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")
    assert back.count() == src.count()


def test_tsv_uses_tab_delimiter(spark, tmp_path):
    df = spark.createDataFrame([(1, "a,b"), (2, "c")], "k long, v string")
    path = str(tmp_path / "vals.tsv")
    save_any(df, path, mode="overwrite")
    back = load_any(spark, path, schema="k long, v string")
    # commas survive inside fields because the delimiter is \t
    assert sorted(map(tuple, back.collect())) == [(1, "a,b"), (2, "c")]


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    src = _nations(spark, sf_dir)
    path = str(tmp_path / "nation_part.parquet")
    save_any(src, path, mode="overwrite", partition_by=["n_regionkey"])
    back = load_any(spark, path).filter(F.col("n_regionkey") == 2)
    pf = partition_filters(back)
    assert pf and "n_regionkey" in pf[0], pf


def test_infer_format_rejects_unknown():
    with pytest.raises(ValueError, match="cannot infer format"):
        infer_format("/data/table.xyz")


def test_read_media_dir_binary_ingestion(spark, tmp_path):
    """binaryFile ingestion must produce the canonical media struct
    with intact bytes, mime from the extension, and a path-stable id —
    and feed straight into the existing decode/metadata operators."""
    from opl_spark.operators.multimodal import decode_images, media_metadata
    from opl_spark.sources.formats import read_media_dir

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-payload")
    (d / "b.bin").write_bytes(b"opaque-bytes")
    media = read_media_dir(spark, str(d))
    rows = {r["source_path"].split("/")[-1]: r for r in media.collect()}
    assert bytes(rows["a.png"]["media"]["media_bytes"]) == b"\x89PNG-fake-payload"
    assert rows["a.png"]["media"]["mime"] == "image/png"
    assert rows["b.bin"]["media"]["mime"] == "application/octet-stream"
    assert rows["a.png"]["byte_len"] == 17
    # id is stable across re-reads
    again = {r["source_path"].split("/")[-1]: r["media"]["media_id"]
             for r in read_media_dir(spark, str(d)).collect()}
    assert again == {k: r["media"]["media_id"] for k, r in rows.items()}
    # plugs into the downstream operators unchanged
    meta = media_metadata(media.select("media"))
    assert meta.count() == 2 and "content_md5" in meta.columns
    feats = decode_images(media.select("media"))
    assert feats.count() == 2


@pytest.mark.slow  # r14 slow tier
def test_python_data_source_generates_deterministic_partitions(spark):
    """The custom Python data source must parallelize generation across
    its declared partitions and produce identical data on re-read
    (retried tasks see the same rows)."""
    from opl_spark.sources.pydatasource import SyntheticSource

    spark.dataSource.register(SyntheticSource)
    df = (
        spark.read.format("opl_synth")
        .option("rows", 5000)
        .option("partitions", 8)
        .option("seed", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 5000
    assert df.select("id").distinct().count() == 5000
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in (
        spark.read.format("opl_synth")
        .option("rows", 5000).option("partitions", 8).option("seed", 7).load()
    ).collect())
    assert a == b
    # a different seed produces different payloads, same ids
    c = (
        spark.read.format("opl_synth")
        .option("rows", 5000).option("partitions", 8).option("seed", 8).load()
    )
    assert sorted(r["id"] for r in c.collect()) == [t[0] for t in a]
    assert sorted(tuple(r) for r in c.collect()) != a
