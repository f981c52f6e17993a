"""Scalar column-function builders (SURVEY.md §2.2 P1-P7) must agree
with the documented reference semantics."""

from pyspark.sql import functions as F

from opl_spark.functions import (
    age_bucket_col,
    coalesce_zero,
    compact_date_col,
    months_back,
    remap_col,
)


def test_age_bucket_reference_bands(spark):
    df = spark.createDataFrame(
        [(1930, "BUILDING"), (1984, "BUILDING"), (1990, "HOUSEHOLD"), (1998, "AUTOMOBILE")],
        "birth int, seg string",
    )
    out = df.select(
        age_bucket_col(
            F.col("birth"), F.lit(1998), na_when=F.col("seg") == "HOUSEHOLD"
        ).alias("b")
    ).collect()
    assert [r["b"] for r in out] == ["61+", "0-14", "n/a", "0-14"]


def test_months_back_and_compact_date(spark):
    df = spark.range(1).select(F.lit("2019-05-22").cast("date").alias("d"))
    row = df.select(
        months_back(F.col("d"), 12).cast("string").alias("back"),
        compact_date_col(F.col("d")).alias("compact"),
    ).collect()[0]
    assert row["back"] == "2018-05-22"
    assert row["compact"] == "20190522"


def test_remap_and_zero_fill(spark):
    df = spark.createDataFrame([("O", None), ("F", 3)], "g string, v int")
    rows = df.select(
        remap_col(F.col("g"), {"O": "n/a"}).alias("g2"),
        coalesce_zero(F.col("v")).alias("v2"),
    ).collect()
    assert [(r["g2"], r["v2"]) for r in rows] == [("n/a", 0), ("F", 3)]
