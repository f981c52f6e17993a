"""Scalar column-function library (see ``functions.scalar``)."""

from opl_spark.functions.scalar import (  # noqa: F401
    age_bucket_col,
    coalesce_zero,
    compact_date_col,
    months_back,
    remap_col,
)
