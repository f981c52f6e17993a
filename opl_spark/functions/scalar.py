"""The reference's documented scalar expression surface (SURVEY.md
§2.2 P1-P7) as reusable column builders — fact-query authors compose
these instead of re-writing CASE chains per fact.

All builders return pure Catalyst expressions (whole-stage-codegen
eligible, no Python in the row path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def age_bucket_col(
    birth_year: Column,
    pivot_year: Column,
    bands: Sequence[tuple[int, str]] = (
        (14, "0-14"),
        (25, "15-25"),
        (40, "26-40"),
        (60, "41-60"),
    ),
    top_label: str = "61+",
    na_when: Column | None = None,
    na_label: str = "n/a",
) -> Column:
    """P2 — the reference's age-band CASE chain (active-users query,
    library_olap/README.md:41-45): age = pivot_year - birth_year,
    bucketed at the band upper bounds, with an optional n/a guard."""
    age = pivot_year - birth_year
    expr = F.lit(top_label)
    for bound, label in sorted(bands, reverse=True):
        expr = F.when(age <= bound, F.lit(label)).otherwise(expr)
    if na_when is not None:
        expr = F.when(na_when, F.lit(na_label)).otherwise(expr)
    return expr


def months_back(pivot: Column, months: int) -> Column:
    """P3 — ``DATE_SUB(@date, INTERVAL n MONTH)``
    (library_olap/README.md:48)."""
    return F.add_months(pivot, -months)


def compact_date_col(d: Column) -> Column:
    """P5 — ``YYYY-MM-DD`` → ``YYYYMMDD`` (the connector's date-field
    reformat, Codice.gs:176)."""
    return F.date_format(d, "yyyyMMdd")


def remap_col(col: Column, mapping: dict[str, str], default: Column | None = None) -> Column:
    """P2 — literal value remap (e.g. gender ``'O'`` → ``'n/a'``,
    library_olap/README.md:44) as a CASE chain."""
    expr = default if default is not None else col
    for src, dst in sorted(mapping.items(), reverse=True):
        expr = F.when(col == src, F.lit(dst)).otherwise(expr)
    return expr


def coalesce_zero(col: Column) -> Column:
    """P7 — measure null handling: missing → 0 (the connector's
    zero-fill contract, Codice.gs:361-373)."""
    return F.coalesce(col, F.lit(0))
