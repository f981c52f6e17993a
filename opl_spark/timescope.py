"""Snapshot time-scope semantics.

Replicates the one nontrivial algorithm of the reference ETL — the
``TimeScope`` class (reference: library_olap/OLAP.php:3-45) — exactly:

- ``year``  = calendar year of the pivot date          (OLAP.php:38)
- ``month`` = calendar month, 1-12                     (OLAP.php:39)
- ``week``  = ``'Y' + ISO-week-year + '-W' + zero-padded ISO week``,
  e.g. ``Y2019-W05``                                   (OLAP.php:40)
- ``day``   = day-of-year, 1-based                     (OLAP.php:41)

Cron gating (OLAP.php:15-32): the snapshot job runs daily; a fact with
interval weekly/monthly/yearly executes only on the LAST day of the ISO
week / calendar month / calendar year (detected as "scope of date+1 day
differs at that grain").  When it fires, all scope fields FINER than the
interval are nulled (OLAP.php:21-27): monthly facts get week=day=NULL;
yearly get month=week=day=NULL.  Non-boundary days → None → skip fact.

Exposed in two forms: pure-Python (driver-side gating — a function of
one date, never data) and Spark Column builders (deriving scope columns
over a date/timestamp column of a billion-row DataFrame).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Interval names, coarse → fine (OLAP.php:6-7).
INTERVALS = ("yearly", "monthly", "weekly", "daily")

#: Scope field nulled when a fact's grain is coarser than that field.
_FIELD_OF_INTERVAL = {
    "yearly": "year",
    "monthly": "month",
    "weekly": "week",
    "daily": "day",
}


@dataclass(frozen=True)
class Scope:
    """One snapshot scope stamp. ``None`` fields were nulled by grain."""

    year: int | None
    month: int | None
    week: str | None
    day: int | None

    def as_dict(self) -> dict[str, int | str | None]:
        return {"year": self.year, "month": self.month, "week": self.week, "day": self.day}


def _coerce(d: _dt.date | str) -> _dt.date:
    if isinstance(d, str):
        return _dt.date.fromisoformat(d)
    if isinstance(d, _dt.datetime):
        return d.date()
    return d


def week_label(d: _dt.date | str) -> str:
    """``Y%G-W%V`` label, e.g. ``Y2019-W05`` (OLAP.php:40; PHP o/W are ISO)."""
    d = _coerce(d)
    iso = d.isocalendar()
    return f"Y{iso[0]}-W{iso[1]:02d}"


def make_scope(d: _dt.date | str) -> Scope:
    """Full (daily-grain) scope of a pivot date (OLAP.php:34-44)."""
    d = _coerce(d)
    return Scope(
        year=d.year,
        month=d.month,
        week=week_label(d),
        day=d.timetuple().tm_yday,  # PHP format('z')+1 — 1-based day-of-year
    )


def gate(d: _dt.date | str, interval: str) -> Scope | None:
    """Cron-boundary gate (OLAP.php:15-32).

    Returns the scope to stamp (with finer-than-grain fields nulled) if
    the fact should run on pivot date ``d``, else ``None`` (skip).
    """
    if interval not in INTERVALS:
        raise ValueError(f"unknown interval {interval!r}; expected one of {INTERVALS}")
    d = _coerce(d)
    scope = make_scope(d)
    if interval == "daily":
        return scope
    nxt = make_scope(d + _dt.timedelta(days=1))
    grain_field = _FIELD_OF_INTERVAL[interval]
    if getattr(scope, grain_field) == getattr(nxt, grain_field):
        return None  # not the last day of the period → skip (OLAP.php:328-330)
    # null every field finer than the grain (OLAP.php:21-27)
    fields = scope.as_dict()
    for iv in INTERVALS[INTERVALS.index(interval) + 1 :]:
        fields[_FIELD_OF_INTERVAL[iv]] = None
    return Scope(**fields)  # type: ignore[arg-type]


# --------------------------------------------------------------------------
# Spark column builders — same semantics over a date/timestamp column.
# --------------------------------------------------------------------------


def iso_week_year_col(d: Column) -> Column:
    """ISO-8601 week-based year of ``d``.

    Spark 3+/4 bans the week-based ``YYYY`` datetime pattern, so derive
    it as the calendar year of the Thursday of ``d``'s ISO week — the
    defining property of the ISO week-year.  Pure built-in expressions:
    stays inside whole-stage codegen.
    """
    # dayofweek: 1=Sunday..7=Saturday  →  ISO dow 1=Monday..7=Sunday
    iso_dow = (F.dayofweek(d) + F.lit(5)) % F.lit(7) + F.lit(1)
    thursday = F.date_add(d, (F.lit(4) - iso_dow).cast("int"))
    return F.year(thursday)


def week_label_col(d: Column) -> Column:
    """``Y%G-W%V`` label column, e.g. ``Y2019-W05``."""
    return F.concat(
        F.lit("Y"),
        iso_week_year_col(d).cast("string"),
        F.lit("-W"),
        F.lpad(F.weekofyear(d).cast("string"), 2, "0"),
    )


def scope_columns(d: Column) -> dict[str, Column]:
    """The four scope columns derived from a date/timestamp column."""
    return {
        "year": F.year(d).cast("long"),
        "month": F.month(d).cast("long"),
        "week": week_label_col(d),
        "day": F.dayofyear(d).cast("long"),
    }
