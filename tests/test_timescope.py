"""Pure-Python time-scope semantics (reference OLAP.php:3-45) +
Spark-column parity, including the ISO week-year edge cases called out
in SURVEY.md §7.2 stage 1."""

import datetime as dt

import pytest

from opl_spark.timescope import Scope, gate, make_scope, week_label


def test_make_scope_reference_example():
    # PHP: date 2019-05-22 → Y2019-W21, day-of-year 142 (0-based z=141 +1)
    s = make_scope("2019-05-22")
    assert s == Scope(year=2019, month=5, week="Y2019-W21", day=142)


@pytest.mark.parametrize(
    "d,label",
    [
        ("2019-02-01", "Y2019-W05"),  # zero-padded week (PHP format 'W')
        ("2016-01-01", "Y2015-W53"),  # ISO week-year != calendar year
        ("2019-12-30", "Y2020-W01"),  # Dec 30 belongs to next ISO year
        ("2021-01-03", "Y2020-W53"),  # Jan 3 belongs to prior ISO year
    ],
)
def test_week_label_iso_edges(d, label):
    assert week_label(d) == label


def test_gate_daily_always_fires():
    for day in range(1, 29):
        s = gate(dt.date(2019, 5, day), "daily")
        assert s is not None and s.day is not None


def test_gate_weekly_fires_only_on_sunday():
    # ISO weeks end on Sunday; over a full year exactly the Sundays fire.
    d = dt.date(2019, 1, 1)
    fired = []
    while d.year == 2019:
        if gate(d, "weekly") is not None:
            fired.append(d)
        d += dt.timedelta(days=1)
    assert all(x.isoweekday() == 7 for x in fired)
    assert len(fired) == 52  # Sundays in 2019

    s = gate(dt.date(2019, 5, 26), "weekly")  # a Sunday
    assert s is not None
    assert s.day is None  # finer-than-weekly fields nulled (OLAP.php:21-27)
    assert s.week == "Y2019-W21"
    assert s.year == 2019 and s.month == 5


def test_gate_monthly_last_day_nulls_week_and_day():
    assert gate("2019-05-30", "monthly") is None
    s = gate("2019-05-31", "monthly")
    assert s == Scope(year=2019, month=5, week=None, day=None)


def test_gate_yearly_only_dec31():
    assert gate("2019-12-30", "yearly") is None
    s = gate("2019-12-31", "yearly")
    assert s == Scope(year=2019, month=None, week=None, day=None)


def test_gate_leap_year_feb():
    assert gate("2020-02-28", "monthly") is None
    assert gate("2020-02-29", "monthly") == Scope(2020, 2, None, None)


def test_spark_scope_columns_match_python(spark):
    """The Spark column builders must agree with the pure-Python scope
    for every day across year boundaries (the pattern-ban workaround
    for ISO week-year must be exact)."""
    from pyspark.sql import functions as F

    from opl_spark.timescope import scope_columns

    start, end = dt.date(2015, 12, 20), dt.date(2021, 1, 10)
    days = (end - start).days + 1
    df = spark.range(days).select(
        F.date_add(F.lit(start), F.col("id").cast("int")).alias("d")
    )
    sc = scope_columns(F.col("d"))
    rows = df.select("d", *[c.alias(k) for k, c in sc.items()]).collect()
    assert len(rows) == days
    for r in rows:
        py = make_scope(r["d"])
        assert (r["year"], r["month"], r["week"], r["day"]) == (
            py.year,
            py.month,
            py.week,
            py.day,
        ), f"scope mismatch at {r['d']}"


def test_spark_week_columns_match_python_isocalendar_exhaustively(spark):
    """Every day over six years (incl. the 53-week years 1998/2004
    patterns and all Dec/Jan boundaries): the Spark column builders
    must agree with Python's isocalendar — the iso_week cube hierarchy
    (r11) keys cuts and drilldowns off these columns, so a single
    off-by-one day would silently misplace boundary rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from opl_spark.timescope import iso_week_year_col, week_label, week_label_col

    start, end = dt.date(1995, 1, 1), dt.date(2000, 12, 31)
    days = [(start + dt.timedelta(days=i)).isoformat()
            for i in range((end - start).days + 1)]
    d = F.to_date("ds")
    out = spark.createDataFrame([(x,) for x in days], "ds: string").select(
        "ds",
        iso_week_year_col(d).alias("iy"),
        week_label_col(d).alias("wl"),
    ).collect()
    assert len(out) == len(days)
    for r in out:
        py = dt.date.fromisoformat(r["ds"])
        iso = py.isocalendar()
        assert r["iy"] == iso[0], r["ds"]
        assert r["wl"] == week_label(py) == f"Y{iso[0]}-W{iso[1]:02d}", r["ds"]
