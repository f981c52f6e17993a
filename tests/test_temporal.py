"""As-of / interval join edge semantics: equal-timestamp inclusion,
deterministic tie resolution, inner-drop behavior, and window-boundary
inclusivity — the corners the corpus-level oracle parity test
(tests/test_workload_parity.py q_asof_join / q_interval_join) cannot
isolate."""

import pytest

from opl_spark.operators.temporal import asof_join, interval_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, 10),  # equal-ts right row exists
            (101, 1, 5),  # matches both the ts-5 twins
            (102, 2, 7),  # right row is LATER -> dropped (inner)
            (103, 3, 1),  # keyless on the right -> dropped
        ],
        "lid long, k long, lts long",
    )
    right = spark.createDataFrame(
        [
            (200, 1, 5),
            (204, 1, 5),  # twin at the same ts — tie case
            (201, 1, 10),
            (202, 1, 11),  # after every left row
            (203, 2, 8),
        ],
        "rid long, k long, rts long",
    )
    return left, right


def test_asof_join_edges(frames):
    left, right = frames
    out = {
        r["lid"]: (r["rid"], r["rts"])
        for r in asof_join(left, right, ["k"], "lts", "rts").collect()
    }
    # equal timestamps match (right_ts <= left_ts)
    assert out[100] == (201, 10)
    # among equal-ts right rows the greatest payload wins — deterministic
    assert out[101] == (204, 5)
    # left rows with no at-or-before right row are dropped (inner)
    assert 102 not in out and 103 not in out


def test_asof_join_forward_direction(frames):
    left, right = frames
    out = {
        r["lid"]: (r["rid"], r["rts"])
        for r in asof_join(
            left, right, ["k"], "lts", "rts", direction="forward"
        ).collect()
    }
    # equal timestamps match (right_ts >= left_ts)
    assert out[100] == (201, 10)
    # nearest FUTURE right row; among equal-ts rights the least payload
    assert out[101] == (200, 5)
    # key-2 left at 7 now matches the right row at 8
    assert out[102] == (203, 8)
    # still inner: keyless left dropped
    assert 103 not in out

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "lts", "rts", direction="sideways")


def test_asof_join_rejects_column_overlap(frames):
    left, right = frames
    with pytest.raises(ValueError, match="share non-key columns"):
        asof_join(left, left.withColumnRenamed("lid", "rid"), ["k"], "lts", "lts")


def test_interval_join_boundaries(spark):
    left = spark.createDataFrame([(1, 1, 100)], "lid long, k long, lts long")
    right = spark.createDataFrame(
        [
            (10, 1, 100),  # rts == lts          -> included
            (11, 1, 90),  # lts - lookback      -> EXCLUDED (half-open)
            (12, 1, 91),  # just inside          -> included
            (13, 1, 101),  # after the anchor    -> excluded
            (14, 2, 95),  # other key            -> excluded
        ],
        "rid long, k long, rts long",
    )
    got = sorted(
        r["rid"]
        for r in interval_join(left, right, ["k"], "lts", "rts", 10).collect()
    )
    assert got == [10, 12]
