"""Every registered workload query must hash-match its DuckDB oracle —
a local replica of the driver's t2 gate, run at sf0.001 for speed."""

import pytest

from opl_spark import workload
from tests.oracle import assert_parity

PAIRS = sorted(workload.oracle_sql().keys())


def test_every_query_has_a_callable():
    qs = workload.queries()
    for name in PAIRS:
        assert name in qs


@pytest.mark.parametrize("name", PAIRS)
@pytest.mark.slow  # r14 slow tier
def test_oracle_parity(spark, sf_dir, name):
    df = workload.queries()[name](spark, sf_dir)
    assert_parity(df, workload.oracle_sql()[name], sf_dir)
