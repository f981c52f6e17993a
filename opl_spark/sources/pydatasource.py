"""Custom source via the Python Data Source API (Spark 4, SPARK-44076):
a deterministic synthetic-table generator, registered like any format:

    spark.dataSource.register(SyntheticSource)
    spark.read.format("opl_synth").option("rows", 10_000).load()

Why it earns its place in the sources tier: the reference's script
source (registry.py) shells out to a driver-side subprocess — fine for
config-sized payloads, but generation CAN'T parallelize.  A Python
data source instead declares PARTITIONS, and every executor runs its
partition's ``read`` independently — generation scales with the
cluster, not the driver.  The same API shape (partitions + per-
partition iterator) is how a production team wraps any black-box
Python reader (REST pagination, proprietary SDKs) without a JVM
connector.

Determinism contract: row ``i`` is a pure function of ``i`` and the
``seed`` option (Knuth multiplicative hashing — the same family the
sampling operators use), so retried tasks and re-runs produce
identical data.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_KNUTH = 2654435761
_M32 = 1 << 32


class _Slice(InputPartition):
    def __init__(self, lo: int, hi: int, seed: int):
        self.lo, self.hi, self.seed = lo, hi, seed


class SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        step = max(1, -(-self.rows // self.parts))
        return [
            _Slice(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.lo, partition.hi):
            h = (i * _KNUTH + partition.seed) % _M32
            yield (i, int(h % 100), round(h / _M32, 6))


class SyntheticSource(DataSource):
    """``format("opl_synth")`` — options: rows, partitions, seed."""

    @classmethod
    def name(cls) -> str:
        return "opl_synth"

    def schema(self) -> str:
        return "id bigint, bucket int, x double"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticReader(self.options)
