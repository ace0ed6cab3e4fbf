"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The S6 surface: when a feed has no built-in connector (an internal queue,
a bespoke binary format, a metered API), Spark 4 lets the connector live in
Python while the SCAN stays distributed — each `InputPartition` is read by
its own executor task, so throughput scales with partition count exactly
like a file source. This module ships a deterministic synthetic-series
source (closed-form rows, so a SQL oracle can reproduce it exactly) as the
template: partition planning in `partitions()`, per-task row generation in
`read()`.

Scale notes: `partitions()` runs on the driver and must stay O(#partitions)
— here it emits one `InputPartition` per slice descriptor, never rows. All
row materialization happens inside `read()` on executors.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticSeriesSource(DataSource):
    """`spark.read.format("synthetic_series").option("n", N)` — N rows of
    (i, v, bucket) with v = (i² mod 97)/10 and bucket = i mod 8."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_series"

    def schema(self) -> str:
        return "i BIGINT, v DOUBLE, bucket INT"

    def reader(self, schema) -> "SyntheticSeriesReader":
        return SyntheticSeriesReader(self.options)


class SyntheticSeriesReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):  # driver-side: O(#partitions) descriptors only
        per = -(-self.n // self.num_partitions)  # ceil
        return [
            InputPartition((p * per, min((p + 1) * per, self.n)))
            for p in range(self.num_partitions)
            if p * per < self.n
        ]

    def read(self, partition: InputPartition):  # executor-side row gen
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, (i * i % 97) / 10.0, i % 8)
