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


# ---------------------------------------------------------------------------
# Streaming variant (S11): the Spark 4 Python streaming data source API.
# Unlike SimpleDataSourceStreamReader (driver-side reads, prototyping only),
# DataSourceStreamReader keeps the scan DISTRIBUTED: latestOffset() runs on
# the driver and advances the watermark of available data, partitions(start,
# end) plans O(#slices) descriptors, and read(partition) materializes rows
# on executors — the same task fan-out as the batch source above. The
# source is finite and closed-form (rows [0, n) in fixed micro-batch
# blocks), so a SQL oracle reproduces the union of all micro-batches
# exactly — pinning exactly-once delivery across batch boundaries.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class SyntheticStreamSource(DataSource):
    """`spark.readStream.format("synthetic_stream")` — rows (i, v, bucket)
    with v = (i² mod 97)/10, bucket = i mod 8, emitted in `rows_per_batch`
    blocks until `n` rows have been produced."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_stream"

    def schema(self) -> str:
        return "i BIGINT, v DOUBLE, bucket INT"

    def streamReader(self, schema) -> "SyntheticStreamReader":
        return SyntheticStreamReader(self.options)


class SyntheticStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 600))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self.num_partitions = int(options.get("partitions", 4))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # One block of new data becomes available per micro-batch planning
        # cycle, capped at the finite end — driver-side bookkeeping only.
        cur = getattr(self, "_cur", 0)
        self._cur = min(cur + self.rows_per_batch, self.n)
        return {"offset": self._cur}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [InputPartition((lo, lo))]
        per = -(-(hi - lo) // self.num_partitions)  # ceil
        return [
            InputPartition((lo + p * per, min(lo + (p + 1) * per, hi)))
            for p in range(self.num_partitions)
            if lo + p * per < hi
        ]

    def read(self, partition: InputPartition):  # executor-side row gen
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, (i * i % 97) / 10.0, i % 8)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the source is synthetic
