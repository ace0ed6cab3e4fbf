"""Streaming sources and sinks (SURVEY.md §2a row S5, §2i plumbing).

The `events` parquet is replayed as a file stream (the dev-loop stand-in
for Kafka/queue ingestion at scale); results land in a named memory sink
processed with `availableNow` so each streaming query runs to completion
and returns a bounded DataFrame the rows-only check can read.

The ns-timestamp repair (S2) applies to the stream exactly as to the batch
scan: the declared schema carries `ts` as long nanos (under
`nanosAsLong=true`) and the same `timestamp_micros(ts div 1000)` rebuild
runs on the streaming DataFrame.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.sources.catalog import repair_event_ts

_SINK_IDS = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events parquet with the S2 timestamp repair."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file source requires a directory basePath; the glob (matching only
    # the events file) makes Spark treat sf_dir as the base directory.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events.parque[t]")
    )
    return repair_event_ts(stream)


def run_to_memory(df: DataFrame, *, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink and
    return the sink contents as a batch DataFrame."""
    spark = df.sparkSession
    name = f"lime_stream_sink_{next(_SINK_IDS)}"
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        query.stop()
    return spark.table(name)


def run_foreach_batch_to_parquet(df: DataFrame, *, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame via a foreachBatch parquet sink and
    return the written rows as a batch DataFrame.

    foreachBatch is the production sink shape for destinations without a
    native streaming writer (JDBC upserts, external indexes, multi-table
    fan-out): each micro-batch arrives as a *batch* DataFrame with an
    epoch id for idempotent retries. Here every epoch appends to a unique
    scratch directory (partitioned by epoch so a retried epoch could be
    overwritten idempotently with dynamic partition overwrite on a real
    pipeline), then the caller reads the directory back.
    """
    import os
    import shutil
    import tempfile

    spark = df.sparkSession
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"lime_fb_sink_{spark.sparkContext.applicationId}_{next(_SINK_IDS)}",
    )

    def _write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .partitionBy("epoch_id")
            .parquet(out_dir)
        )

    query = (
        df.writeStream.foreachBatch(_write_epoch)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        query.stop()
    # Append mode can withhold EVERY row inside the watermark horizon, so
    # the scratch dir may contain no part files; spark.read.parquet would
    # then fail schema inference. Return an empty frame with the input
    # schema instead (epoch_id is synthetic, so it never appears here).
    has_data = any(
        f.endswith(".parquet")
        for _, _, files in os.walk(out_dir)
        for f in files
    )
    if not has_data:
        shutil.rmtree(out_dir, ignore_errors=True)
        return spark.createDataFrame([], df.schema)
    result = spark.read.parquet(out_dir).drop("epoch_id")
    # Materialize before the scratch dir disappears.
    rows = result.collect()
    shutil.rmtree(out_dir, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)
