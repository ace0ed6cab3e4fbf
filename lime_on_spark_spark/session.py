"""SparkSession construction and runtime configuration.

Two entry paths:

* ``get_spark()`` — builds a local session (tests, bench).
* ``configure(spark)`` — applies the runtime-settable confs to a session we
  did NOT build (the verify driver owns its own ``SparkSession``); every
  catalog load calls this so the engine works under a foreign session.

Scale notes (100 TB target): all confs here are also correct on a real
cluster — AQE handles post-shuffle coalescing and skew-join splitting, the
shuffle-partition default is only a local-mode override (cluster deploys
should size it ~2-3x total cores or rely on AQE's coalescing from a high
initial value).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

#: Confs that are runtime-settable (spark.conf.set works after session start).
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet carries timestamp[ns]; vanilla Spark 4 raises
    # PARQUET_TYPE_ILLEGAL. With this conf the column arrives as long nanos
    # and sources.catalog repairs it to TimestampType (SURVEY.md §1.2).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp rendering; parquet corpus is naive/UTC and the
    # DuckDB oracle reads it as naive — UTC makes both sides agree.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDF exchange (LIME ridge, as-of merge fallback).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r17: Spark 4.1's ChecksumCheckpointFileManager leaks its per-manager
    # thread pool when a streaming query terminates (~112 threads PER
    # availableNow query, measured): a long-lived session accumulates
    # thousands of threads and every later query — batch included —
    # degrades 2-6x from scheduler/GC contention. Checkpoint-file checksums
    # exist to detect corruption in durable production checkpoints; this
    # engine's streaming rows use ephemeral per-run checkpoint dirs, so
    # the protection is pure leak. Re-enable for durable checkpoints.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
    # r17: unload state-store providers when an availableNow query
    # commits — otherwise every (operator, partition) provider stays
    # loaded in the local executor with its maintenance work forever.
    # Right for this engine's short-lived queries; a long-running
    # production stream would keep the default (false) to avoid per-batch
    # provider reloads.
    "spark.sql.streaming.stateStore.unloadOnCommit": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-owned session (best-effort)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf not runtime-settable in this build — the caller's session
            # config wins; catalog repair degrades gracefully.
            pass
    return spark


def get_spark(
    app_name: str = "lime-on-spark-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession sized for this machine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    ``shuffle_partitions`` defaults to the core count — at bench scale
    (sf<=0.1) large shuffle fan-out is pure overhead (BASELINE.md config).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


@contextmanager
def temp_conf(spark: SparkSession, key: str, value: str):
    """Set a session conf for the duration of a block, then restore the
    prior value (or unset if it had none) — the save/restore discipline
    shared by every plan that must flip a planner flag (o9, p18, s14)
    without leaking it into the rest of the shared session."""
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
