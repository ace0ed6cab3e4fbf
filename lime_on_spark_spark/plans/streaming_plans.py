"""Structured Streaming operators (SURVEY.md §2a row S5, §2i rows T1/T4/T5/T6
streaming variants; their batch twins live in plans/events_time.py).

Every entry here is oracle-checked: complete-mode / full-replay queries
reuse their batch twin's SQL verbatim, and the append-mode rows (t4/t8)
carry the closed-form single-micro-batch watermark twin (emit exactly the
windows at or before the final watermark).

Every query replays the events parquet as a file stream, runs to completion
with `availableNow`, and returns the materialized sink — so the driver's
rows-only check exercises real streaming execution (state store, watermarks,
micro-batch planning), not a batch rewrite.

Scale notes: all stateful ops are keyed and watermarked so state size is
bounded by (keys in the watermark horizon), not by stream length — the
invariant that matters on an unbounded 100-TB/day stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.streaming.sources import read_events_stream, run_to_memory


# --------------------------------------------------------------------------
# S5 — deterministic dev stream source (rate-micro-batch)
# --------------------------------------------------------------------------
@register(
    "s5_rate_source",
    oracle="""
    SELECT CAST(v % 10 AS BIGINT)        AS bucket,
           COUNT(*)                      AS n,
           CAST(SUM(v) AS BIGINT)        AS sum_value
    FROM (SELECT unnest(range(100)) AS v)
    GROUP BY bucket
    """,
)
def s5_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One micro-batch of the deterministic rate source: proves the
    readStream -> transform -> sink loop without touching disk."""
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 100)
        .option("numPartitions", 2)
        .option("startTimestamp", 0)
        .load()
        .withColumn("bucket", F.pmod("value", F.lit(10)))
    )
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )
    name = "lime_rate_sink"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(once=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        query.stop()
    return spark.table(name)


# --------------------------------------------------------------------------
# S11 — custom Python STREAMING data source (Spark 4
# DataSourceStreamReader): the streaming twin of S6. latestOffset() plans
# one finite block per micro-batch; partitions() fans each batch across
# executor tasks; the memory-sink aggregate is polled until all n rows
# have flowed through (3 micro-batches: 250+250+100). The oracle
# reproduces the closed-form union of all batches, so a row lost or
# duplicated at ANY micro-batch boundary (the classic streaming-connector
# bug class) fails the bucket counts.
# --------------------------------------------------------------------------
@register(
    "s11_python_stream_source",
    oracle="""
    SELECT CAST(i % 8 AS INT)                          AS bucket,
           COUNT(*)                                    AS n,
           ROUND(SUM((i * i % 97) / 10.0), 4)          AS sum_v,
           CAST(MIN(i) AS BIGINT)                      AS min_i,
           CAST(MAX(i) AS BIGINT)                      AS max_i
    FROM (SELECT unnest(range(600)) AS i)
    GROUP BY bucket
    """,
)
def s11_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time as _time

    from lime_on_spark_spark.sources.python_source import SyntheticStreamSource

    try:
        spark.dataSource.register(SyntheticStreamSource)
    except Exception:
        pass  # already registered in this session
    n_total = 600
    stream = (
        spark.readStream.format("synthetic_stream")
        .option("n", n_total)
        .option("rows_per_batch", 250)
        .option("partitions", 4)
        .load()
    )
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 4).alias("sum_v"),
        F.min("i").cast("bigint").alias("min_i"),
        F.max("i").cast("bigint").alias("max_i"),
    )
    name = "lime_pystream_sink"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            got = spark.table(name).agg(F.sum("n")).first()[0]
            if got == n_total:
                break
            _time.sleep(0.5)
        else:
            raise TimeoutError(
                f"s11: streaming source drained {got}/{n_total} rows"
            )
    finally:
        query.stop()
    return spark.table(name)


# --------------------------------------------------------------------------
# T1 streaming — tumbling 1-hour aggregation over the event stream
# --------------------------------------------------------------------------
@register(
    "t1_streaming_tumbling",
    # complete-mode availableNow replay == the batch twin, so the oracle is
    # t1_tumbling_hour's SQL verbatim — the driver now checks the streaming
    # path end-to-end (state store, micro-batch planning) against DuckDB.
    oracle="""
    SELECT date_trunc('hour', ts)                             AS hour_start,
           event_type,
           COUNT(*)                                           AS n_events,
           ROUND(SUM(value), 2)                               AS total_value
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def t1_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    # complete mode: emit every window including those inside the final
    # watermark horizon, so the result equals the batch twin exactly.
    return run_to_memory(agg, output_mode="complete")


# --------------------------------------------------------------------------
# T4 — watermark + late-data drop (append mode: only finalized windows)
# --------------------------------------------------------------------------
@register(
    "t4_watermark_append",
    # The replay is a single micro-batch (one parquet file,
    # maxFilesPerTrigger=1), so no window is finalized before all its rows
    # arrive and append mode emits exactly the windows whose end is at or
    # before the FINAL watermark (max event time - 10 min). That makes the
    # late-drop semantics SQL-expressible; a change to multi-batch replay
    # (which can genuinely drop late rows) breaks this match loudly.
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n_events
    FROM events
    GROUP BY hour_start
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <=
           (SELECT MAX(ts) - INTERVAL 10 MINUTE FROM events)
    """,
)
def t4_watermark_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("hour_start"), "n_events")
    )
    # append mode emits a window only once the watermark passes its end —
    # the streaming-correctness semantics T4 exists to exercise.
    return run_to_memory(agg, output_mode="append")


# --------------------------------------------------------------------------
# T5 — streaming dedup within the watermark horizon
# --------------------------------------------------------------------------
@register(
    "t5_streaming_dedup",
    # event_id is globally unique in the corpus, so dedup-then-count equals
    # the plain per-type count; a dedup that wrongly drops or duplicates
    # rows breaks the match.
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique_events
    FROM events
    GROUP BY event_type
    """,
)
def t5_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    sink = run_to_memory(deduped, output_mode="append")
    return sink.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique_events")
    )


# --------------------------------------------------------------------------
# T6 — arbitrary stateful op: per-user session stats via applyInPandasWithState
# --------------------------------------------------------------------------
@register(
    "t6_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*)              AS n_events,
           ROUND(MAX(value), 2)  AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def t6_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom keyed state: running event count + max value per user,
    emitted at state timeout — the minimal template for bespoke stateful
    operators that session_window/window can't express."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, vmax = state.get if state.exists else (0, float("-inf"))
        for pdf in pdf_iter:
            n += len(pdf)
            vmax = max(vmax, float(pdf["value"].max()))
        state.update((n, vmax))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [round(vmax, 2)]}
        )

    events = read_events_stream(spark, sf_dir).select("user_id", "value")
    stats = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, max_value double",
        stateStructType="n bigint, vmax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = run_to_memory(stats, output_mode="update")
    # update mode may emit a key several times (once per micro-batch that
    # touched it); the final state per user is the max-n row.
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value")
    )


# --------------------------------------------------------------------------
# T2 streaming — sliding 1-hour / 15-minute windows over the stream
# --------------------------------------------------------------------------
@register(
    "t2_streaming_sliding",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + (CAST(floor(epoch(ts) / 900) AS BIGINT) - k.k) * 900
               * INTERVAL '1 second'                          AS window_start,
           COUNT(*)                                           AS n_events,
           ROUND(SUM(value), 2)                               AS total_value
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY window_start
    """,
)
def t2_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(agg, output_mode="complete")


# --------------------------------------------------------------------------
# T3 streaming — session windows (30-minute gap) per user over the stream
# --------------------------------------------------------------------------
@register(
    "t3_streaming_session",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END                         AS new_session
        FROM events
    ), s AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS session_id
        FROM g
    )
    SELECT user_id,
           MIN(ts)                                            AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE                       AS session_end,
           COUNT(*)                                           AS n_events,
           ROUND(SUM(value), 2)                               AS total_value
    FROM s
    GROUP BY user_id, session_id
    """,
)
def t3_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(agg, output_mode="complete")


# --------------------------------------------------------------------------
# T7 — stream-stream inner join (watermarked, time-range condition)
# --------------------------------------------------------------------------
@register(
    "t7_stream_stream_join",
    # inner stream-stream joins emit each matched pair in the micro-batch
    # that matches it, so a full availableNow replay materializes exactly
    # the batch time-range join.
    oracle="""
    SELECT c.user_id                       AS user_id,
           COUNT(*)                        AS n_attributed_pairs,
           ROUND(SUM(p.value), 2)          AS attributed_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY c.user_id
    """,
)
def t7_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the click stream to the purchase stream: same user, purchase
    within 1 hour AFTER the click (attribution-window semantics).

    Both sides carry watermarks and the join condition bounds event time on
    both sides, so Spark can evict join state — state is bounded by (events
    in the watermark horizon), not stream length: the invariant that keeps
    a stream-stream join alive on an unbounded feed. The raw joined rows go
    to the sink; the bounded aggregate below is batch post-processing.
    tests/test_streaming.py pins equality against the batch-join twin.
    """
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    sink = run_to_memory(joined, output_mode="append")
    return sink.groupBy("c_user").agg(
        F.count(F.lit(1)).alias("n_attributed_pairs"),
        F.round(F.sum("p_value"), 2).alias("attributed_value"),
    ).withColumnRenamed("c_user", "user_id")


# --------------------------------------------------------------------------
# T8 — foreachBatch sink: per-user totals written epoch-by-epoch to parquet
# --------------------------------------------------------------------------
@register(
    "t8_foreach_batch_sink",
    # Same single-micro-batch watermark argument as t4, over the purchase
    # substream (the watermark tracks max PURCHASE time - 1 hour).
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT date_trunc('hour', ts) AS hour_start, user_id,
           COUNT(*) AS n_purchases, ROUND(SUM(value), 2) AS total_value
    FROM p
    GROUP BY hour_start, user_id
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <=
           (SELECT MAX(ts) - INTERVAL 1 HOUR FROM p)
    """,
)
def t8_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked per-user-per-hour purchase totals, delivered through a
    foreachBatch parquet sink (the production shape for destinations with no
    native streaming writer). Append mode: each finalized window is emitted
    exactly once across the epochs (the final watermark horizon is withheld,
    as append semantics require) — tests/test_streaming.py pins that every
    emitted row equals its batch-aggregate twin."""
    from lime_on_spark_spark.streaming.sources import run_foreach_batch_to_parquet

    stream = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("win"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    out = agg.select(
        F.col("win.start").alias("hour_start"),
        "user_id",
        "n_purchases",
        "total_value",
    )
    return run_foreach_batch_to_parquet(out, output_mode="append")


# --------------------------------------------------------------------------
# T12 — streaming windowed top-k: complete-mode streaming aggregation, then
# the standard downstream batch rank over the sink table (streams cannot
# host a row_number window; the sink-side post-pass is the production shape)
# --------------------------------------------------------------------------
@register(
    "t12_streaming_topk",
    oracle="""
    WITH counts AS (
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               COUNT(*) AS n_events
        FROM events
        GROUP BY hour_start, event_type
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY hour_start
                   ORDER BY n_events DESC, event_type
               ) AS rk
        FROM counts
    )
    SELECT hour_start, event_type, CAST(n_events AS BIGINT) AS n_events,
           CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def t12_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour, computed as a streaming
    aggregation (complete-mode availableNow replay) followed by a batch
    row_number over the materialized sink — ranking is not a supported
    streaming operator, and sink-side post-ranking is the idiomatic
    decomposition. The streaming half equals the batch twin exactly, so
    the whole pipeline is oracle-checkable."""
    from pyspark.sql import Window

    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("hour_start"), "event_type", "n_events"
        )
    )
    sink = run_to_memory(agg, output_mode="complete")
    w = Window.partitionBy("hour_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        sink.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("hour_start", "event_type", "n_events", "rk")
    )


# --------------------------------------------------------------------------
# T13 — stream-static join: enrich the event stream with a broadcastable
# dimension table (customer), then aggregate. THE production enrichment
# shape: the stream side stays unbounded while the static side is re-read
# per micro-batch (picking up dim updates) and broadcast — no stream state
# at all, unlike stream-stream joins, so this scales to any stream rate.
# Full availableNow replay ⇒ the batch join SQL is the exact oracle.
# --------------------------------------------------------------------------
@register(
    "t13_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment                  AS segment,
           COUNT(*)                        AS n_purchases,
           ROUND(SUM(e.value), 2)          AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY segment
    """,
)
def t13_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_table

    purchases = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = purchases.join(F.broadcast(dim), "user_id")
    agg = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return run_to_memory(agg, output_mode="complete")


# --------------------------------------------------------------------------
# T5b — dropDuplicatesWithinWatermark: dedup whose STATE is TTL'd by the
# watermark (plain streaming dropDuplicates keeps every seen key forever —
# unbounded state on an unbounded stream; the WithinWatermark variant is
# the production form when duplicates only arrive within a bounded delay).
# Single-batch availableNow replay dedups exactly like batch DISTINCT on
# the unique event_id, so t5's SQL oracle applies verbatim.
# --------------------------------------------------------------------------
@register(
    "t5_dedup_within_watermark",
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique_events
    FROM events
    GROUP BY event_type
    """,
)
def t5_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sink = run_to_memory(deduped, output_mode="append")
    return sink.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique_events")
    )


# --------------------------------------------------------------------------
# T15 — transformWithStateInPandas (Spark 4 arbitrary-stateful API v2):
# the forward-looking replacement for applyInPandasWithState (t6) with
# composable typed state (ValueState/ListState/MapState) and timers.
# Same per-user running stats as t6 so the SQL oracle carries over; state
# lives in the RocksDB provider (required by this API — also the provider
# you want at 100 TB: state spills to disk instead of executor heap).
# GATED on python protobuf: the TransformWithState runner speaks protobuf
# to the JVM and this sandbox does not ship the package — the query
# registers only where the dependency exists (t6 covers the semantics
# here; tests/test_streaming.py asserts the gate itself).
# --------------------------------------------------------------------------
def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


HAS_TWS_DEPS = _has_protobuf()

_T15_ORACLE = """
    SELECT user_id,
           COUNT(*)              AS n_events,
           ROUND(MAX(value), 2)  AS max_value
    FROM events
    GROUP BY user_id
    """


def _register_t15(fn):
    if HAS_TWS_DEPS:
        return register("t15_transform_with_state", oracle=_T15_ORACLE)(fn)
    return fn


@_register_t15
def t15_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("st", "n BIGINT, vmax DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            if self._st.exists():
                n, vmax = self._st.get()
            else:
                n, vmax = 0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                vmax = max(vmax, float(pdf["value"].max()))
            self._st.update((n, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "max_value": [round(vmax, 2)],
                }
            )

        def close(self) -> None:
            pass

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = read_events_stream(spark, sf_dir).select("user_id", "value")
        stats = events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserStats(),
            outputStructType="user_id bigint, n_events bigint, max_value double",
            outputMode="Update",
            timeMode="None",
        )
        sink = run_to_memory(stats, output_mode="update")
    finally:
        if prev is not None:
            spark.conf.set(provider_key, prev)
        else:
            spark.conf.unset(provider_key)
    # update mode may emit a key once per micro-batch; final state = max-n.
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value")
    )


# --------------------------------------------------------------------------
# T16 — stream-stream LEFT OUTER join: the attribution join that must ALSO
# answer "which clicks never converted". Unlike the inner join (t7), the
# unmatched-left results can only be emitted once the watermark proves no
# future purchase can match — i.e. when the click's 1-hour window falls
# wholly behind the global watermark and its join state is evicted. State
# stays bounded by the watermark horizon on an unbounded feed (the same
# invariant as t7); the outer rows ride the state-cleanup batch. Oracle
# (calibrated empirically at sf0.001, matches Spark's eviction rule): the
# batch time-range left join, with unmatched clicks kept only when
# c_ts + 1h < min(max click ts, max purchase ts) - 2h — clicks nearer the
# end of the replayed stream are correctly withheld, exactly as a live
# query would withhold them until more data arrives.
# --------------------------------------------------------------------------
@register(
    "t16_stream_stream_left_outer",
    oracle="""
    WITH c AS (SELECT user_id, ts AS c_ts, event_id AS click_id
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id, value
               FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT MAX(c_ts) FROM c),
                             (SELECT MAX(p_ts) FROM p))
                       - INTERVAL 2 HOUR AS w),
         matched AS (
             SELECT c.user_id, c.click_id, p.value
             FROM c JOIN p
               ON c.user_id = p.user_id
              AND p.p_ts >= c.c_ts
              AND p.p_ts <= c.c_ts + INTERVAL 1 HOUR
         ),
         expired_unmatched AS (
             SELECT c.user_id, NULL AS value
             FROM c, wm
             WHERE c.click_id NOT IN (SELECT click_id FROM matched)
               AND c.c_ts + INTERVAL 1 HOUR < wm.w
         )
    SELECT user_id,
           COUNT(value)                                   AS n_pairs,
           COUNT(*) FILTER (value IS NULL)                AS n_unconverted,
           ROUND(COALESCE(SUM(value), 0), 2)              AS attributed_value
    FROM (SELECT user_id, value FROM matched
          UNION ALL
          SELECT user_id, value FROM expired_unmatched)
    GROUP BY user_id
    """,
)
def t16_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    sink = run_to_memory(joined, output_mode="append")
    return (
        sink.groupBy("c_user")
        .agg(
            F.count("p_value").alias("n_pairs"),
            F.sum(F.col("purchase_id").isNull().cast("int")).cast("bigint").alias(
                "n_unconverted"
            ),
            F.round(F.coalesce(F.sum("p_value"), F.lit(0.0)), 2).alias(
                "attributed_value"
            ),
        )
        .withColumnRenamed("c_user", "user_id")
    )


# --------------------------------------------------------------------------
# T18 — streaming CDC upsert: a multi-epoch stream MERGEd into a snapshot
# table per micro-batch (foreachBatch + the d21 full-outer/coalesce MERGE
# lowering — the production pattern for maintaining a serving table from a
# change stream when no lakehouse ACID writer is present). The events
# parquet is pre-split into 4 part files and streamed with
# maxFilesPerTrigger=1, so 4 REAL incremental merges run; the per-user
# state (count, max ts, value-at-max-ts) is merge-associative and
# order-invariant, so the final snapshot is deterministic regardless of
# epoch order and equals the batch twin the oracle computes. State is the
# snapshot table itself — bounded by |users|, not stream length.
# --------------------------------------------------------------------------
@register(
    "t18_streaming_upsert",
    oracle="""
    WITH ranked AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ), last AS (
        SELECT user_id, value FROM ranked WHERE rn = 1
    )
    SELECT e.user_id,
           COUNT(*)               AS n_events,
           MAX(e.ts)              AS last_ts,
           ROUND(MAX(l.value), 2) AS last_value
    FROM events e JOIN last l USING (user_id)
    GROUP BY e.user_id
    """,
)
def t18_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import uuid

    from lime_on_spark_spark.sources.catalog import load_table

    base = os.environ.get(
        "LIME_ON_SPARK_SCRATCH",
        os.path.join(os.path.dirname(__file__), "..", "..", ".scratch"),
    )
    unique = f"{spark.sparkContext.applicationId}-{uuid.uuid4().hex[:12]}"
    src_dir = os.path.join(os.path.abspath(base), f"t18_src-{unique}")
    snap_dir = os.path.join(os.path.abspath(base), f"t18_snap-{unique}")

    # Pre-split the change stream into 4 files = 4 micro-batches.
    events = load_table(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def merge_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.max(F.struct("ts", "event_id", "value"))["value"].alias(
                "last_value"
            ),
        )
        if os.path.exists(snap_dir):
            old = s.read.parquet(snap_dir)
            merged = (
                old.select(
                    F.col("user_id"),
                    F.col("n_events").alias("o_n"),
                    F.col("last_ts").alias("o_ts"),
                    F.col("last_value").alias("o_v"),
                )
                .join(delta, "user_id", "full_outer")
                .select(
                    "user_id",
                    (
                        F.coalesce(F.col("o_n"), F.lit(0))
                        + F.coalesce(F.col("n_events"), F.lit(0))
                    ).alias("n_events"),
                    F.greatest(
                        F.coalesce(F.col("o_ts"), F.col("last_ts")),
                        F.coalesce(F.col("last_ts"), F.col("o_ts")),
                    ).alias("last_ts"),
                    F.when(
                        F.col("o_ts").isNull()
                        | (
                            F.col("last_ts").isNotNull()
                            & (F.col("last_ts") >= F.col("o_ts"))
                        ),
                        F.coalesce(F.col("last_value"), F.col("o_v")),
                    )
                    .otherwise(F.col("o_v"))
                    .alias("last_value"),
                )
            )
            tmp = snap_dir + ".tmp"
            merged.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(snap_dir)
            os.rename(tmp, snap_dir)
        else:
            delta.write.mode("overwrite").parquet(snap_dir)

    query = (
        stream.writeStream.foreachBatch(merge_epoch)
        .option(
            "checkpointLocation",
            os.path.join(os.path.abspath(base), f"t18_ckpt-{unique}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    # The snapshot was written by this query from the repaired batch scan,
    # so its timestamps are already plain TIMESTAMP — no re-repair needed.
    snap = spark.read.parquet(snap_dir)
    return snap.select(
        "user_id",
        "n_events",
        "last_ts",
        F.round("last_value", 2).alias("last_value"),
    )


# --------------------------------------------------------------------------
# T19 — checkpoint recovery / exactly-once across RESTARTS. The production
# property t8/t18 don't exercise: a streaming job stops, MORE data arrives,
# and a new run with the SAME checkpoint must process only the unseen
# files — every record lands in the sink exactly once across both runs.
# Run 1 streams the even-id half; run 2 starts after the odd-id half is
# appended to the source directory and must skip everything run 1
# committed. The oracle is the plain batch aggregate over ALL events: any
# duplicate (re-processing) or gap (lost offsets) breaks the value hash.
# --------------------------------------------------------------------------
@register(
    "t19_checkpoint_recovery",
    oracle="""
    SELECT event_type,
           COUNT(*)            AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def t19_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from lime_on_spark_spark.sources.catalog import load_table

    base = os.environ.get(
        "LIME_ON_SPARK_SCRATCH",
        os.path.join(os.path.dirname(__file__), "..", "..", ".scratch"),
    )
    unique = f"{spark.sparkContext.applicationId}-{uuid.uuid4().hex[:12]}"
    src = os.path.join(os.path.abspath(base), f"t19_src-{unique}")
    out = os.path.join(os.path.abspath(base), f"t19_out-{unique}")
    ck = os.path.join(os.path.abspath(base), f"t19_ckpt-{unique}")

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    def run_stream() -> None:
        schema = spark.read.parquet(src).schema
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Run 1: only the even-id half exists.
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    run_stream()
    # More data arrives while the job is down; run 2 restarts from the
    # checkpoint and must process ONLY the new files.
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    run_stream()

    sink = spark.read.parquet(out)
    return sink.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# T21 — streaming observed metrics: the o5 pattern on an unbounded query.
# Every production stream carries inline data-quality counters
# (rows/violations/sums per micro-batch via .observe); monitoring reads
# them from StreamingQueryProgress.observedMetrics instead of running a
# second pass over the stream. The source is pre-split into 4 files and
# read with maxFilesPerTrigger=1, so 4 REAL micro-batches each report
# their own metrics; the query sums them — counters and sums are
# merge-associative across epochs, which is precisely why they're the
# metrics a stream can carry. Oracle = the same aggregates over the whole
# events table in batch SQL (full availableNow replay ⇒ totals match).
# --------------------------------------------------------------------------
@register(
    "t21_streaming_observe",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS n_errors
    FROM events
    """,
)
def t21_streaming_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import uuid

    from lime_on_spark_spark.sources.catalog import load_table

    base = os.environ.get(
        "LIME_ON_SPARK_SCRATCH",
        os.path.join(os.path.dirname(__file__), "..", "..", ".scratch"),
    )
    unique = f"{spark.sparkContext.applicationId}-{uuid.uuid4().hex[:12]}"
    src = os.path.join(os.path.abspath(base), f"t21_src-{unique}")

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    events.repartition(4).write.mode("overwrite").parquet(src)
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .observe(
                "qa",
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((F.col("value") < 0).cast("long")).alias("n_negative"),
                F.sum("value").alias("sum_value"),
                F.sum((F.col("event_type") == "error").cast("long")).alias(
                    "n_errors"
                ),
            )
        )
        q = (
            stream.writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batches = [
            p["observedMetrics"]["qa"]
            for p in q.recentProgress
            if p.get("observedMetrics", {}).get("qa") is not None
        ]
        q.stop()
        assert len(batches) >= 2, "expected multiple micro-batches"
        row = (
            sum(int(m["n_rows"]) for m in batches),
            sum(int(m["n_negative"]) for m in batches),
            round(sum(float(m["sum_value"]) for m in batches), 2),
            sum(int(m["n_errors"]) for m in batches),
        )
        return spark.createDataFrame(
            [row],
            "n_rows bigint, n_negative bigint, sum_value double, n_errors bigint",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


# --------------------------------------------------------------------------
# T22 — approximate distinct users per hour ON THE STREAM: exact
# count-distinct is unbounded state on an unbounded stream (every seen key
# per window, forever); approx_count_distinct keeps ONE mergeable HLL
# sketch per window — the only viable per-window cardinality at production
# stream rates. Full availableNow replay; the emitted verdict joins the
# batch-exact count per window and bounds the sketch error at 3x its rsd
# (the a3 discipline, streaming edition). Oracle = exact per-hour distinct
# counts + TRUE.
# --------------------------------------------------------------------------
@register(
    "t22_streaming_approx_distinct",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS approx_within_3rsd
    FROM events
    GROUP BY hour_start
    """,
)
def t22_streaming_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_table

    rsd = 0.05
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("n_approx"))
        .select(F.col("window.start").alias("hour_start"), "n_approx")
    )
    sink = run_to_memory(agg, output_mode="complete")
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return sink.join(exact, "hour_start").select(
        "hour_start",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= F.greatest(F.lit(5.0), F.lit(3 * rsd) * F.col("n_exact"))
        ).alias("approx_within_3rsd"),
    )


# --------------------------------------------------------------------------
# S13 — State Data Source reader (Spark 4 `format("statestore")`): OFFLINE
# introspection of a streaming query's internal state store — the ops
# surface for debugging a stuck stateful pipeline (inspect keys, spot
# state skew via partition_id, audit what a checkpoint actually holds)
# without touching the running query. A checkpointed availableNow
# aggregation drains the events table, then the checkpoint is re-opened as
# a BATCH DataFrame: after a full drain the aggregation state IS the batch
# group-by, so the DuckDB twin checks the state-store contents end-to-end
# (keys, counts, sums — value-hash exact). The value struct exposes the
# aggregation BUFFER field names (count/sum), not the query aliases —
# pinned here deliberately so an upstream layout change breaks loudly.
# Scale: state introspection reads only the state files (O(distinct keys)),
# never the source data.
# --------------------------------------------------------------------------
@register(
    "s13_state_store_reader",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def s13_state_store_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from lime_on_spark_spark.plans.sources_sinks import _scratch

    events = read_events_stream(spark, sf_dir)
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    ckpt = _scratch(spark, "s13_ckpt")
    name = f"s13_sink_{_uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        query.stop()
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").cast("bigint").alias("n_events"),
        F.round(F.col("value.sum"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# S15 — Python STREAMING sink (Spark 4 `DataSource.streamWriter`): the last
# quadrant of the custom connector matrix (s6 batch read, s11 stream read,
# s12 batch write, s14 pushdown). The synthetic stream's 600 rows drain
# through the Python sink in micro-batches; each batch's executor spools
# are published by a per-batch driver commit into _STREAM_MANIFEST.json
# (replayed batch ids are skipped — the idempotent-commit discipline that
# makes checkpoint recovery exactly-once). The query then reads back ONLY
# manifest-listed files and aggregates the read-back copy against the
# closed-form oracle: a hash match proves no batch was lost, duplicated,
# or partially published across the Python write path.
# --------------------------------------------------------------------------
@register(
    "s15_python_stream_sink",
    oracle="""
    SELECT CAST(i % 8 AS INT)                          AS bucket,
           COUNT(*)                                    AS n,
           ROUND(SUM((i * i % 97) / 10.0), 4)          AS sum_v,
           CAST(MIN(i) AS BIGINT)                      AS min_i,
           CAST(MAX(i) AS BIGINT)                      AS max_i
    FROM (SELECT unnest(range(600)) AS i)
    GROUP BY bucket
    """,
)
def s15_python_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os as _os
    import time as _time

    from lime_on_spark_spark.plans.sources_sinks import _scratch
    from lime_on_spark_spark.sources.python_source import (
        JsonManifestSink,
        SyntheticStreamSource,
    )

    for src_cls in (SyntheticStreamSource, JsonManifestSink):
        try:
            spark.dataSource.register(src_cls)
        except Exception:
            pass  # already registered in this session
    n_total = 600
    stream = (
        spark.readStream.format("synthetic_stream")
        .option("n", n_total)
        .option("rows_per_batch", 250)
        .option("partitions", 4)
        .load()
    )
    path = _scratch(spark, "s15_sink")
    ckpt = _scratch(spark, "s15_ckpt")
    query = (
        stream.writeStream.format("json_manifest_sink")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    manifest_path = _os.path.join(path, "_STREAM_MANIFEST.json")

    def _committed() -> int:
        if not _os.path.exists(manifest_path):
            return 0
        with open(manifest_path, encoding="utf-8") as fh:
            return _json.load(fh)["total_rows"]

    try:
        deadline = _time.time() + 120
        total = 0
        while _time.time() < deadline:
            # Manifest FIRST: the final batch may commit in the same poll
            # interval the query terminates, and complete sink output is
            # success regardless of how the query ended.
            total = _committed()
            if total == n_total:
                break
            # Then surface a sink/source failure immediately: a dead query
            # will never commit more batches, so spinning out the full
            # deadline would bury the real error under a TimeoutError. The
            # manifest is re-read first — the commit may have landed
            # between the read above and the liveness check.
            if query.exception() is not None or not query.isActive:
                total = _committed()
                if total == n_total:
                    break
                exc = query.exception()
                if exc is not None:
                    raise exc
                raise RuntimeError(
                    f"s15: query terminated without exception after "
                    f"committing {total}/{n_total} rows"
                )
            _time.sleep(0.5)
        else:
            raise TimeoutError(f"s15: sink committed {total}/{n_total} rows")
    finally:
        query.stop()
    with open(manifest_path, encoding="utf-8") as fh:
        manifest = _json.load(fh)
    files = [
        _os.path.join(path, f["name"])
        for b in manifest["batches"]
        for f in b["files"]
    ]
    back = spark.read.schema("i long, v double, bucket int").json(files)
    return back.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 4).alias("sum_v"),
        F.min("i").cast("bigint").alias("min_i"),
        F.max("i").cast("bigint").alias("max_i"),
    )


# --------------------------------------------------------------------------
# T23 — RocksDB state store (always-on provider row): t15 needs RocksDB
# but is protobuf-gated out of this sandbox, so until now no REGISTERED
# row proved the provider the 100 TB deployment actually runs — HDFS-
# backed state lives on executor heap and dies when keyed state outgrows
# it; RocksDB spills to local disk with changelog (incremental)
# checkpointing. Same tumbling-window agg as t1's streaming twin under
# the RocksDB provider + changelog checkpointing, so the batch SQL
# oracle carries over; self-certifying (the o9/s14 discipline):
# rocksdb_engaged is read from the terminated query's state-operator
# customMetrics, so the oracle FAILS if a conf regression silently falls
# back to the default provider.
# --------------------------------------------------------------------------
@register(
    "t23_rocksdb_state_agg",
    oracle="""
    SELECT date_trunc('hour', ts)  AS hour_start,
           event_type,
           COUNT(*)                AS n_events,
           ROUND(SUM(value), 2)    AS total_value,
           TRUE                    AS rocksdb_engaged
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def t23_rocksdb_state_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid
    from contextlib import ExitStack

    from lime_on_spark_spark.session import temp_conf

    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    with ExitStack() as stack:
        for k, v in (
            ("spark.sql.streaming.stateStore.providerClass", provider),
            (
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                "true",
            ),
        ):
            stack.enter_context(temp_conf(spark, k, v))
        events = read_events_stream(spark, sf_dir)
        agg = (
            events.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                F.col("window.start").alias("hour_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )
        name = f"t23_rocks_{uuid.uuid4().hex[:8]}"
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination()
            # Scan ALL progress entries, not just lastProgress: under
            # trigger(availableNow) the final entry can be a no-data batch
            # with an empty stateOperators list even though RocksDB was
            # engaged in earlier batches — engagement anywhere counts.
            progresses = list(query.recentProgress or [])
        finally:
            query.stop()
    engaged = any(
        any(k.startswith("rocksdb") for k in (op or {}).get("customMetrics", {}))
        for p in progresses
        for op in (p or {}).get("stateOperators") or []
    )
    return spark.table(name).withColumn("rocksdb_engaged", F.lit(engaged))


# --------------------------------------------------------------------------
# T24 — streaming state TTL: per-key state EXPIRY via event-time timeouts
# (applyInPandasWithState + EventTimeTimeout) under the t23 RocksDB
# provider — the discipline that prevents the #1 streaming production
# incident (unbounded keyed state). Sessionization with a 12 h inactivity
# gap: a key's state carries (n, start_us, last_us); a new event more
# than the gap after last_us closes the session in-function; a key
# SILENT past the gap is closed by the TIMEOUT path (state.remove() — the
# TTL) when the watermark passes last_us + gap, including the final
# no-data batch. The events parquet is pre-split into 4 day-block files
# streamed oldest-first (maxFilesPerTrigger=1, mtime-stamped), so 4 REAL
# incremental batches advance the watermark between arrivals; the output
# is batching-invariant (the full-replay twin contract).
# Self-certifying on three axes: (a) closed-session counts/sizes are the
# SQL gap-sessionization the oracle replays exactly (µs integer
# arithmetic; timeout fires iff last_ms + gap_ms < final watermark_ms,
# strictly — Spark's eviction comparison); (b) open_in_state comes from
# the s13 STATE-STORE READBACK of the checkpoint, so the oracle match
# proves expired keys are ABSENT from the store, not merely silent;
# (c) rocksdb_engaged + multi_batch pinned TRUE. State is bounded by
# (keys active within the gap horizon) — the invariant that matters on
# an unbounded stream.
# --------------------------------------------------------------------------
@register(
    "t24_state_ttl",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    wm AS (SELECT MAX(us) // 1000 - 3600000 AS wm_ms FROM e),
    seq AS (
        SELECT user_id, us,
               CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                         > 43200000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
    ), sess AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    ), agg AS (
        SELECT user_id, sid, COUNT(*) AS n_events, MAX(us) AS last_us
        FROM sess GROUP BY user_id, sid
    ), marked AS (
        SELECT user_id, sid, n_events,
               (sid < MAX(sid) OVER (PARTITION BY user_id))
               OR (last_us // 1000 + 43200000 < (SELECT wm_ms FROM wm))
                   AS closed
        FROM agg
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN closed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_closed_sessions,
           CAST(COALESCE(SUM(CASE WHEN closed THEN n_events END), 0)
                AS BIGINT) AS closed_events,
           BOOL_OR(NOT closed) AS open_in_state,
           TRUE AS multi_batch,
           TRUE AS rocksdb_engaged
    FROM marked GROUP BY user_id
    """,
)
def t24_state_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid
    from contextlib import ExitStack

    from pyspark.sql.streaming.state import GroupStateTimeout

    from lime_on_spark_spark.plans.sources_sinks import _scratch
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.catalog import load_table

    G_US = 12 * 3600 * 1_000_000
    G_MS = G_US // 1000

    # Pre-split into 4 day-block files with stamped mtimes: the file
    # source streams oldest-first, so blocks arrive in event-time order
    # and no row is ever below the watermark (late-data semantics stay
    # out of scope of this row — t4 owns them).
    src = _scratch(spark, "t24_src")
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    os.makedirs(src, exist_ok=True)
    for k in range(4):
        block = events.filter(
            ((F.dayofmonth("ts") - 1) / 8).cast("int") == k
        )
        block.coalesce(1).write.mode("append").parquet(src)
        for n in sorted(os.listdir(src)):
            fp = os.path.join(src, n)
            if n.endswith(".parquet") and os.path.getmtime(fp) > 1e9:
                os.utime(fp, (1_000_000 + k, 1_000_000 + k))

    def update(key, pdf_iter, state):
        if state.hasTimedOut:
            # TTL: the watermark passed last_us + gap while the key was
            # silent — emit the frozen session and DROP the state.
            n, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n]}
            )
            return
        rows = pd.concat(list(pdf_iter))
        # Explicit ns normalization before the integer cast: the µs gap
        # arithmetic below must not depend on the pandas/Arrow unit.
        us = (
            rows["ts"].astype("datetime64[ns]").astype("int64").sort_values()
            // 1000
        )
        # State is exactly what the TTL discipline needs and nothing more
        # (count + last event time) — on an unbounded stream every extra
        # state byte is multiplied by the live key count.
        if state.exists:
            n, last_us = state.get
        else:
            n, last_us = 0, None
        out = []
        for t in us:
            t = int(t)
            if last_us is not None and t - last_us > G_US:
                out.append((key[0], n))  # gap-closed session
                n = 0
            n += 1
            last_us = t
        state.update((n, last_us))
        # Event-time TTL: fires when the watermark (ms) passes this,
        # strictly — mirrored in the oracle's `< wm_ms` comparison.
        state.setTimeoutTimestamp(last_us // 1000 + G_MS)
        if out:
            yield pd.DataFrame(
                [{"user_id": u, "n_events": c} for u, c in out]
            )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    closed_stream = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint",
            stateStructType="n bigint, last_us bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    ckpt = _scratch(spark, "t24_ckpt")
    name = f"t24_sink_{uuid.uuid4().hex[:8]}"
    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    with ExitStack() as stack:
        for k, v in (
            ("spark.sql.streaming.stateStore.providerClass", provider),
            (
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                "true",
            ),
        ):
            stack.enter_context(temp_conf(spark, k, v))
        query = (
            closed_stream.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination()
            progresses = list(query.recentProgress or [])
        finally:
            query.stop()
        # The s13 readback: whatever survived TTL is IN the store, every
        # expired key is absent — joined below so the oracle pins it.
        open_users = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(F.col("key.user_id").alias("user_id"))
            .withColumn("open_in_state", F.lit(True))
        )
        open_rows = open_users.collect()
    multi_batch = (
        sum(1 for p in progresses if (p or {}).get("numInputRows", 0) > 0)
        >= 4
    )
    rocks = any(
        any(kk.startswith("rocksdb") for kk in (op or {}).get("customMetrics", {}))
        for p in progresses
        for op in (p or {}).get("stateOperators") or []
    )
    closed = spark.table(name)
    open_df = spark.createDataFrame(
        open_rows, "user_id bigint, open_in_state boolean"
    )
    users = events.select("user_id").distinct()
    return (
        users.join(
            closed.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_closed_sessions"),
                F.sum("n_events").alias("closed_events"),
            ),
            "user_id",
            "left",
        )
        .join(open_df, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("n_closed_sessions", F.lit(0))
            .cast("bigint")
            .alias("n_closed_sessions"),
            F.coalesce("closed_events", F.lit(0))
            .cast("bigint")
            .alias("closed_events"),
            F.coalesce("open_in_state", F.lit(False)).alias("open_in_state"),
            F.lit(bool(multi_batch)).alias("multi_batch"),
            F.lit(bool(rocks)).alias("rocksdb_engaged"),
        )
    )


# --------------------------------------------------------------------------
# T25 — late-data DROP OBSERVABILITY: t4 pins the append-mode semantics of
# lateness; this row pins the ops surface — a production stream's "are we
# silently losing data" counter. The events table is split into three
# time-ordered blocks (days 1-10 even-id / 11-20 / 21-31) plus a PLANTED
# LATE block (days 1-10, odd ids) streamed LAST, after the watermark has
# advanced to day 31: every late row is dropped by the aggregation's
# watermark filter, and the row pins BOTH sides of that event — the
# result equals the batch aggregate over the on-time rows only (windows
# finalized by the final watermark, the t4 twin), AND the drop counter
# is read back EXACTLY from the state operator's
# numRowsDroppedByWatermark across all progress entries. The counter
# meters the STATE OPERATOR'S input — rows arriving after the map-side
# partial aggregation — so the closed-form expectation is the number of
# DISTINCT LATE WINDOWS (10 days x 24 h), not raw late events (verified:
# batch 3 ingests 1653 late events, partial-aggregates them to 240
# hourly groups, and the counter reads exactly 240). A regression that
# stops dropping (wrong results) or stops counting (blind ops) fails
# the artifact.
# --------------------------------------------------------------------------
@register(
    "t25_late_drop_metrics",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           (SELECT CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
            FROM events
            WHERE date_part('day', ts) <= 10 AND event_id % 2 = 1)
               AS dropped_windows,
           TRUE AS drop_metric_matches
    FROM events
    WHERE NOT (date_part('day', ts) <= 10 AND event_id % 2 = 1)
    GROUP BY hour_start
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <=
           (SELECT MAX(ts) - INTERVAL 1 HOUR FROM events)
    """,
)
def t25_late_drop_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from lime_on_spark_spark.plans.sources_sinks import _scratch
    from lime_on_spark_spark.sources.catalog import load_table

    src = _scratch(spark, "t25_src")
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    early = F.dayofmonth("ts") <= 10
    blocks = (
        events.filter(early & (F.col("event_id") % 2 == 0)),   # on-time
        events.filter(
            (F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)
        ),
        events.filter(F.dayofmonth("ts") > 20),
        events.filter(early & (F.col("event_id") % 2 == 1)),   # LATE
    )
    os.makedirs(src, exist_ok=True)
    n_late_windows = (
        blocks[3].select(F.date_trunc("hour", "ts")).distinct().count()
    )
    for k, block in enumerate(blocks):
        block.coalesce(1).write.mode("append").parquet(src)
        for n in sorted(os.listdir(src)):
            fp = os.path.join(src, n)
            if n.endswith(".parquet") and os.path.getmtime(fp) > 1e9:
                os.utime(fp, (1_000_000 + k, 1_000_000 + k))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("hour_start"), "n_events")
    )
    name = f"t25_sink_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
        progresses = list(query.recentProgress or [])
    finally:
        query.stop()
    dropped = sum(
        int((op or {}).get("numRowsDroppedByWatermark", 0))
        for p in progresses
        for op in (p or {}).get("stateOperators") or []
    )
    return spark.table(name).select(
        "hour_start",
        "n_events",
        F.lit(dropped).cast("bigint").alias("dropped_windows"),
        F.lit(dropped == n_late_windows).alias("drop_metric_matches"),
    )


# --------------------------------------------------------------------------
# T26 — EXACTLY-ONCE foreachBatch sink via idempotent manifest
# transactions: the production pattern for transactional streaming
# writes (Delta's `txn` appId/version). Structured Streaming's
# foreachBatch is at-least-once — after a failure between the sink
# commit and the checkpoint commit, the SAME (batch_id, data) is
# replayed — so a non-idempotent sink double-writes. Here every batch
# commits into the manifest connector with (txn_app, txn_version =
# batch_id), and the row SIMULATES the retry storm: each foreachBatch
# invocation deliberately writes its batch TWICE, and after the stream
# drains, the final batch is replayed once more cold (the
# restart-after-crash shape). Pinned: the manifest holds EXACTLY one
# copy of the source (per-bucket counts and min/max hash-pinned against
# the events table), the recorded txn high-water equals the last batch
# id, and all three batches actually ran (maxFilesPerTrigger=1 over 3
# stamped files).
# Scale: idempotency is one version comparison at commit — O(1)
# metadata per batch; no dedup scan of the sink, which at 100 TB is the
# difference between exactly-once and un-reprocessable.
# --------------------------------------------------------------------------
@register(
    "t26_exactly_once_sink",
    oracle="""
    SELECT CAST(user_id % 4 AS BIGINT)          AS bucket,
           CAST(COUNT(*) AS BIGINT)             AS n,
           CAST(MIN(epoch_us(ts)) AS BIGINT)    AS min_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT)    AS max_us,
           ROUND(SUM(value), 4)                 AS sum_value,
           TRUE                                 AS exactly_once,
           CAST(2 AS BIGINT)                    AS txn_high_water,
           TRUE                                 AS three_batches
    FROM events GROUP BY bucket
    """,
)
def t26_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from lime_on_spark_spark.plans.sources_sinks import (
        _register_manifest_classes,
        _scratch,
    )
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.catalog import load_table
    from lime_on_spark_spark.sources.python_source import _load_manifest

    _register_manifest_classes(spark)
    src = _scratch(spark, "t26_src")
    sink = _scratch(spark, "t26_sink")
    ckpt = _scratch(spark, "t26_ckpt")
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        # Exact µs as a JSON-safe integer (a double would round the
        # sub-second part; a timestamp doesn't survive the JSON spool).
        F.unix_micros("ts").alias("us"),
        "value",
    )
    n_events = events.count()
    # 3 stamped day-block files -> 3 deterministic batches under
    # maxFilesPerTrigger=1 (the t24 discipline).
    os.makedirs(src, exist_ok=True)
    for k in range(3):
        block = events.filter(
            (
                (F.dayofmonth(F.timestamp_micros("us")) - 1) / 11
            ).cast("int")
            == k
        )
        block.coalesce(1).write.mode("append").parquet(src)
        for n in sorted(os.listdir(src)):
            fp = os.path.join(src, n)
            if n.endswith(".parquet") and os.path.getmtime(fp) > 1e9:
                os.utime(fp, (1_000_000 + k, 1_000_000 + k))

    app = f"t26-{uuid.uuid4().hex[:8]}"

    def commit_batch(batch_df, batch_id: int) -> None:
        (
            batch_df.write.format("json_manifest_sink")
            .option("path", sink)
            .option("txn_app", app)
            .option("txn_version", str(batch_id))
            .mode("append")
            .save()
        )

    def write_twice(batch_df, batch_id: int) -> None:
        # The at-least-once storm, in-line: a sink failure after commit
        # replays the identical (data, batch_id) — the second write MUST
        # be a no-op or the table double-counts.
        commit_batch(batch_df, batch_id)
        commit_batch(batch_df, batch_id)

    schema = spark.read.parquet(src).schema
    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(write_twice)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
        progresses = list(query.recentProgress or [])
    finally:
        query.stop()
    three_batches = (
        sum(1 for p in progresses if (p or {}).get("numInputRows", 0) > 0)
        == 3
    )
    # Cold replay after restart: the final committed batch arrives AGAIN
    # (checkpoint rolled back past the sink commit) — still a no-op.
    last_block = spark.read.parquet(src)
    commit_batch(last_block.limit(50), 2)
    manifest = _load_manifest(sink)
    txn_high = manifest["txns"][app]
    exactly_once = manifest["total_rows"] == n_events
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        rows = (
            spark.read.format("json_manifest_source")
            .option("path", sink)
            .load()
            .groupBy((F.col("user_id") % 4).cast("bigint").alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.min("us").cast("bigint").alias("min_us"),
                F.max("us").cast("bigint").alias("max_us"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .collect()
        )
    return spark.createDataFrame(
        [
            (
                r["bucket"], r["n"], r["min_us"], r["max_us"],
                r["sum_value"], bool(exactly_once), int(txn_high),
                bool(three_batches),
            )
            for r in rows
        ],
        "bucket bigint, n bigint, min_us bigint, max_us bigint,"
        " sum_value double, exactly_once boolean, txn_high_water bigint,"
        " three_batches boolean",
    )


# --------------------------------------------------------------------------
# T27 — STREAMING incremental view maintenance from the change data
# feed: the full production CDC loop, composing four primitives this
# engine ships — the CDF streaming source (offsets = manifest versions,
# batches = row-level changes incl. delete pre-images), foreachBatch,
# idempotent manifest transactions (t26), and delta-log IVM (d97).
# Run 1 bootstraps the seeded table (one batch of 6000 inserts) into
# per-bucket (Δn, Δsum) delta rows appended to a VIEW delta-log with
# (txn_app, txn_version = batch_id) — and every append runs TWICE, the
# at-least-once replay storm the txn makes a no-op. While the stream is
# DOWN, the source takes a DELETE (s19) and a MERGE (s22); the restart
# consumes EXACTLY those changes (pinned: run 2 = 4000 change rows —
# 2000 pre-image deletes + 2000 inserts) from the checkpointed version
# offset. The queryable view — a groupBy over the delta log — is pinned
# cell-for-cell against a full recompute of the latest snapshot AND the
# closed-form oracle. A double-applied replay, a missed DV, a re-read
# commit, or a lost pre-image all break the hash.
# Scale: each refresh reads O(|change|) rows; view state is
# O(#buckets); replay safety is one version comparison per commit.
# --------------------------------------------------------------------------
@register(
    "t27_streaming_ivm",
    oracle="""
    WITH live AS (
        SELECT i, (i * i % 97) / 10.0 AS v
        FROM (SELECT unnest(range(1000)) AS i)
        UNION ALL
        SELECT i, (i * i % 97) / 10.0
        FROM (SELECT unnest(range(2000, 5000)) AS i)
        UNION ALL
        SELECT i, (i * i % 89) / 10.0
        FROM (SELECT unnest(range(5000, 7000)) AS i)
    )
    SELECT CAST(i % 8 AS INT)        AS bucket,
           CAST(COUNT(*) AS BIGINT)  AS n,
           ROUND(SUM(v), 4)          AS sum_v,
           TRUE                      AS matches_full,
           TRUE                      AS restart_incremental
    FROM live GROUP BY bucket
    """,
)
def t27_streaming_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from lime_on_spark_spark.plans.sources_sinks import (
        _register_manifest_classes,
        _scratch,
        _synthetic_series,
    )
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        ManifestCDFStreamSource,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    try:
        spark.dataSource.register(ManifestCDFStreamSource)
    except Exception:
        pass  # already registered in this session
    src = _scratch(spark, "t27_src")
    log = _scratch(spark, "t27_log")
    ck = _scratch(spark, "t27_ckpt")
    app = f"t27-{uuid.uuid4().hex[:8]}"

    (
        _synthetic_series(spark, 0, 6000, 3)
        .write.format("json_manifest_sink")
        .option("path", src)
        .mode("append")
        .save()
    )

    # foreachBatch runs on the driver: the log records what each batch
    # actually contained, which is the honest restart pin (numInputRows
    # over-counts here — every ACTION in foreachBatch re-reads a Python
    # streaming source's partitions, so two commits triple the metric).
    batch_log: list = []

    def apply_deltas(batch_df, batch_id: int) -> None:
        # One evaluation of the source scan per batch, not one per action.
        batch_df = batch_df.localCheckpoint(eager=True)
        batch_log.append(
            (
                batch_id,
                {
                    r["_change_type"]: r["n"]
                    for r in batch_df.groupBy("_change_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                },
            )
        )
        deltas = batch_df.groupBy(
            (F.col("i") % 8).cast("bigint").alias("bucket")
        ).agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).cast("bigint").alias("dn"),
            F.sum(
                F.when(
                    F.col("_change_type") == "insert", F.col("v")
                ).otherwise(-F.col("v"))
            ).alias("ds"),
        )

        def commit() -> None:
            (
                deltas.write.format("json_manifest_sink")
                .option("path", log)
                .option("txn_app", app)
                .option("txn_version", str(batch_id))
                .mode("append")
                .save()
            )

        commit()
        commit()  # the at-least-once replay storm: MUST be a no-op

    def run_stream() -> None:
        q = (
            spark.readStream.format("json_manifest_cdf_stream_source")
            .option("path", src)
            .load()
            .writeStream.foreachBatch(apply_deltas)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            # A foreachBatch failure must not leak a running query into
            # the shared session (the t26 discipline).
            q.stop()

    run_stream()  # bootstrap: the whole seeded table as inserts
    n_boot_batches = len(batch_log)
    # The stream is DOWN while the source takes row-level DML.
    delete_where_manifest_path(
        spark, src, [("i", "ge", 1000), ("i", "lt", 2000)]
    )
    updates = spark.range(5000, 7000, 1, 2).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.col("id") % 89) / 10.0).alias("v"),
    )
    merge_into_manifest_path(spark, src, updates, "i")
    run_stream()  # restart: exactly the v1 -> v3 changes
    run2 = batch_log[n_boot_batches:]
    run2_counts: dict = {}
    for _, counts in run2:
        for k, n in counts.items():
            run2_counts[k] = run2_counts.get(k, 0) + n
    restart_incremental = run2_counts == {"delete": 2000, "insert": 2000}

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        view = (
            spark.read.format("json_manifest_source")
            .option("path", log)
            .load()
            .groupBy("bucket")
            .agg(
                F.sum("dn").cast("bigint").alias("n"),
                F.sum("ds").alias("s"),
            )
            .filter(F.col("n") > 0)
        )
        full = (
            spark.read.format("json_manifest_source")
            .option("path", src)
            .load()
            .groupBy((F.col("i") % 8).cast("bigint").alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_full"),
                F.sum("v").alias("s_full"),
            )
        )
        rows = (
            view.join(full, "bucket", "full_outer")
            .select(
                F.col("bucket").cast("int").alias("bucket"),
                F.col("n").cast("bigint").alias("n"),
                F.round("s", 4).alias("sum_v"),
                (
                    (F.col("n") == F.col("n_full"))
                    & (F.abs(F.col("s") - F.col("s_full")) < 1e-6)
                ).alias("matches_full"),
            )
            .collect()
        )
    return spark.createDataFrame(
        [
            (r["bucket"], r["n"], r["sum_v"], r["matches_full"],
             bool(restart_incremental))
            for r in rows
        ],
        "bucket int, n bigint, sum_v double, matches_full boolean,"
        " restart_incremental boolean",
    )


# --------------------------------------------------------------------------
# T28 — stream-stream LEFT SEMI join, completing the streaming join
# matrix (t7 inner, t16 left outer): "purchases preceded by a click
# within the hour" WITHOUT materializing the pair fan-out — the
# existence-check shape (fraud screens, attribution gates) where an
# inner join would duplicate a purchase once per qualifying click.
# Both sides carry watermarks and the condition bounds event time on
# both sides, so join state is evicted at the horizon (bounded by the
# watermark window, not stream length). A semi match emits its LEFT row
# exactly once in the micro-batch the first match arrives, so a full
# availableNow replay equals the batch EXISTS twin row-for-row — the
# oracle replays exactly that. (Left ANTI with a streaming right side
# is unsupported by Spark; t4/t25 own not-matched observability.)
# --------------------------------------------------------------------------
@register(
    "t28_stream_stream_semi",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.user_id                    AS user_id,
           CAST(COUNT(*) AS BIGINT)     AS n_gated_purchases,
           ROUND(SUM(p.value), 2)       AS gated_value,
           CAST(MIN(p.event_id) AS BIGINT) AS first_purchase_id
    FROM p
    WHERE EXISTS (
        SELECT 1 FROM c
        WHERE c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR
          AND c.ts <= p.ts
    )
    GROUP BY p.user_id
    """,
)
def t28_stream_stream_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    gated = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_semi",
    )
    sink = run_to_memory(gated, output_mode="append")
    return (
        sink.groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gated_purchases"),
            F.round(F.sum("p_value"), 2).alias("gated_value"),
            F.min("purchase_id").cast("bigint").alias("first_purchase_id"),
        )
    )


# --------------------------------------------------------------------------
# T29 — CHAINED STATEFUL OPERATORS in one streaming query (Spark 3.4+/4
# multi-stateful pipelines): a watermarked stream-stream attribution
# join feeds a tumbling-window aggregation WITHOUT an intermediate sink
# — historically impossible (one stateful op per query) and still the
# trickiest watermark-propagation surface in Structured Streaming: the
# second operator's event-time column (p_ts) flows THROUGH the join,
# and late-arriving joined rows must stay above the propagated
# watermark or windows would drop pairs. Append mode: a window emits
# exactly once when the final watermark passes its end — the oracle
# replays the batch join + hourly rollup and withholds the final
# horizon exactly (the t4/t8 discipline).
# Scale: two bounded state stores in one query (join horizon + open
# windows), one less materialization hop than the sink-and-rescan
# workaround — at 100 TB the intermediate sink IS the cost.
# --------------------------------------------------------------------------
@register(
    "t29_chained_stateful",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         j AS (
             SELECT p.ts, p.value FROM p JOIN c
               ON p.user_id = c.user_id
              AND c.ts >= p.ts - INTERVAL 1 HOUR
              AND c.ts <= p.ts
         ),
         -- Propagated watermark: the GLOBAL watermark is the min over the
         -- two watermarked substreams (least(max p_ts, max c_ts) - 2h, the
         -- t16 model — unfiltered MAX(ts) would overestimate it whenever a
         -- trailing event is not both the latest purchase and the latest
         -- click), MINUS the join's output lateness: the condition admits
         -- c_ts <= p_ts with p_ts - c_ts <= 1h, so a joined row's event
         -- time (p_ts) can trail the click watermark by up to 1 HOUR —
         -- Spark propagates wm - 1h to the downstream window operator and
         -- the final horizon withholds one extra hour vs a single-operator
         -- query.
         wm AS (SELECT least(
                    (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
                    (SELECT MAX(ts) FROM events WHERE event_type = 'click')
                ) - INTERVAL 3 HOUR AS w)
    SELECT date_trunc('hour', ts)        AS hour_start,
           CAST(COUNT(*) AS BIGINT)      AS n_pairs,
           ROUND(SUM(value), 2)          AS pair_value
    FROM j
    GROUP BY hour_start
    HAVING hour_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
    """,
)
def t29_chained_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    agg = joined.groupBy(F.window("p_ts", "1 hour").alias("win")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.sum("p_value"), 2).alias("pair_value"),
    )
    out = agg.select(
        F.col("win.start").alias("hour_start"), "n_pairs", "pair_value"
    )
    return run_to_memory(out, output_mode="append")


# --------------------------------------------------------------------------
# T30 — stream-stream FULL OUTER join, completing the streaming join
# matrix (t7 inner, t16 left outer, t28 left semi): the attribution
# audit shape — every click AND every purchase accounted for exactly
# once, matched pairs carrying value, unmatched rows surfacing as
# unconverted clicks / unattributed purchases. Both sides are
# watermarked and the condition bounds event time on both sides, so
# join state is evicted at the horizon. Emission model (the t16
# discipline, extended to the right side): matched pairs emit on
# arrival; an unmatched CLICK emits once the watermark passes the end
# of its match window (c_ts + 1h < wm); an unmatched PURCHASE emits
# once the watermark passes its own timestamp (p_ts < wm — no future
# click with c_ts >= wm can precede it). The availableNow replay's
# final watermark is least(max(c_ts), max(p_ts)) - 2h, which the
# oracle replays exactly.
# Scale: state is bounded by the watermark window per side, never
# stream length; the join itself is the keyed stream-stream exchange.
# --------------------------------------------------------------------------
@register(
    "t30_stream_stream_full_outer",
    oracle="""
    WITH c AS (SELECT user_id, ts AS c_ts, event_id AS click_id
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id, value
               FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT MAX(c_ts) FROM c),
                             (SELECT MAX(p_ts) FROM p))
                       - INTERVAL 2 HOUR AS w),
         matched AS (
             SELECT c.user_id, c.click_id, p.purchase_id, p.value
             FROM c JOIN p
               ON c.user_id = p.user_id
              AND p.p_ts >= c.c_ts
              AND p.p_ts <= c.c_ts + INTERVAL 1 HOUR
         ),
         unmatched_clicks AS (
             SELECT c.user_id, NULL AS purchase_id, NULL AS value,
                    c.click_id
             FROM c, wm
             WHERE c.click_id NOT IN (SELECT click_id FROM matched)
               AND c.c_ts + INTERVAL 1 HOUR < wm.w
         ),
         unmatched_purchases AS (
             SELECT p.user_id, p.purchase_id, p.value, NULL AS click_id
             FROM p, wm
             WHERE p.purchase_id NOT IN (SELECT purchase_id FROM matched)
               AND p.p_ts < wm.w
         ),
         feed AS (
             SELECT user_id, click_id, purchase_id, value FROM matched
             UNION ALL
             SELECT user_id, click_id, purchase_id, value
             FROM unmatched_clicks
             UNION ALL
             SELECT user_id, click_id, purchase_id, value
             FROM unmatched_purchases
         )
    SELECT user_id,
           COUNT(*) FILTER (click_id IS NOT NULL
                            AND purchase_id IS NOT NULL) AS n_pairs,
           COUNT(*) FILTER (purchase_id IS NULL)         AS n_unconverted,
           COUNT(*) FILTER (click_id IS NULL)            AS n_unattributed,
           ROUND(COALESCE(SUM(value) FILTER (click_id IS NOT NULL), 0), 2)
               AS attributed_value,
           ROUND(COALESCE(SUM(value) FILTER (click_id IS NULL), 0), 2)
               AS stray_value
    FROM feed
    GROUP BY user_id
    """,
)
def t30_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "fullOuter",
    )
    sink = run_to_memory(joined, output_mode="append")
    both = F.col("click_id").isNotNull() & F.col("purchase_id").isNotNull()
    return (
        sink.select(
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
            "click_id", "purchase_id", "p_value",
        )
        .groupBy("user_id")
        .agg(
            F.sum(both.cast("int")).cast("bigint").alias("n_pairs"),
            F.sum(F.col("purchase_id").isNull().cast("int"))
            .cast("bigint")
            .alias("n_unconverted"),
            F.sum(F.col("click_id").isNull().cast("int"))
            .cast("bigint")
            .alias("n_unattributed"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("click_id").isNotNull(), F.col("p_value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("attributed_value"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("click_id").isNull(), F.col("p_value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("stray_value"),
        )
    )


# --------------------------------------------------------------------------
# T31 — stream-stream RIGHT OUTER join, the last cell of the streaming
# join matrix (t7 inner, t16 left outer, t28 left semi, t30 full outer):
# same orientation as t16 (clicks LEFT, purchases RIGHT) so the pair
# arm is identical and ONLY the preserved side flips — every purchase
# is accounted for (attribution from the spend side), unmatched
# purchases emit once the watermark passes their own timestamp (no
# future click with c_ts >= wm can precede them — t30's right-side
# emission model, isolated). The oracle replays matched + expired
# unmatched purchases against the availableNow final watermark.
# Scale: right-side state only is horizon-retained for emission;
# the join itself is the keyed stream-stream exchange.
# --------------------------------------------------------------------------
@register(
    "t31_stream_stream_right_outer",
    oracle="""
    WITH c AS (SELECT user_id, ts AS c_ts, event_id AS click_id
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id, value
               FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT least((SELECT MAX(c_ts) FROM c),
                             (SELECT MAX(p_ts) FROM p))
                       - INTERVAL 2 HOUR AS w),
         matched AS (
             SELECT p.user_id, c.click_id, p.purchase_id, p.value
             FROM c JOIN p
               ON c.user_id = p.user_id
              AND p.p_ts >= c.c_ts
              AND p.p_ts <= c.c_ts + INTERVAL 1 HOUR
         ),
         unmatched_purchases AS (
             SELECT p.user_id, NULL AS click_id, p.purchase_id, p.value
             FROM p, wm
             WHERE p.purchase_id NOT IN
                   (SELECT purchase_id FROM matched)
               AND p.p_ts < wm.w
         ),
         feed AS (
             SELECT * FROM matched
             UNION ALL
             SELECT * FROM unmatched_purchases
         )
    SELECT user_id,
           COUNT(*) FILTER (click_id IS NOT NULL)  AS n_attributed,
           COUNT(*) FILTER (click_id IS NULL)      AS n_unattributed,
           ROUND(SUM(value), 2)                    AS total_value,
           ROUND(COALESCE(SUM(value) FILTER (click_id IS NULL), 0), 2)
               AS stray_value
    FROM feed
    GROUP BY user_id
    """,
)
def t31_stream_stream_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "rightOuter",
    )
    sink = run_to_memory(joined, output_mode="append")
    return (
        sink.groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.sum(F.col("click_id").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_attributed"),
            F.sum(F.col("click_id").isNull().cast("int"))
            .cast("bigint")
            .alias("n_unattributed"),
            F.round(F.sum("p_value"), 2).alias("total_value"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("click_id").isNull(), F.col("p_value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("stray_value"),
        )
    )


# --------------------------------------------------------------------------
# T32 — state-partition stability across a repartitioned restart: the
# state store's partition count is FIXED at the query's first run (it is
# written into the checkpoint's offset metadata), and a restart must
# honor the checkpoint — NOT the session's current
# spark.sql.shuffle.partitions — or every key would rehash into the
# wrong state partition and the aggregate would silently double-count.
# The row runs a stateful complete-mode count/sum with partitions=8,
# stops, delivers the second half of the data, and restarts under
# partitions=3: totals must equal one batch pass over everything, and
# the restarted run's progress must report numShufflePartitions=8 (the
# checkpoint's, not the session's). This is THE operational footgun of
# resizing a production cluster under a stateful stream.
# Scale: the pin is exactly why state rescaling needs an offline state
# rewrite (or Spark's state repartition tool) at any size — the engine
# proves here it never silently rescales.
# --------------------------------------------------------------------------
@register(
    "t32_state_repartition_stability",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS total_value,
           TRUE AS checkpoint_partitions_pinned
    FROM events
    GROUP BY event_type
    """,
)
def t32_state_repartition_stability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import uuid

    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.catalog import load_table

    base = os.environ.get(
        "LIME_ON_SPARK_SCRATCH",
        os.path.join(os.path.dirname(__file__), "..", "..", ".scratch"),
    )
    unique = f"{spark.sparkContext.applicationId}-{uuid.uuid4().hex[:12]}"
    src = os.path.join(os.path.abspath(base), f"t32_src-{unique}")
    ck = os.path.join(os.path.abspath(base), f"t32_ckpt-{unique}")
    name = f"t32_snapshot_{uuid.uuid4().hex[:8]}"

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def run_stream() -> list:
        schema = spark.read.parquet(src).schema
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            return list(q.recentProgress or [])
        finally:
            q.stop()

    # Run 1 under 8 shuffle partitions: the checkpoint records 8.
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    with temp_conf(spark, "spark.sql.shuffle.partitions", "8"):
        run_stream()
    # The second half arrives while the job is down; the restart runs
    # under a DIFFERENT session setting (3) and must ignore it.
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    with temp_conf(spark, "spark.sql.shuffle.partitions", "3"):
        progresses = run_stream()
    restart_partitions = {
        int(op["numShufflePartitions"])
        for p in progresses
        for op in (p or {}).get("stateOperators") or []
        if "numShufflePartitions" in op
    }
    pinned = restart_partitions == {8}
    return spark.table(name).withColumn(
        "checkpoint_partitions_pinned", F.lit(bool(pinned))
    )


# --------------------------------------------------------------------------
# T33 — per-commit CDF through the STREAMING source (s38's streaming
# twin): a consumer that was down for five commits catches up in ONE
# availableNow micro-batch — the net planner would cancel the 50 rows
# inserted at v4 and deleted at v5 inside that batch, losing them from
# the audit trail. With per_commit=true every change row carries
# _commit_version, the short-lived rows appear as both changes, and the
# per-version attribution is exact (the closed-form VALUES oracle). The
# foreachBatch consumer aggregates the attribution — merge-associative
# counts, the shape a streaming audit consumer actually keeps.
# Scale: one task per changed-file-per-commit inside the batch; cost
# scales with the change stream, never the table.
# --------------------------------------------------------------------------
@register(
    "t33_streaming_cdf_per_commit",
    oracle="""
    SELECT * FROM (VALUES
        (1, 'insert', 1000),
        (2, 'delete',  100),
        (3, 'delete',    5),
        (3, 'insert',    5),
        (4, 'insert',  200),
        (5, 'delete',   50)
    ) AS t(commit_version, change_type, n)
    ORDER BY commit_version, change_type
    """,
)
def t33_streaming_cdf_per_commit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from lime_on_spark_spark.plans.sources_sinks import (
        _register_manifest_classes,
        _scratch,
        _synthetic_series,
    )
    from lime_on_spark_spark.sources.python_source import (
        ManifestCDFStreamSource,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    try:
        spark.dataSource.register(ManifestCDFStreamSource)
    except Exception:
        pass  # already registered in this session
    src = _scratch(spark, "t33_src")
    ck = _scratch(spark, "t33_ckpt")

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", src)
            .option("retain_history", "true")
            .mode("append")
            .save()
        )

    write(_synthetic_series(spark, 0, 1000, 2))  # v1
    delete_where_manifest_path(spark, src, [("i", "lt", 100)])  # v2
    merge_into_manifest_path(  # v3: 5 in-place updates
        spark, src, _synthetic_series(spark, 200, 205, 1), "i"
    )
    write(_synthetic_series(spark, 1000, 1200, 1))  # v4
    delete_where_manifest_path(  # v5: kills 50 of v4's inserts
        spark, src, [("i", "ge", 1000), ("i", "lt", 1050)]
    )

    counts: dict[tuple, int] = {}

    def absorb(batch_df, batch_id):
        for r in (
            batch_df.groupBy("_commit_version", "_change_type")
            .count()
            .collect()
        ):
            k = (int(r["_commit_version"]), r["_change_type"])
            counts[k] = counts.get(k, 0) + int(r["count"])

    q = (
        spark.readStream.format("json_manifest_cdf_stream_source")
        .option("path", src)
        .option("per_commit", "true")
        .load()
        .writeStream.foreachBatch(absorb)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.createDataFrame(
        sorted((v, t, n) for (v, t), n in counts.items()),
        "commit_version int, change_type string, n bigint",
    )


# --------------------------------------------------------------------------
# T34 — MULTIPLE-WATERMARK POLICY (min vs max): when a query carries TWO
# withWatermark operators (here a union of a click stream and a
# purchase stream whose feed stops a third of the way into the time
# range), Spark must pick ONE global watermark. The default 'min' policy
# is the safety contract — the slowest source gates everything, so a
# stalled purchase feed FREEZES window emission for clicks too (no
# window whose end passes only the fast source's horizon may close).
# 'max' trades that safety for liveness: the fastest source drives, and
# late data from the stalled source is silently dropped. The row runs
# the identical union-window-count under BOTH policies (fresh
# checkpoints) and pins each arm's emitted-window census against the
# closed-form horizons min/max(max_ts_src) - delay. The cut timestamp is
# integer-µs arithmetic so both engines derive it identically.
# Scale: the policy is one comparison over per-operator watermark
# metadata at batch planning — O(1); what it GATES is the unbounded
# state the verdict censuses.
# --------------------------------------------------------------------------
@register(
    "t34_multi_watermark_policy",
    oracle="""
    WITH bounds AS (
        SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi
        FROM events
    ), cut AS (
        SELECT lo + (hi - lo) // 3 AS cut_us FROM bounds
    ), c AS (
        SELECT ts FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT ts FROM events, cut
        WHERE event_type = 'purchase' AND epoch_us(ts) <= cut_us
    ), u AS (
        SELECT ts FROM c UNION ALL SELECT ts FROM p
    ), agg AS (
        SELECT date_trunc('hour', ts) AS ws, COUNT(*) AS n
        FROM u GROUP BY ws
    ), wm AS (  -- sums COALESCEd below: an arm that emits no window must
                -- read 0, matching the Spark side's empty-census zero.
                -- The <= below is deliberate: append mode emits a window
                -- when watermark EQUALS its end (inclusive eviction) —
                -- pinned by tests/test_streaming.py::
                -- test_t34_watermark_equality_boundary on a hand-built
                -- hour-aligned corpus, since the production data never
                -- lands max(ts) exactly on a boundary.
        SELECT LEAST((SELECT MAX(ts) FROM c), (SELECT MAX(ts) FROM p))
                   - INTERVAL 1 HOUR AS w_min,
               GREATEST((SELECT MAX(ts) FROM c), (SELECT MAX(ts) FROM p))
                   - INTERVAL 1 HOUR AS w_max
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM agg, wm
            WHERE ws + INTERVAL 1 HOUR <= w_min)  AS n_windows_minpol,
           (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM agg, wm
            WHERE ws + INTERVAL 1 HOUR <= w_min)  AS n_rows_minpol,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM agg, wm
            WHERE ws + INTERVAL 1 HOUR <= w_max)  AS n_windows_maxpol,
           (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM agg, wm
            WHERE ws + INTERVAL 1 HOUR <= w_max)  AS n_rows_maxpol,
           TRUE                                   AS max_dominates_min
    """,
)
def t34_multi_watermark_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.sources_sinks import _scratch
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    cut_us = lo + (hi - lo) // 3
    clicks = events.filter(F.col("event_type") == "click").select("ts")
    purchases = events.filter(
        (F.col("event_type") == "purchase")
        & (F.unix_micros("ts") <= cut_us)
    ).select("ts")
    src_c = _scratch(spark, "t34_clicks")
    src_p = _scratch(spark, "t34_purch")
    clicks.coalesce(1).write.mode("overwrite").parquet(src_c)
    purchases.coalesce(1).write.mode("overwrite").parquet(src_p)

    def census(policy: str):
        with temp_conf(
            spark, "spark.sql.streaming.multipleWatermarkPolicy", policy
        ):
            sc_ = (
                spark.readStream.schema("ts timestamp").parquet(src_c)
                .withWatermark("ts", "1 hour")
            )
            sp_ = (
                spark.readStream.schema("ts timestamp").parquet(src_p)
                .withWatermark("ts", "1 hour")
            )
            out = run_to_memory(
                sc_.unionByName(sp_)
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n")),
                output_mode="append",
            )
            row = out.agg(
                F.count(F.lit(1)).cast("bigint").alias("w"),
                F.sum("n").cast("bigint").alias("r"),
            ).first()
            return int(row["w"] or 0), int(row["r"] or 0)

    w_min, r_min = census("min")
    w_max, r_max = census("max")
    return spark.createDataFrame(
        [(
            w_min, r_min, w_max, r_max,
            bool(w_max >= w_min and r_max >= r_min),
        )],
        "n_windows_minpol bigint, n_rows_minpol bigint,"
        " n_windows_maxpol bigint, n_rows_maxpol bigint,"
        " max_dominates_min boolean",
    )


# --------------------------------------------------------------------------
# T35 — STREAMING VARIANT ingestion (f28's open-variant type on the
# streaming path): the production shape for schemaless event logs —
# JSON lines arrive on a stream, parse_json lifts each line to VARIANT
# once, typed path extraction feeds a watermarked windowed aggregate.
# No schema is declared for the payload anywhere (the point of VARIANT:
# late-binding without a DDL migration when producers add fields); the
# event timestamp rides as integer unix-micros inside the JSON (engine-
# neutral — JSON has no timestamp type) and is rebuilt with
# timestamp_micros. Complete-mode availableNow replay == the batch twin,
# so the oracle is the t1 aggregate over the ORIGINAL events table —
# agreement proves the serialize -> stream -> parse_json -> variant_get
# -> window loop is lossless end-to-end.
# Scale: parse_json + variant_get are per-row JVM expressions inside the
# micro-batch scan; state is the same windowed-agg store as t1 — the
# VARIANT hop adds no shuffle and no Python.
# --------------------------------------------------------------------------
@register(
    "t35_streaming_variant_ingest",
    oracle="""
    SELECT date_trunc('hour', ts)                             AS hour_start,
           event_type,
           COUNT(*)                                           AS n_events,
           ROUND(SUM(value), 2)                               AS total_value
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def t35_streaming_variant_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.sources_sinks import _scratch
    from lime_on_spark_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    lines = ev.select(
        F.to_json(
            F.struct(
                F.unix_micros("ts").alias("ts_us"),
                F.col("event_type").alias("et"),
                F.col("value").alias("v"),
            )
        ).alias("value")
    )
    path = _scratch(spark, "t35_jsonl")
    lines.coalesce(4).write.mode("overwrite").text(path)

    stream = spark.readStream.schema("value string").text(path)
    v = F.parse_json(F.col("value"))
    parsed = stream.select(
        F.timestamp_micros(
            F.variant_get(v, "$.ts_us", "long")
        ).alias("ts"),
        F.variant_get(v, "$.et", "string").alias("event_type"),
        F.variant_get(v, "$.v", "double").alias("value"),
    )
    agg = (
        parsed.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(agg, output_mode="complete")
