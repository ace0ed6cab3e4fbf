"""Streaming twins (SURVEY.md §5.5): each streaming variant fed the same
events slice must equal (or consistently relate to) its batch twin."""

from __future__ import annotations

from lime_on_spark_spark.plans import registry


def _canon(df):
    from tests.compare import canon_frame

    return canon_frame(df.toPandas())


def test_t1_streaming_equals_batch_twin(spark, sf_dir):
    qs = registry.queries()
    batch = qs["t1_tumbling_hour"](spark, sf_dir)
    stream = qs["t1_streaming_tumbling"](spark, sf_dir)
    assert _canon(stream) == _canon(batch)


def test_t5_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    qs = registry.queries()
    stream = qs["t5_streaming_dedup"](spark, sf_dir)
    batch = (
        load_table(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
    )
    assert _canon(stream) == _canon(batch)


def test_t4_append_mode_only_emits_finalized_windows(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    qs = registry.queries()
    appended = qs["t4_watermark_append"](spark, sf_dir).toPandas()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    # append emits a subset of the batch windows (final horizon withheld) …
    assert len(appended) <= len(batch)
    assert len(appended) > 0
    # … and every emitted window agrees with the batch count.
    merged = appended.merge(batch, on="hour_start", suffixes=("_s", "_b"))
    assert len(merged) == len(appended)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_t6_stateful_matches_batch_aggregate(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    qs = registry.queries()
    stream = qs["t6_stateful_user_stats"](spark, sf_dir)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )
    assert _canon(stream) == _canon(batch)


def test_t7_stream_stream_join_matches_batch_twin(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    qs = registry.queries()
    stream = qs["t7_stream_stream_join"](spark, sf_dir)

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed_pairs"),
            F.round(F.sum("p_value"), 2).alias("attributed_value"),
        )
    )
    assert _canon(stream) == _canon(batch)


def test_t8_foreach_batch_matches_batch_aggregate(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    stream = registry.queries()["t8_foreach_batch_sink"](spark, sf_dir).toPandas()
    batch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .toPandas()
    )
    # append withholds the final watermark horizon -> emitted ⊆ batch …
    assert 0 < len(stream) <= len(batch)
    merged = stream.merge(batch, on=["hour_start", "user_id"], suffixes=("_s", "_b"))
    # … every emitted row was written exactly once across the epochs and
    # agrees with the batch aggregate.
    assert len(merged) == len(stream)
    assert (merged["n_purchases_s"] == merged["n_purchases_b"]).all()
    assert (merged["total_value_s"] == merged["total_value_b"]).all()


def test_checkpoint_restart_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once across restarts: a checkpointed file-stream stopped after
    batch 1 and restarted after new files arrive must process ONLY the new
    files — the readback holds every source row exactly once. This is the
    recovery contract a production pipeline leans on when executors die
    mid-run."""
    import shutil

    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    n_total = events.count()
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = events.schema

    # Generation 1: first half of the events.
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "gen1")
    )

    def run_available(tag):
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    run_available("gen1")
    n_after_gen1 = spark.read.parquet(out).count()
    assert 0 < n_after_gen1 < n_total

    # Generation 2 arrives; restart from the SAME checkpoint.
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "gen2")
    )
    run_available("gen2")

    back = spark.read.parquet(out)
    assert back.count() == n_total, "restart must not duplicate or drop rows"
    assert back.select("event_id").distinct().count() == n_total
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_transform_with_state_gate_matches_environment():
    """t15 (transformWithStateInPandas) must register exactly when python
    protobuf — the TransformWithState runner's wire dependency — exists.
    Guards both failure modes: registering a query that would crash at
    runtime here, and silently losing the operator where it COULD run."""
    from lime_on_spark_spark.plans import streaming_plans
    from lime_on_spark_spark.plans import registry

    registered = "t15_transform_with_state" in registry.queries()
    assert registered == streaming_plans.HAS_TWS_DEPS


def test_t34_watermark_equality_boundary(spark, tmp_path):
    """Pin the engine boundary t34's oracle leans on: in append mode a
    window IS emitted when the watermark EQUALS its end (Spark's
    eviction predicate is `window.end <= watermark`, inclusive), so the
    oracle's `ws + INTERVAL 1 HOUR <= w_min/w_max` census is exact even
    on a corpus whose max event timestamp lands exactly on an hour
    boundary (r14 ADVICE: the production corpora never exercise this, a
    hand-built one must)."""
    import pyspark.sql.functions as F

    # max ts = 03:00:00 exactly -> watermark = 02:00:00 exactly.
    rows = [
        ("2024-01-01 00:30:00",),  # [00:00, 01:00): end < wm, emitted
        ("2024-01-01 01:30:00",),  # [01:00, 02:00): end == wm, THE case
        ("2024-01-01 03:00:00",),  # [03:00, 04:00): open, not emitted
    ]
    df = spark.createDataFrame(rows, "ts_s string").select(
        F.col("ts_s").cast("timestamp").alias("ts")
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    agg = (
        spark.readStream.schema("ts timestamp").parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
    )
    q = (
        agg.writeStream.format("memory").queryName("t34_boundary")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ends = sorted(
        r["end"].strftime("%H:%M")
        for r in spark.sql("select w.end from t34_boundary").collect()
    )
    spark.catalog.dropTempView("t34_boundary")
    assert ends == ["01:00", "02:00"], (
        "append mode must emit the window whose end EQUALS the watermark "
        f"(inclusive eviction) and nothing later; got ends={ends}"
    )
