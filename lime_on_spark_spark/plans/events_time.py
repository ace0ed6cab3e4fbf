"""Event-time operators over `events` (SURVEY.md §2i rows T1-T3, batch twins).

These are the batch twins of the streaming operators (the streaming variants
live in plans/streaming_plans.py, rows-only) — DuckDB has no streaming, so
the oracle checks the time-window *semantics* here on identical input.

This module is also the only place the S2 ns-timestamp repair is exercised
end-to-end: `events.ts` arrives as long nanos under `nanosAsLong=true` and
is rebuilt as a microsecond timestamp (sources/catalog.py) — every oracle
row here implicitly validates that repair against DuckDB's native ns read.

Scale notes: tumbling/sliding aggregation shuffles once on (window, key) —
at 100 TB the window key is dense and uniform, no skew. The sliding variant
multiplies input by windows-per-event (4 here) *before* the shuffle, which
is the same cost Structured Streaming pays; the session twin shuffles once
on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# T1 — tumbling 1-hour aggregation (bench headline; BASELINE.md row 6)
# --------------------------------------------------------------------------
@register(
    "t1_tumbling_hour",
    oracle="""
    SELECT date_trunc('hour', ts)                             AS hour_start,
           event_type,
           COUNT(*)                                           AS n_events,
           ROUND(SUM(value), 2)                               AS total_value
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def t1_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
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


# --------------------------------------------------------------------------
# T2 — sliding 1-hour window, 15-minute slide (each event in 4 windows)
# --------------------------------------------------------------------------
@register(
    "t2_sliding_window",
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
def t2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes"))
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


# --------------------------------------------------------------------------
# T3 — session windows (30-minute gap), native session_window vs the
# gaps-and-islands SQL formulation. Boundary semantics pinned on both sides:
# an event exactly 30 minutes after the previous one starts a NEW session
# (Spark sessions are half-open [start, last+gap)).
# --------------------------------------------------------------------------
@register(
    "t3_session_window",
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
def t3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes"), F.col("user_id")
        )
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


# --------------------------------------------------------------------------
# Hierarchical rollup: day-level aggregate REAGGREGATED from the hour level
# (the continuous-aggregate pattern: at 100 TB the day rollup reads the tiny
# materialized hour table, never the raw events)
# --------------------------------------------------------------------------
@register(
    "t1_hierarchical_rollup",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts)  AS hour_start,
               event_type,
               COUNT(*)                AS n_events,
               SUM(value)              AS total_value
        FROM events
        GROUP BY hour_start, event_type
    )
    SELECT date_trunc('day', hour_start)                      AS day_start,
           event_type,
           CAST(SUM(n_events) AS BIGINT)                      AS n_events,
           ROUND(SUM(total_value), 2)                         AS total_value
    FROM hourly
    GROUP BY day_start, event_type
    """,
)
def t1_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    return hourly.groupBy(
        F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("total_value"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# T9 — gap filling: dense hourly spine per event_type with zero-filled
# missing hours. F.sequence builds the spine from the observed [min, max]
# range (two scalar aggregates, broadcast single-row), the type dimension
# is bounded, and the fill is a left join from spine to the hourly counts —
# the standard shape for regularizing a sparse time series before feature
# extraction. No driver-side loop: the spine explodes JVM-side.
# --------------------------------------------------------------------------
@register(
    "t9_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ), spine AS (
        SELECT t.h AS hour_start, et.event_type
        FROM bounds,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t(h),
             (SELECT DISTINCT event_type FROM events) et
    ), hourly AS (
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    )
    SELECT s.hour_start, s.event_type,
           COALESCE(h.n, 0) AS n_events
    FROM spine s
    LEFT JOIN hourly h
      ON s.hour_start = h.hour_start AND s.event_type = h.event_type
    """,
)
def t9_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    types = events.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(types))  # bounded: hours x 5 types
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(hourly, ["hour_start", "event_type"], "left")
        .select(
            "hour_start",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# T9 — conversion funnel: per calendar day, users whose FIRST click that day
# was followed by a purchase within 1 hour. The event-sequence primitive
# (match first step, bounded lookahead to the next step) expressed as two
# aggregates + one keyed join — no per-user collect, no session state; at
# 100 TB both sides shuffle on (user_id, day) once.
# --------------------------------------------------------------------------
@register(
    "t9_conversion_funnel",
    oracle="""
    WITH first_clicks AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               MIN(ts) AS fc_ts
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, day
    ), converted AS (
        SELECT DISTINCT f.user_id, f.day
        FROM first_clicks f
        JOIN events p
          ON p.user_id = f.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= f.fc_ts
         AND p.ts <= f.fc_ts + INTERVAL 1 HOUR
    )
    SELECT f.day,
           COUNT(*) AS n_clickers,
           CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted
    FROM first_clicks f
    LEFT JOIN converted c ON f.user_id = c.user_id AND f.day = c.day
    GROUP BY f.day
    """,
)
def t9_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("ts").alias("fc_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("fc_ts"))
            & (F.col("p_ts") <= F.col("fc_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id", "day")
        .distinct()
        .withColumn("conv", F.lit(True))
    )
    return (
        first_clicks.join(converted, ["user_id", "day"], "left")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_clickers"),
            F.sum(F.when(F.col("conv"), 1).otherwise(0)).alias("n_converted"),
        )
    )


# --------------------------------------------------------------------------
# T10 — weekly cohort retention: users grouped by first-seen week, counted
# as active in each later week (offset in weeks). Two aggregates and one
# keyed join — the cohort table is (weeks × users-per-week) small relative
# to events, and nothing needs a window over the full stream.
# --------------------------------------------------------------------------
@register(
    "t10_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('week', f.cohort_week, a.week) AS BIGINT)
               AS week_offset,
           COUNT(*) AS n_active
    FROM active a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def t10_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts")
    first_seen = events.groupBy("user_id").agg(
        F.min(week).alias("cohort_week")
    )
    active = events.select("user_id", week.alias("week")).distinct()
    offset = F.floor(
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
        / (7 * 86400)
    ).cast("bigint")
    return (
        active.join(first_seen, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --------------------------------------------------------------------------
# T11 — event-transition matrix (first-order Markov counts): per user,
# consecutive event-type pairs in time order. One window shuffle on
# user_id; the transition matrix itself is (types²) tiny. The per-user
# event-sequence analogue of d9's corpus bigram counts.
# --------------------------------------------------------------------------
@register(
    "t11_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def t11_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


# --------------------------------------------------------------------------
# T14 — gap filling with LINEAR INTERPOLATION (t9's zero-fill upgraded to
# the time-series resample primitive): hourly average of high-value
# purchases, with missing hours reconstructed from the straight line
# between the surrounding observed hours (edges clamp to the nearest
# observation). The interpolation windows run over the POST-AGGREGATION
# hourly spine (~720 calendar rows at any SF — bounded by the corpus's
# time span, not data volume), the same justification as
# w7_cumulative_distinct_users; raw-row variants must range-partition.
# --------------------------------------------------------------------------
@register(
    "t14_interpolate",
    oracle="""
    WITH src AS (
        SELECT * FROM events WHERE event_type = 'purchase' AND value >= 99
    ), bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM src
    ), spine AS (
        SELECT t.h AS hour_start
        FROM bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t(h)
    ), hourly AS (
        -- AVG pre-rounded to 6 on BOTH sides: the interpolation then
        -- runs on identical doubles, so the final round(4) can't straddle
        -- a rounding midpoint from last-ulp AVG differences.
        SELECT date_trunc('hour', ts) AS h, ROUND(AVG(value), 6) AS v
        FROM src GROUP BY 1
    ), j AS (
        SELECT s.hour_start, hourly.v,
               CAST(epoch(s.hour_start) AS BIGINT) / 3600 AS hh
        FROM spine s LEFT JOIN hourly ON s.hour_start = hourly.h
    ), w AS (
        SELECT hour_start, v, hh,
               last_value(v IGNORE NULLS) OVER
                   (ORDER BY hour_start ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS)
                   OVER (ORDER BY hour_start ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND CURRENT ROW) AS ph,
               first_value(v IGNORE NULLS) OVER
                   (ORDER BY hour_start ROWS BETWEEN CURRENT ROW
                                                 AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS)
                   OVER (ORDER BY hour_start ROWS BETWEEN CURRENT ROW
                                                      AND UNBOUNDED FOLLOWING) AS nh
        FROM j
    )
    -- +1e-9 before ROUND on BOTH sides: interpolation can land exactly
    -- on a 4-decimal midpoint (e.g. x.79625) where Spark's BigDecimal
    -- HALF_UP and DuckDB's rounding disagree; the nudge moves midpoints
    -- off the boundary identically in both engines.
    SELECT hour_start,
           ROUND(1e-9 + CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * (hh - ph) * 1.0 / (nh - ph)
                 END, 4)          AS value_interp,
           (v IS NULL)            AS was_gap
    FROM w
    """,
)
def t14_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    src = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 99)
    )
    bounds = src.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_start"
        )
    )
    hourly = src.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.round(F.avg("value"), 6).alias("v")  # pre-round: see oracle comment
    )
    hh = (F.unix_timestamp("hour_start") / 3600).cast("bigint")
    j = spine.join(hourly, "hour_start", "left").select(
        "hour_start", "v", hh.alias("hh")
    )
    # Calendar-bounded spine (see header comment): unpartitioned windows OK.
    w_prev = Window.orderBy("hour_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_next = Window.orderBy("hour_start").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_hh = F.when(F.col("v").isNotNull(), F.col("hh"))
    marked = j.select(
        "hour_start",
        "v",
        "hh",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_hh, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_hh, ignorenulls=True).over(w_next).alias("nh"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("hh") - F.col("ph"))
            / (F.col("nh") - F.col("ph"))
        )
    )
    return marked.select(
        "hour_start",
        # midpoint nudge — see the oracle's comment
        F.round(interp + F.lit(1e-9), 4).alias("value_interp"),
        F.col("v").isNull().alias("was_gap"),
    )


# --------------------------------------------------------------------------
# T17 — DYNAMIC-gap session window: each event extends the session by its
# own event-type-dependent inactivity gap (clicks cool off in 30 min,
# anything else holds the session 45 min) — the Spark-4 native
# session_window(ts, <gap expression>) form. Semantics pinned by the
# oracle: a session's end is the running MAX of (ts + gap(event)) — a
# single lag() is NOT enough, an earlier long-gap event can outlast its
# successors — and a new session starts exactly when ts >= that max.
# Same one-shuffle-per-key scale shape as t3.
# --------------------------------------------------------------------------
@register(
    "t17_dynamic_session_window",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN event_type = 'click' THEN INTERVAL 30 MINUTE
                    ELSE INTERVAL 45 MINUTE END AS gap
        FROM events
    ), marked AS (
        SELECT user_id, ts, value, event_id, gap,
               CASE WHEN MAX(ts + gap) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND 1 PRECEDING) IS NULL
                      OR ts >= MAX(ts + gap) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id
                                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                                            AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
    ), s AS (
        SELECT user_id, ts, value, gap,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts)                       AS session_start,
           MAX(ts + gap)                 AS session_end,
           COUNT(*)                      AS n_events,
           ROUND(SUM(value), 2)          AS total_value
    FROM s
    GROUP BY user_id, session_id
    """,
)
def t17_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # session_window's gap expression takes duration STRINGS (Spark parses
    # them to CalendarIntervalType; INTERVAL literals arrive as
    # DayTimeIntervalType and are rejected).
    gap = F.when(F.col("event_type") == "click", F.lit("30 minutes")).otherwise(
        F.lit("45 minutes")
    )
    return (
        events.groupBy(F.session_window("ts", gap), F.col("user_id"))
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


# --------------------------------------------------------------------------
# T20 — event-time LATENESS profile: how far events arrive behind the
# maximum event-time already seen on their stream (arrival order =
# event_id). This is the diagnostic that picks a watermark delay — the
# bucket histogram directly reads as "a 1 h watermark drops X events".
# Per-user running max (partitioned window, arrival-ordered), lateness in
# seconds, bucketed counts. All integer-second arithmetic — exact on both
# engines.
# --------------------------------------------------------------------------
@register(
    "t20_lateness_profile",
    oracle="""
    WITH arr AS (
        SELECT user_id, event_id, epoch(ts) AS es,
               MAX(epoch(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS run_max
        FROM events
    ), lat AS (
        SELECT CAST(run_max - es AS BIGINT) AS lateness FROM arr
    )
    SELECT CASE
             WHEN lateness = 0 THEN 'on_time'
             WHEN lateness <= 3600 THEN 'late_1h'
             WHEN lateness <= 86400 THEN 'late_1d'
             ELSE 'late_more'
           END AS bucket,
           CAST(COUNT(*) AS BIGINT)    AS n_events,
           CAST(MAX(lateness) AS BIGINT) AS max_lateness_s
    FROM lat GROUP BY 1
    """,
)
def t20_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    es = F.unix_timestamp("ts")
    lat = ev.select(
        (F.max(es).over(w) - es).cast("bigint").alias("lateness")
    )
    bucket = (
        F.when(F.col("lateness") == 0, "on_time")
        .when(F.col("lateness") <= 3600, "late_1h")
        .when(F.col("lateness") <= 86400, "late_1d")
        .otherwise("late_more")
    )
    return lat.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_events"),
        F.max("lateness").cast("bigint").alias("max_lateness_s"),
    )
