"""Window-function operators (SURVEY.md §2e rows W1-W4).

Scale notes: every window below partitions by a high-cardinality key
(customer), so the single shuffle it costs distributes evenly across
executors — no global-ordering window (a scale anti-pattern) is used
anywhere. Ordering keys always include a unique tie-breaker (o_orderkey)
so rank/lag/lead outputs are deterministic on both engines.

``w1_order_rank_per_customer`` is BASELINE.md row 5 (618 ms / 44 953 rows
at sf0.1) and a bench headline query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# W1 + W4 — ranking windows, top-k per group (bench headline)
# --------------------------------------------------------------------------
@register(
    "w1_order_rank_per_customer",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey,
               o_orderkey,
               ROUND(o_totalprice, 2)                        AS price,
               CAST(rank()       OVER w AS INTEGER)          AS rk,
               CAST(dense_rank() OVER w AS INTEGER)          AS drk,
               CAST(row_number() OVER w AS INTEGER)          AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rk <= 3
    """,
)
def w1_order_rank_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "w1_ntile_percent_rank",
    oracle="""
    SELECT ntile_bucket, COUNT(*) AS n, ROUND(MIN(pr), 6) AS min_pr,
           ROUND(MAX(pr), 6) AS max_pr
    FROM (
        SELECT CAST(ntile(4) OVER w AS INTEGER) AS ntile_bucket,
               percent_rank() OVER w AS pr
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    )
    GROUP BY ntile_bucket
    """,
)
def w1_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.exact_ntile import with_exact_ntile

    cust = load_table(spark, sf_dir, "customer")
    # r16: was an un-partitioned ntile/percent_rank window (single-task
    # global sort over the raw customer table — the d108 anti-pattern).
    # Now the range-bucketed exact rank: (c_acctbal, c_custkey) is a
    # unique order key, so rank() == row_number() (no ties) and
    # percent_rank = (rank - 1) / (N - 1) exactly; N rides as a plan
    # broadcast from the operator's per-range counts (no extra scan).
    ranked = with_exact_ntile(
        cust.select("c_acctbal", "c_custkey"),
        4,
        ["c_acctbal", "c_custkey"],
        out_col="ntile_bucket",
        rank_col="_grank",
        total_col="_n",
    )
    pr = F.when(
        F.col("_n") > 1,
        (F.col("_grank") - 1) / (F.col("_n") - 1),
    ).otherwise(F.lit(0.0))
    return (
        ranked.select("ntile_bucket", pr.alias("pr"))
        .groupBy("ntile_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("pr"), 6).alias("min_pr"),
            F.round(F.max("pr"), 6).alias("max_pr"),
        )
    )


# --------------------------------------------------------------------------
# W2 — analytic windows: lag / lead / first / last
# --------------------------------------------------------------------------
@register(
    "w2_lag_lead",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(o_totalprice, 2)                             AS price,
           ROUND(lag(o_totalprice)  OVER w, 2)                AS prev_price,
           ROUND(lead(o_totalprice) OVER w, 2)                AS next_price,
           ROUND(first_value(o_totalprice) OVER w, 2)         AS first_price,
           CAST(datediff('day',
                         CAST(lag(o_orderdate) OVER w AS DATE),
                         CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# W3 — running / sliding aggregate frames
# --------------------------------------------------------------------------
@register(
    "w3_running_frames",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(SUM(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                                                              AS running_spend,
           ROUND(AVG(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                                                              AS moving_avg3,
           COUNT(*) OVER
                 (PARTITION BY o_custkey ORDER BY o_totalprice
                  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
                                                              AS n_within_10k
    FROM orders
    """,
)
def w3_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_spend"),
        F.round(
            F.avg("o_totalprice").over(w_seq.rowsBetween(-2, Window.currentRow)),
            4,
        ).alias("moving_avg3"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("o_custkey")
            .orderBy("o_totalprice")
            .rangeBetween(-10000, Window.currentRow)
        )
        .alias("n_within_10k"),
    )


# --------------------------------------------------------------------------
# W4 — top-k per group (distinct from the headline: per-nation top spenders)
# --------------------------------------------------------------------------
@register(
    "w4_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT c_nationkey,
               c_custkey,
               ROUND(c_acctbal, 2)                            AS acctbal,
               CAST(row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
        FROM customer
    ) WHERE rn <= 5
    """,
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# W5 — first_value / last_value / nth_value over an explicit full frame
# --------------------------------------------------------------------------
@register(
    "w5_value_funcs",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           COUNT(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w5_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth order value per customer. The frame is explicitly
    UNBOUNDED..UNBOUNDED — last_value under the default frame (..CURRENT
    ROW) is a footgun both engines share; the explicit frame plus the
    (o_orderdate, o_orderkey) total order makes the result deterministic.
    Partitioned by high-cardinality custkey: no global window anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    ).distinct()


# --------------------------------------------------------------------------
# W6 — time-interval RANGE frame: per-user trailing-hour activity. The frame
# is value-based (all rows within 1h of the current row's ts), not
# row-count-based — the window shape behind trailing-window features in a
# feature-engineering pipeline. Both engines order on epoch MICROseconds so
# frame membership is exact (a seconds cast would truncate sub-second ts
# and disagree at the boundary).
# --------------------------------------------------------------------------
@register(
    "w6_time_range_frame",
    oracle="""
    SELECT event_id,
           COUNT(*) OVER w                 AS n_last_hour,
           ROUND(SUM(value) OVER w, 2)     AS val_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def w6_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return events.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("val_last_hour"),
    )


# --------------------------------------------------------------------------
# W7 — cumulative distinct users per day. Window COUNT(DISTINCT) doesn't
# exist in Spark (or ANSI) window frames; the scalable formulation is
# first-seen attribution: each user contributes once at their first day
# (one agg on user_id), then a small per-day series takes a running sum.
# The window runs over DAYS (bounded), never over users — no global
# user-ordered sort at any scale.
# --------------------------------------------------------------------------
@register(
    "w7_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS day
        FROM events GROUP BY user_id
    ), daily AS (
        SELECT a.day, a.n_active, COALESCE(n.n_new, 0) AS n_new
        FROM (SELECT date_trunc('day', ts) AS day,
                     COUNT(DISTINCT user_id) AS n_active
              FROM events GROUP BY day) a
        LEFT JOIN (SELECT day, COUNT(*) AS n_new FROM first_seen
                   GROUP BY day) n ON a.day = n.day
    )
    SELECT day, n_active, CAST(n_new AS BIGINT) AS n_new,
           CAST(SUM(n_new) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
               AS cum_distinct_users
    FROM daily
    """,
)
def w7_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    active = events.groupBy(day).agg(
        F.countDistinct("user_id").alias("n_active")
    )
    first_seen = events.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("day"))
    new_per_day = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    joined = active.join(new_per_day, "day", "left").select(
        "day",
        "n_active",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    # The unpartitioned window here runs over POST-AGGREGATION day rows
    # (~30 at any SF — one row per calendar day of the corpus), so the
    # single-task sort it implies is bounded by the calendar, not by data
    # volume. The raw-row equivalents of this pattern must instead use
    # operators/exact_ntile.py-style range partitioning.
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return joined.withColumn("cum_distinct_users", F.sum("n_new").over(w))


# --------------------------------------------------------------------------
# W8 — exponentially weighted moving average of daily revenue per customer
# segment. EWMA's recursion unrolls to a window sum of a^(n-i)·x_i /
# Σ a^(n-i): two running sums over the SAME (segment-partitioned,
# day-ordered) frame — one shuffle, no iteration, no state. pow() keeps it
# a pure column expression; the frame is bounded by the day count per
# segment, not data volume.
# --------------------------------------------------------------------------
@register(
    "w8_ewma_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT c.c_mktsegment AS segment,
               date_trunc('day', CAST(o.o_orderdate AS TIMESTAMP)) AS day,
               SUM(o.o_totalprice) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY segment, day
    ), numbered AS (
        SELECT segment, day, revenue,
               row_number() OVER (PARTITION BY segment ORDER BY day) AS rn
        FROM daily
    )
    SELECT segment, day,
           ROUND(revenue, 2) AS revenue,
           ROUND(
               SUM(revenue * pow(0.8, -rn)) OVER w
               / SUM(pow(0.8, -rn)) OVER w, 2) AS ewma_revenue
    FROM numbered
    WINDOW w AS (PARTITION BY segment ORDER BY rn
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def w8_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("day", F.col("o_orderdate").cast("timestamp")).alias(
                "day"
            ),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    rn = F.row_number().over(Window.partitionBy("segment").orderBy("day"))
    numbered = daily.withColumn("rn", rn)
    # a^(n-i) x_i = a^n · (x_i a^(-i)): both sums share one 10-row frame.
    w = (
        Window.partitionBy("segment")
        .orderBy("rn")
        .rowsBetween(-9, Window.currentRow)
    )
    wsum = F.sum(F.col("revenue") * F.pow(F.lit(0.8), -F.col("rn"))).over(w)
    wnorm = F.sum(F.pow(F.lit(0.8), -F.col("rn"))).over(w)
    return numbered.select(
        "segment",
        "day",
        F.round("revenue", 2).alias("revenue"),
        F.round(wsum / wnorm, 2).alias("ewma_revenue"),
    )


# --------------------------------------------------------------------------
# W9 — running aggregate with conditional RESET (gaps-and-islands): the
# running spend per customer resets whenever 60+ days of dormancy separate
# consecutive orders. The reset is not expressible as a frame bound; the
# standard lowering is lag() -> reset flag -> cumsum of flags = streak id
# -> running sum partitioned by (customer, streak). Two window passes over
# the same (custkey, orderdate) sort order — Spark executes them in one
# shuffle + one per-partition sort, which is the optimal plan for this
# operator at any scale.
# --------------------------------------------------------------------------
@register(
    "w9_reset_running_sum",
    oracle="""
    WITH flagged AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               CASE WHEN lag(o_orderdate) OVER w IS NULL
                      OR date_diff('day', lag(o_orderdate) OVER w, o_orderdate) >= 60
                    THEN 1 ELSE 0 END AS new_streak
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), streaks AS (
        SELECT o_custkey, o_totalprice,
               SUM(new_streak) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS streak_id
        FROM flagged
    )
    SELECT o_custkey                            AS custkey,
           CAST(MAX(streak_id) AS BIGINT)       AS n_streaks,
           ROUND(MAX(streak_spend), 2)          AS max_streak_spend
    FROM (
        SELECT o_custkey, streak_id, SUM(o_totalprice) AS streak_spend
        FROM streaks GROUP BY o_custkey, streak_id
    ) s
    GROUP BY o_custkey
    """,
)
def w9_reset_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap_days = F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
    new_streak = F.when(
        F.lag("o_orderdate").over(w).isNull() | (gap_days >= 60), 1
    ).otherwise(0)
    streaks = orders.select(
        "o_custkey",
        "o_totalprice",
        F.sum(new_streak).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("streak_id"),
    )
    per_streak = streaks.groupBy("o_custkey", "streak_id").agg(
        F.sum("o_totalprice").alias("streak_spend")
    )
    return per_streak.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("streak_id").cast("bigint").alias("n_streaks"),
        F.round(F.max("streak_spend"), 2).alias("max_streak_spend"),
    )


# --------------------------------------------------------------------------
# W10 — Pareto front (skyline) per language: maximize token diversity,
# minimize length. The naive lowering is an O(n²) dominance anti-join;
# the window lowering is ONE partitioned sort: over DISTINCT (quality,
# len) pairs ordered (quality DESC, len ASC), a pair is dominated iff the
# running MIN of len over the preceding rows is <= its own len (preceding
# rows have >= quality, so a <= len among them is a dominator; with
# distinct pairs, equality can only come from a strictly-better-quality
# row at equal length, which also dominates). Partitioned by lang —
# no global window, deterministic on both engines.
# --------------------------------------------------------------------------
@register(
    "w10_pareto_front",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS q,
               n_chars AS len
        FROM documents
    ), pairs AS (
        SELECT DISTINCT lang, q, len FROM scored
    ), flagged AS (
        SELECT lang, q, len,
               MIN(len) OVER (
                   PARTITION BY lang ORDER BY q DESC, len ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prior_min
        FROM pairs
    ), front AS (
        SELECT lang, q, len FROM flagged
        WHERE prior_min IS NULL OR prior_min > len
    )
    SELECT f.lang,
           CAST(COUNT(*) AS BIGINT)    AS n_front,
           ROUND(MAX(f.q), 6)          AS best_quality,
           CAST(MIN(f.len) AS BIGINT)  AS shortest_len
    FROM front f
    GROUP BY f.lang
    """,
)
def w10_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "lang",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("q"),
        F.col("n_chars").alias("len"),
    )
    pairs = scored.distinct()
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("q"), F.asc("len"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = pairs.withColumn("prior_min", F.min("len").over(w)).filter(
        F.col("prior_min").isNull() | (F.col("prior_min") > F.col("len"))
    )
    return front.groupBy("lang").agg(
        F.count("*").alias("n_front"),
        F.round(F.max("q"), 6).alias("best_quality"),
        F.min("len").cast("bigint").alias("shortest_len"),
    )


# --------------------------------------------------------------------------
# W11 — cume_dist + NUMERIC range frame: the remaining analytic pair.
# cume_dist gives each customer's within-segment balance percentile
# (inclusive CDF); the RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING
# frame counts balance-NEIGHBORS — a frame over the VALUE axis, not row
# positions, which no rowsBetween can express. Both partition on
# c_mktsegment, so one shuffle serves both window passes.
# --------------------------------------------------------------------------
@register(
    "w11_cume_dist_range_frame",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(cd), 6) AS avg_cume_dist,
           ROUND(MAX(cd), 6) AS max_cume_dist,
           ROUND(AVG(nbr), 4) AS avg_balance_neighbors
    FROM (
        SELECT c_mktsegment,
               cume_dist() OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal) AS cd,
               COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                              RANGE BETWEEN 100 PRECEDING
                                        AND 100 FOLLOWING) AS nbr
        FROM customer
    )
    GROUP BY c_mktsegment
    """,
)
def w11_cume_dist_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w_cd = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    w_rng = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rangeBetween(-100, 100)
    )
    per_row = cust.select(
        "c_mktsegment",
        F.cume_dist().over(w_cd).alias("cd"),
        F.count(F.lit(1)).over(w_rng).alias("nbr"),
    )
    return per_row.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("cd"), 6).alias("avg_cume_dist"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
        F.round(F.avg("nbr"), 4).alias("avg_balance_neighbors"),
    )


# --------------------------------------------------------------------------
# W12 — grouped-median enrichment via join-back: DuckDB (and ANSI
# engines) spell "each order vs its customer's median order value" as a
# MEDIAN window function; Spark has no exact-percentile window, and the
# naive workaround (percentile over an unbounded frame) recomputes the
# percentile per ROW. The scale-correct Spark formulation is a grouped
# exact percentile (one partial-aggregating shuffle, O(#customers)
# output) joined back on the grouping key — co-partitioned by the same
# key, so AQE plans the join-back without a second shuffle of the big
# side's data in practice. The oracle IS the median window function, so
# the row pins the two formulations against each other.
# Scale: two shuffles on o_custkey vs the window's one sort — but the
# window sorts the FULL table per partition while the join-back's
# second shuffle moves only (custkey, median) pairs. At 100 TB with
# bounded group cardinality the join-back wins on memory; neither is
# quadratic.
# --------------------------------------------------------------------------
@register(
    "w12_median_joinback",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)                  AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice > 1.5 * med
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_spikes,
           CAST(ROUND(SUM(med * 200)) AS BIGINT)     AS med_sum_halfcents
    FROM (
        SELECT o_orderpriority, o_totalprice,
               median(o_totalprice) OVER (PARTITION BY o_custkey) AS med
        FROM orders
    )
    GROUP BY o_orderpriority
    """,
)
def w12_median_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Exact interpolating percentile == DuckDB median (both compute
    # lower + (upper - lower) * 0.5 on the same doubles).
    med = orders.groupBy("o_custkey").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    return (
        orders.join(med, "o_custkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((F.col("o_totalprice") > 1.5 * F.col("med")).cast("int"))
            .cast("bigint")
            .alias("n_spikes"),
            # Medians of 2dp prices are integral in HALF-cents; summing
            # those and rounding to an integer is hash-exact where a 4dp
            # rounded AVG sits on the .xxxx5 boundary (observed last-ulp
            # flip at sf0.001 from summation-order differences).
            F.round(F.sum(F.col("med") * 200), 0)
            .cast("bigint")
            .alias("med_sum_halfcents"),
        )
    )


# --------------------------------------------------------------------------
# O16 — WindowGroupLimit pushdown (Spark 3.5+/4 optimizer): a
# row_number() <= k filter over a window makes the naive plan sort EVERY
# row of every partition; the optimizer inserts a WindowGroupLimit node
# that keeps a k-heap per group BEFORE the full window sort, so the sort
# only sees k rows per group. At 100 TB top-k-per-key this is the
# difference between shuffling/sorting the table and shuffling k rows
# per key. Self-certifying: the executed plan must contain the
# WindowGroupLimit node (both partial — before the shuffle — and final);
# the top-3 values themselves are SQL-exact under the deterministic
# (price DESC, orderkey) tie-break.
# --------------------------------------------------------------------------
@register(
    "o16_window_group_limit",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)                       AS n_top_rows,
           CAST(ROUND(SUM(o_totalprice * 100)) AS BIGINT) AS top_price_cents,
           TRUE AS group_limit_planned
    FROM (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey)
                   AS rk
        FROM orders
    )
    WHERE rk <= 3
    GROUP BY o_orderpriority
    """,
)
def o16_window_group_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    top = (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_top_rows"),
            F.round(F.sum(F.col("o_totalprice") * 100), 0)
            .cast("bigint")
            .alias("top_price_cents"),
        )
    )
    rows = top.collect()
    planned = "WindowGroupLimit" in (
        top._jdf.queryExecution().executedPlan().toString()
    )
    return spark.createDataFrame(
        [
            (r["o_orderpriority"], r["n_top_rows"], r["top_price_cents"],
             bool(planned))
            for r in rows
        ],
        "o_orderpriority string, n_top_rows bigint,"
        " top_price_cents bigint, group_limit_planned boolean",
    )


# --------------------------------------------------------------------------
# W13 — gaps and islands: the classic consecutive-run detection (longest
# activity streak per user) via the anchor trick — day_index minus
# dense_rank is CONSTANT within a consecutive run, so one window + one
# group-by finds every island without self-joins or recursion. Kept
# integer-exact end to end: days become epoch-day integers before the
# window (no date/interval arithmetic crosses an engine boundary).
# Scale: one shuffle on user_id (the window), one keyed agg on
# (user, anchor) that reuses the same partitioning, one bounded
# distribution agg. The naive formulation is a self-join per gap test —
# quadratic per user; this is the linear spelling.
# --------------------------------------------------------------------------
@register(
    "w13_gaps_islands_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1990-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS dd
        FROM events
    ), islands AS (
        SELECT user_id,
               dd - dense_rank() OVER (
                   PARTITION BY user_id ORDER BY dd
               ) AS anchor
        FROM days
    ), streaks AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM islands GROUP BY user_id, anchor
    ), best AS (
        SELECT user_id, MAX(len) AS max_streak FROM streaks GROUP BY user_id
    )
    SELECT CAST(max_streak AS BIGINT)      AS max_streak,
           CAST(COUNT(*) AS BIGINT)        AS n_users
    FROM best
    GROUP BY max_streak
    """,
)
def w13_gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_table as _lt

    events = _lt(spark, sf_dir, "events")
    days = (
        events.select(
            "user_id",
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))),
                F.lit("1990-01-01").cast("date"),
            ).alias("dd"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dd")
    islands = days.withColumn(
        "anchor", F.col("dd") - F.dense_rank().over(w)
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return best.groupBy("max_streak").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
