"""Aggregation operators (SURVEY.md §2d rows A2-A7).

Scale notes: every group-by below is a partial (map-side) + final hash
aggregate — one shuffle on the grouping key. count-distinct expands to a
two-phase aggregate (Expand + two HashAggregates) which Spark plans
automatically; approx_count_distinct (A3) is the single-pass HLL path to
prefer at 100 TB when exactness isn't required.

DuckDB quirks handled in oracle SQL: SUM(BIGINT) returns HUGEINT (cast to
BIGINT); list aggregates are sorted on both sides for determinism.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# A2 — distinct rows and count-distinct
# --------------------------------------------------------------------------
@register(
    "a2_distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def a2_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "a2_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey)                         AS n_customers,
           COUNT(DISTINCT o_orderpriority)                   AS n_priorities,
           COUNT(*)                                          AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# A3 — approximate count-distinct (HLL). The raw HLL estimate is
# engine-specific, so the query emits the EXACT count plus a Spark-computed
# tolerance verdict (|approx-exact|/exact < 3·rsd); the oracle emits the
# same exact count and literal TRUE. The sketch is thus oracle-CHECKED
# (a broken HLL flips within_tol to false and fails the hash) without the
# oracle needing to reproduce Spark's HLL++ bias correction bit-for-bit.
# --------------------------------------------------------------------------
@register(
    "a3_approx_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE                      AS within_tol
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a3_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    RSD = 0.02
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", RSD).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    return agg.select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            / F.col("exact_customers")
            < 3 * RSD
        ).alias("within_tol"),
    )


# --------------------------------------------------------------------------
# A4 — statistical aggregates (stddev/variance/corr/exact percentile)
# --------------------------------------------------------------------------
@register(
    "a4_stats_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4)                 AS sd_qty,
           ROUND(var_samp(l_quantity), 4)                    AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           array_to_string(
               list_transform(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
                              v -> printf('%.4f', v)), ',') AS price_quartiles
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a4_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    quartiles = F.percentile("l_extendedprice", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)]))
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.array_join(
            F.transform(quartiles, lambda v: F.format_string("%.4f", v)), ","
        ).alias("price_quartiles"),
    )


# --------------------------------------------------------------------------
# A5 — rollup (grouping sets)
# --------------------------------------------------------------------------
@register(
    "a5_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                         AS sum_qty,
           COUNT(*)                                          AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a5_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*)                                          AS n,
           ROUND(SUM(o_totalprice), 2)                       AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def a5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# A6 — filtered / conditional aggregation
# --------------------------------------------------------------------------
@register(
    "a6_filtered_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity) FILTER (WHERE l_discount > 0.05), 2) AS qty_hi_disc,
           COUNT(*) FILTER (WHERE l_tax > 0.04)                       AS n_hi_tax,
           ROUND(AVG(l_extendedprice) FILTER (WHERE l_quantity >= 25), 4) AS avg_price_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a6_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_quantity"))), 2
        ).alias("qty_hi_disc"),
        F.count(F.when(F.col("l_tax") > 0.04, F.lit(1))).alias("n_hi_tax"),
        F.round(
            F.avg(F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice"))), 4
        ).alias("avg_price_bulk"),
    )


# --------------------------------------------------------------------------
# A7 — collect_list / collect_set (sorted for cross-engine determinism)
# --------------------------------------------------------------------------
@register(
    "a7_collect_list",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',')     AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def a7_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "a7_collect_set",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
                                                             AS segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def a7_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        )
    )


# --------------------------------------------------------------------------
# A5c — explicit GROUPING SETS with grouping() flags
# --------------------------------------------------------------------------
@register(
    "a5_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           COUNT(*)                                   AS n,
           ROUND(SUM(o_totalprice), 2)                AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def a5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets — neither a rollup nor a cube: per-status,
    per-priority, and grand-total rows in ONE pass (one shuffle, Spark
    expands the sets map-side), with grouping() flags disambiguating
    real NULLs from subtotal NULLs."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("a5_orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*)                               AS n,
               ROUND(SUM(o_totalprice), 2)            AS total
        FROM a5_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


# --------------------------------------------------------------------------
# A5d — UNPIVOT (melt): wide measures -> long (measure, val) rows
# --------------------------------------------------------------------------
@register(
    "a5_unpivot",
    oracle="""
    SELECT l_returnflag, measure,
           ROUND(SUM(val), 2) AS total,
           COUNT(*)           AS n
    FROM (
        SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    ) long
    GROUP BY l_returnflag, measure
    """,
)
def a5_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape with the native UNPIVOT operator (the inverse of
    a5_pivot): map-side row expansion, no shuffle until the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.round(F.sum("val"), 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# A8 — exact percentiles / median. Spark's `percentile` is the exact
# interpolated quantile (a full sort within each group at scale — the
# approx_percentile sketch in A3's family is the 100-TB path; this is the
# correctness anchor), matching DuckDB's quantile_cont.
# --------------------------------------------------------------------------
@register(
    "a8_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           ROUND(median(l_quantity), 4)                  AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a8_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )


# --------------------------------------------------------------------------
# A9 — bivariate statistics: correlation, covariance, and the regr_* family
# (least-squares slope/intercept per group in one pass, no window, no UDF).
# --------------------------------------------------------------------------
@register(
    "a9_corr_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4)  AS qty_price_covar_pop,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS price_at_zero
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a9_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar_pop"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "price_at_zero"
        ),
    )


# --------------------------------------------------------------------------
# A3b — mergeable HLL sketches (DataSketches): per-group sketches union
# into a global estimate WITHOUT rescanning — the sketch property that
# matters at 100 TB (partial sketches merge across partitions, days, or
# tables; approx_count_distinct gives only a final number). Oracle-checked
# via the a3 pattern: the query emits the EXACT count plus a Spark-computed
# tolerance verdict for the sketch estimate (lgK=14 → rsd ≈ 1.04/2^7 ≈
# 0.81%, 3·rsd bound); a broken sketch or union flips within_tol and fails
# the hash. The 'ALL' row's estimate still comes only from hll_union_agg
# over the per-type sketches — the exact global count exists purely to
# judge it.
# --------------------------------------------------------------------------
@register(
    "a3_hll_sketch_merge",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE                    AS within_tol
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL', COUNT(DISTINCT user_id), TRUE FROM events
    """,
)
def a3_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type user sketches plus an 'ALL' row whose estimate comes
    from hll_union_agg over the per-type sketches — never from rescanning
    the events."""
    TOL = 3 * 0.008  # 3·rsd at lgK=14
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    by_type = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").cast("long").alias("approx_users"),
        "exact_users",
    )
    global_exact = events.agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("approx_users"),
    ).crossJoin(global_exact).select(
        F.lit("ALL").alias("event_type"), "approx_users", "exact_users"
    )
    union = by_type.unionByName(merged)
    return union.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            < TOL
        ).alias("within_tol"),
    )


# --------------------------------------------------------------------------
# A11 — equi-width histogram via width_bucket: the one-pass profiling
# primitive (distribution sketch for a numeric column). Bounds come from a
# scalar min/max aggregate (broadcast single row), bucketing is a pure
# expression — the whole histogram is two scans' worth of work, no UDF.
# --------------------------------------------------------------------------
@register(
    "a11_histogram",
    oracle="""
    WITH bounds AS (
        SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    -- DuckDB has no width_bucket; this is Spark's exact formula with the
    -- same IEEE operation order: floor((x - lo) / ((hi - lo) / n)) + 1
    SELECT CAST(floor((o_totalprice - lo) / ((hi - lo) / 20.0)) + 1 AS INTEGER)
               AS bucket,
           COUNT(*)                    AS n,
           ROUND(MIN(o_totalprice), 2) AS bucket_lo,
           ROUND(MAX(o_totalprice), 2) AS bucket_hi
    FROM orders, bounds
    GROUP BY bucket
    """,
)
def a11_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = F.broadcast(
        orders.agg(
            F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
        )
    )
    return (
        orders.crossJoin(bounds)  # single-row scalar subquery
        .select(
            F.width_bucket("o_totalprice", "lo", "hi", F.lit(20))
            .cast("int")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_lo"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_hi"),
        )
    )


# --------------------------------------------------------------------------
# A12 — boolean aggregates: bool_and / bool_or per group (constraint-check
# aggregates — "does EVERY row satisfy X" as a one-pass agg).
# --------------------------------------------------------------------------
@register(
    "a12_bool_aggs",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 0)          AS all_positive,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           bool_and(o_orderdate >= TIMESTAMP '1995-01-01') AS all_after_1995
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a12_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.bool_and(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
        ).alias("all_after_1995"),
    )


# --------------------------------------------------------------------------
# A2b — EXACT distinct counting via mergeable bitmaps: partition user ids
# into 32k-bit buckets (bitmap_bucket_number), build per-bucket bitmaps
# with bitmap_construct_agg, and sum bitmap_count. Unlike COUNT(DISTINCT)
# this is re-aggregable — per-(type, bucket) bitmaps OR together across
# partitions/days (the 'ALL' row below never rescans events) — and unlike
# HLL (a3_*) it is EXACT, so the plain COUNT(DISTINCT) SQL is the oracle.
# --------------------------------------------------------------------------
@register(
    "a2_bitmap_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL', COUNT(DISTINCT user_id) FROM events
    """,
)
def a2_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_bucket = events.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    by_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )
    merged = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))  # merge bitmaps, no rescan
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .select(F.lit("ALL").alias("event_type"), "n_users")
    )
    return by_type.unionByName(merged)


# --------------------------------------------------------------------------
# A13 — equi-DEPTH histogram via ntile: quartile buckets each holding ~25%
# of rows, with their realized value ranges — the complement of A11's
# equi-width form. Exact ntile runs through the range-partitioned operator
# (operators/exact_ntile.py): 2 parallel shuffles + an O(P) offset collect,
# never a single-task global window. For APPROXIMATE equi-depth at scale
# prefer L1's discretizer (percentile_approx bounds broadcast onto the
# scan); this entry differential-tests the exact semantics the
# approximate path approximates.
# --------------------------------------------------------------------------
@register(
    "a13_equidepth_histogram",
    oracle="""
    WITH ranked AS (
        SELECT o_totalprice,
               ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT bucket,
           COUNT(*) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM ranked
    GROUP BY bucket
    """,
)
def a13_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.exact_ntile import with_exact_ntile

    orders = load_table(spark, sf_dir, "orders")
    ranked = with_exact_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        4,
        ["o_totalprice", "o_orderkey"],
        out_col="bucket",
    )
    return (
        ranked.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# A14 — count-min sketch (mergeable frequency sketch, DataFrame-native)
# --------------------------------------------------------------------------
@register(
    "a14_count_min_sketch",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_keys,
           0 AS n_underestimates,
           TRUE AS eps_bound_ok
    FROM events
    """,
)
def a14_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over event user_ids, built with DataFrame ops only.

    d=4 hash rows (xxhash64 seeded by row index), w=64 buckets. The sketch
    is the d x w cell table produced by ONE map-side-combinable groupBy —
    each executor partial-aggregates its partition down to <=256 cells
    before the shuffle, so the shuffle payload is O(d*w) per partition
    regardless of input size: the textbook mergeable-sketch shape for a
    100 TB stream. Estimates = min over hash rows of the key's cell count.

    Verdict columns (oracle = exact + literals): CMS never underestimates
    (n_underestimates must be 0), and every estimate here obeys
    est <= exact + eps*N with eps = e/w (checked exhaustively in Spark;
    the Markov-bound failure probability e^-d is per-key ~1.8% but this
    dataset's hash layout has no violation — deterministic, not luck:
    same hashes every run).
    """
    d_rows, width = 4, 64
    events = load_table(spark, sf_dir, "events")
    keyed = events.select("user_id")
    # Sketch cells: explode each row into its d (row, bucket) coordinates.
    coords = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"),
                        F.pmod(F.xxhash64("user_id", F.lit(i)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(d_rows)
                ]
            )
        ).alias("c")
    ).select("c.h", "c.bucket")
    cells = coords.groupBy("h", "bucket").agg(F.count(F.lit(1)).alias("cell_count"))

    exact = keyed.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    key_coords = exact.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"),
                        F.pmod(F.xxhash64("user_id", F.lit(i)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(d_rows)
                ]
            )
        ).alias("c"),
    ).select("user_id", "exact_n", "c.h", "c.bucket")
    est = (
        key_coords.join(F.broadcast(cells), ["h", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cell_count").alias("est_n"))
    )
    total = events.count()
    eps = 2.718281828 / width
    return est.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("est_n") < F.col("exact_n"), 1).otherwise(0))
        .cast("int")
        .alias("n_underestimates"),
        (
            F.max(F.col("est_n") - F.col("exact_n")) <= F.lit(eps * total)
        ).alias("eps_bound_ok"),
    )


# --------------------------------------------------------------------------
# A15 — deterministic mode (most-frequent value, exact tie-break)
# --------------------------------------------------------------------------
@register(
    "a15_deterministic_mode",
    oracle="""
    WITH counts AS (
        SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY n DESC, o_orderpriority
               ) AS rk
        FROM counts
    )
    SELECT c_mktsegment,
           o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS mode_count
    FROM ranked WHERE rk = 1
    """,
)
def a15_deterministic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode per group with a total tie-break (count desc, value asc)
    — unlike the built-in `mode()` whose tie choice is engine-dependent,
    this formulation is reproducible across engines and runs. Two narrow
    shuffles: the (group, value) count, then the tiny per-group top-1
    window (WindowGroupLimit pushes the rank-1 filter into the sort)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    counts = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


# --------------------------------------------------------------------------
# A16 — mode / count_if / any_value: the profiling trio. mode() is taken
# over lineitem's l_linenumber per return flag, where the distribution is
# strictly decreasing in linenumber (every order has a line 1, only some
# have line 2+), so the mode is UNIQUE and engine tie-breaking never
# matters; any_value() is applied to an expression constant within its
# group, the only shape where its nondeterminism is harmless (and the
# shape that lets Spark drop a whole aggregate buffer).
# --------------------------------------------------------------------------
@register(
    "a16_mode_countif",
    oracle="""
    SELECT l_returnflag,
           CAST(mode(l_linenumber) AS INT)                  AS modal_line,
           CAST(count_if(l_quantity > 25) AS BIGINT)        AS n_bulk_lines,
           any_value(l_returnflag || '-flag')               AS flag_tag,
           COUNT(*)                                         AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a16_mode_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_linenumber").cast("int").alias("modal_line"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk_lines"),
        F.any_value(F.concat_ws("-", "l_returnflag", F.lit("flag"))).alias(
            "flag_tag"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# A17 — rolling-window distinct via mergeable sketch rollup: THE pattern
# for "distinct users over any window" at 100 TB. Computing COUNT(DISTINCT)
# per rolling 7-day window from raw events rescans each event ~7 times;
# instead, sketch ONCE per day (a map-side-combinable agg over the scan),
# then merge the tiny per-day sketches over the window — the rescan cost
# collapses from O(events x window) to O(days x window) on ~KB payloads.
# The oracle computes the exact rolling distinct (self-join day spine x
# events) and the verdict bounds the sketch estimate within 3 x rsd.
# --------------------------------------------------------------------------
@register(
    "a17_sketch_rollup",
    oracle="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
         exact AS (
             SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_users
             FROM days d
             JOIN events e
               ON date_trunc('day', e.ts) > d.day - INTERVAL 7 DAY
              AND date_trunc('day', e.ts) <= d.day
             GROUP BY d.day
         )
    SELECT day, exact_users, TRUE AS within_tol
    FROM exact
    """,
)
def a17_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    TOL = 3 * 0.008  # 3·rsd at lgK=14
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    # One pass over events: per-day sketch + per-day exact (for the oracle's
    # per-window exact we still need the raw events — the verdict needs the
    # approx side only from sketches).
    daily = events.groupBy(day).agg(
        F.hll_sketch_agg("user_id", 14).alias("sketch")
    )
    # Merge each day's trailing 7-day sketch set: a small self-join on the
    # day spine (days x 7 rows), then one union-agg per output day — the
    # events table is NOT rescanned.
    spine = daily.select(F.col("day").alias("out_day"))
    window_sketches = spine.join(
        daily,
        (F.col("day") > F.col("out_day") - F.expr("INTERVAL 7 DAY"))
        & (F.col("day") <= F.col("out_day")),
    )
    approx = window_sketches.groupBy("out_day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias(
            "approx_users"
        )
    )
    # Exact rolling distinct for the verdict comparison (same shape as the
    # oracle's spine join; at scale you would trust the sketch and skip it).
    ev_days = events.select(day, "user_id")
    exact = (
        ev_days.alias("e")
        .join(
            spine.alias("s"),
            (F.col("e.day") > F.col("s.out_day") - F.expr("INTERVAL 7 DAY"))
            & (F.col("e.day") <= F.col("s.out_day")),
        )
        .groupBy("s.out_day")
        .agg(F.countDistinct("e.user_id").alias("exact_users"))
    )
    return (
        exact.join(approx, "out_day")
        .select(
            F.col("out_day").alias("day"),
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                < TOL
            ).alias("within_tol"),
        )
    )


# --------------------------------------------------------------------------
# A18 — join-cardinality estimation via count-min inner product: the
# optimizer technique for sizing a join BEFORE running it. |A ⋈_k B| =
# Σ_k c_A(k)·c_B(k) exactly; the CM estimate is min over hash rows of the
# row-wise cell inner product — computable from two O(d·w) sketches that
# each side builds map-side-combinably in one pass (here: the orders
# self-join on custkey, the classic fan-out blowup a planner must see
# coming). Guarantees emitted as verdicts: the inner product NEVER
# underestimates (colliding keys only add mass) and obeys
# est <= exact + eps·N_A·N_B with eps = e/w. At 100 TB the sketches are
# the only thing that moves — the join itself is never executed.
# --------------------------------------------------------------------------
@register(
    "a18_join_cardinality",
    oracle="""
    SELECT CAST((SELECT SUM(c * c) FROM (
               SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey)) AS BIGINT)
                                                 AS exact_join_rows,
           TRUE                                  AS no_underestimate,
           TRUE                                  AS eps_bound_ok
    """,
)
def a18_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    d_rows, width = 4, 64
    orders = load_table(spark, sf_dir, "orders")
    coords = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"),
                        F.pmod(F.xxhash64("o_custkey", F.lit(i)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(d_rows)
                ]
            )
        ).alias("c")
    ).select("c.h", "c.bucket")
    cells = coords.groupBy("h", "bucket").agg(
        F.count(F.lit(1)).alias("cell_count")
    )
    # Inner product per hash row (self-join: the sketch with itself), then
    # the CM estimate = min over rows. d*w rows total — trivially small.
    est = (
        cells.groupBy("h")
        .agg(F.sum(F.col("cell_count") * F.col("cell_count")).alias("ip"))
        .agg(F.min("ip").alias("est_rows"))
    )
    exact = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_join_rows"))
    )
    n_total = orders.agg(F.count(F.lit(1)).alias("n"))
    eps = math.e / width
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(n_total))
        .select(
            "exact_join_rows",
            (F.col("est_rows") >= F.col("exact_join_rows")).alias(
                "no_underestimate"
            ),
            (
                F.col("est_rows")
                <= F.col("exact_join_rows") + eps * F.col("n") * F.col("n")
            ).alias("eps_bound_ok"),
        )
    )


# --------------------------------------------------------------------------
# A19 — exact decimal money aggregation: revenue math on DECIMAL(18,2),
# not float. Double sums drift with partition count (re-association changes
# the rounding error), so a 1000-executor re-run of a float revenue report
# need not reproduce itself to the cent; decimal sums are EXACT and
# associative — identical on any partitioning, any engine. This query pins
# that contract: unrounded decimal sums, grouped by return flag, matched
# to DuckDB's decimal arithmetic digit-for-digit.
#
# Boundary contract (r13 driver-red root cause): SUM over DECIMAL widens
# past 18 digits (gross: decimal(28,2), net: decimal(34,4)), and DuckDB's
# pandas client DEMOTES any DECIMAL wider than 18 digits to float64 on
# fetch — numerically equal, but the driver's value hash type-tags Decimal
# vs float and fails. So the decimal arithmetic stays internal (exact,
# associative) and ONLY the final sums cross the boundary as strings:
# digit-for-digit comparison with no client-side type demotion on either
# side. See also tests/test_conventions.py, which statically bans any
# oracle returning a bare DECIMAL of precision > 18.
# --------------------------------------------------------------------------
@register(
    "a19_decimal_money",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                                           AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS VARCHAR(64))                               AS gross,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1.00 AS DECIMAL(4,2))
                       - CAST(l_discount AS DECIMAL(4,2))))
                AS VARCHAR(64))                               AS net
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a19_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Both factors become decimal BEFORE any arithmetic: decimal x decimal
    # is exact and associative on both engines, whereas casting a DOUBLE
    # product to decimal inherits the engines' (different) float-rounding
    # modes — measured as a 2-cent drift on 6k rows.
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    rate_dec = F.lit("1.00").cast("decimal(4,2)") - F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(price_dec).cast("string").alias("gross"),
        F.sum(price_dec * rate_dec).cast("string").alias("net"),
    )


# --------------------------------------------------------------------------
# A20 — heavy hitters via per-partition Misra-Gries + exact rescan. The
# two-phase pattern for "tokens above phi = 1/30 of the stream" when the
# vocabulary is too large to count exactly in one pass: each partition
# keeps an m-counter MG summary (m = 64 >= 1/phi, so any global heavy
# hitter MUST survive in >= 1 partition — the MG decrement bound: a token
# evicted everywhere has freq < N/(m+1) < phi*N); the union of survivors
# is a small candidate set; one semi-joined exact count pass filters it to
# the true heavy hitters. The OUTPUT is exact (hence a plain SQL oracle);
# MG only bounds the rescan's candidate set. On this corpus the vocabulary
# (31 tokens) is smaller than m, so MG never evicts — the guarantee is
# what's exercised, not the eviction pressure. Scale: summaries are
# O(m) per partition inside one Arrow stage; the rescan is a semi-join +
# keyed count; the total-count scalar joins via broadcast, not collect.
# --------------------------------------------------------------------------
@register(
    "a20_heavy_hitters",
    oracle="""
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), tot AS (SELECT COUNT(*) AS total FROM t)
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS freq,
           ROUND(COUNT(*) * 1.0 / (SELECT total FROM tot), 4) AS rate
    FROM t
    GROUP BY token
    HAVING COUNT(*) >= CEIL((SELECT total FROM tot) / 30.0)
    """,
)
def a20_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))

    def mg_summaries(batches):
        m = 64  # counters per summary; soundness needs m >= 1/phi = 30
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < m:
                    counters[tok] = 1
                else:
                    for k in list(counters):
                        counters[k] -= 1
                        if counters[k] == 0:
                            del counters[k]
        yield pd.DataFrame({"token": list(counters)})

    candidates = tokens.mapInPandas(mg_summaries, "token string").distinct()
    total = tokens.agg(F.count("*").alias("total"))
    exact = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("freq") >= F.ceil(F.col("total") / F.lit(30.0)))
        .select(
            "token",
            "freq",
            F.round(F.col("freq") / F.col("total"), 4).alias("rate"),
        )
    )


# --------------------------------------------------------------------------
# A21 — mergeable equi-width histogram + quantile estimation with a
# provable error bound. The third mergeable-summary family next to HLL
# (a17) and count-min (a14/a18): per-partition bin counts merge by
# addition (map-side partial agg IS the merge), so one pass + a 64-row
# cumsum answers any quantile to within a bin width — the scan-free
# alternative to exact ntile at 100 TB. The k-th order statistic
# (k = ceil(p·N)) provably lands in the first bin whose cumulative count
# reaches k, and quantile_cont interpolates between order stats at most
# one rank away, so |upper_edge - exact| <= 2·width ALWAYS holds — the
# oracle recomputes the same histogram and pins bound_ok TRUE.
# --------------------------------------------------------------------------
@register(
    "a21_mergeable_histogram",
    oracle="""
    WITH stats AS (
        SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
               COUNT(*) AS n,
               (MAX(o_totalprice) - MIN(o_totalprice)) / 64.0 AS width
        FROM orders
    ), hist AS (
        SELECT LEAST(CAST(FLOOR((o_totalprice - s.lo) / s.width) AS BIGINT),
                     63) AS bin_idx,
               COUNT(*) AS cnt
        FROM orders, stats s
        GROUP BY 1
    ), cum AS (
        SELECT bin_idx, SUM(cnt) OVER (ORDER BY bin_idx) AS cum_cnt
        FROM hist
    ), ex AS (
        SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9]) AS qs
        FROM orders
    ), probs AS (
        SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p,
               generate_subscripts([0.25, 0.5, 0.75, 0.9], 1) AS pi
    ), est AS (
        SELECT p, pi, MIN(bin_idx) AS bin_idx
        FROM probs JOIN cum
          ON cum.cum_cnt >= CEIL(p * (SELECT n FROM stats))
        GROUP BY p, pi
    )
    SELECT e.p,
           CAST(e.bin_idx AS BIGINT) AS bin_idx,
           ROUND(s.lo + (e.bin_idx + 1) * s.width, 4) AS est_upper,
           ABS(s.lo + (e.bin_idx + 1) * s.width - x.qs[e.pi])
               <= 2 * s.width        AS bound_ok
    FROM est e, stats s, ex x
    """,
)
def a21_mergeable_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count("*").alias("n"),
        ((F.max("o_totalprice") - F.min("o_totalprice")) / 64.0).alias("width"),
    )
    hist = (
        orders.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / F.col("width")),
                F.lit(63),
            ).alias("bin_idx")
        )
        .groupBy("bin_idx")
        .agg(F.count("*").alias("cnt"))
    )
    # 64-row post-aggregation cumsum via a bounded triangular self-join —
    # same result as an unpartitioned running-sum window without tripping
    # the single-task WindowExec path (the input is the histogram, never
    # the data, but the join form keeps the sweep log warning-free).
    h2 = hist.select(
        F.col("bin_idx").alias("bin_le"), F.col("cnt").alias("cnt_le")
    )
    cum = (
        hist.join(F.broadcast(h2), F.col("bin_le") <= F.col("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.sum("cnt_le").alias("cum_cnt"))
    )
    probs = spark.createDataFrame([(0.25,), (0.5,), (0.75,), (0.9,)], "p double")
    est = (
        probs.crossJoin(cum.crossJoin(F.broadcast(stats)))
        .filter(F.col("cum_cnt") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p")
        .agg(F.min("bin_idx").alias("bin_idx"))
    )
    exact = orders.agg(
        *[
            F.expr(f"percentile(o_totalprice, {p}D)").alias(f"q{i}")
            for i, p in enumerate((0.25, 0.5, 0.75, 0.9))
        ]
    )
    q_of_p = (
        F.when(F.col("p") == 0.25, F.col("q0"))
        .when(F.col("p") == 0.5, F.col("q1"))
        .when(F.col("p") == 0.75, F.col("q2"))
        .otherwise(F.col("q3"))
    )
    edge = F.col("lo") + (F.col("bin_idx") + 1) * F.col("width")
    return (
        est.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(exact))
        .select(
            "p",
            F.col("bin_idx").cast("bigint").alias("bin_idx"),
            F.round(edge, 4).alias("est_upper"),
            (F.abs(edge - q_of_p) <= 2 * F.col("width")).alias("bound_ok"),
        )
    )


# --------------------------------------------------------------------------
# A22 — GROUPING() subtotal labeling: rollup outputs mix detail rows with
# subtotal rows, and NULL group keys are ambiguous (a real NULL key vs a
# subtotal); GROUPING(col) disambiguates — the standard way a reporting
# layer labels rollup levels. Portable across both engines as written.
# --------------------------------------------------------------------------
@register(
    "a22_grouping_labels",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           CASE WHEN GROUPING(l_returnflag) = 1 THEN 'grand_total'
                WHEN GROUPING(l_linestatus) = 1 THEN 'flag_subtotal'
                ELSE 'detail' END AS level,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a22_grouping_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g_flag = F.grouping("l_returnflag").cast("int")
    g_status = F.grouping("l_linestatus").cast("int")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            g_flag.alias("g_flag"),
            g_status.alias("g_status"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "g_flag",
            "g_status",
            F.when(F.col("g_flag") == 1, "grand_total")
            .when(F.col("g_status") == 1, "flag_subtotal")
            .otherwise("detail")
            .alias("level"),
            "n_rows",
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# A23 — SQL:2003 linear-regression aggregates (regr_slope / regr_intercept
# / regr_r2 / regr_count / regr_avgx / regr_avgy): the NATIVE single-pass
# OLS family (a9 builds the same quantities from corr/stddev by hand;
# this row pins the built-ins against DuckDB's implementations). Per
# returnflag: price-per-quantity fit over lineitem — one
# map-side-combinable agg, no second pass.
# --------------------------------------------------------------------------
@register(
    "a23_regression_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a23_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_qty"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_price"),
    )


# --------------------------------------------------------------------------
# A24 — Arrow-native grouped-agg pandas UDF (pandas_udf GROUPED_AGG): the
# last Python-boundary shape the engine exercises (mapInPandas /
# applyInPandas / cogroup / applyInPandasWithState cover the others).
# The UDAF computes the discounted-revenue mean per returnflag in NumPy
# over Arrow batches and is PINNED against the built-in JVM aggregate in
# the same row: `close` gates |udaf - builtin| < 1e-6 BEFORE rounding, so
# any Arrow transfer or batch-partitioning bug fails the oracle. UDAFs are
# the slow path by doctrine — this row exists to prove the boundary works,
# not as a recommended plan shape; partial aggregation still happens per
# partition before the final per-group concat.
# --------------------------------------------------------------------------
@register(
    "a24_pandas_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(AVG(l_extendedprice * (1 - l_discount)), 2) AS disc_rev_udaf,
           ROUND(AVG(l_extendedprice * (1 - l_discount)), 2)
               AS disc_rev_builtin,
           TRUE AS close
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a24_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def disc_rev_mean(price: pd.Series, disc: pd.Series) -> float:
        return float((price * (1.0 - disc)).mean())

    li = load_table(spark, sf_dir, "lineitem")
    # A grouped-agg pandas UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run the two six-row aggregations
    # separately and broadcast-join on the group key.
    udaf = li.groupBy("l_returnflag").agg(
        disc_rev_mean("l_extendedprice", "l_discount").alias("udaf_raw")
    )
    builtin = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "builtin_raw"
        ),
    )
    agg = builtin.join(F.broadcast(udaf), "l_returnflag")
    return agg.select(
        "l_returnflag",
        "n_rows",
        F.round("udaf_raw", 2).alias("disc_rev_udaf"),
        F.round("builtin_raw", 2).alias("disc_rev_builtin"),
        (F.abs(F.col("udaf_raw") - F.col("builtin_raw")) < 1e-6).alias(
            "close"
        ),
    )


# --------------------------------------------------------------------------
# A25 — SQL:2016 LISTAGG (new native aggregate in Spark 4): ordered string
# concatenation per group, the reporting/export workhorse. Deterministic by
# the WITHIN GROUP (ORDER BY ...) clause; DuckDB's twin is
# string_agg(expr, sep ORDER BY ...). Also exercises the DISTINCT variant.
# Scale note: LISTAGG materializes each group's members into ONE row — by
# contract it belongs on bounded groups (here: 5 nations per region after
# a broadcast join), never on unbounded ones; the unbounded form is A7's
# sorted collect_list, which shares the same caveat.
# --------------------------------------------------------------------------
@register(
    "a25_listagg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name)      AS nations,
           string_agg(DISTINCT substr(n.n_name, 1, 1), ''
                      ORDER BY substr(n.n_name, 1, 1))      AS initials,
           CAST(COUNT(*) AS BIGINT)                         AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def a25_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("nation", "region"))
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',')
                   WITHIN GROUP (ORDER BY n.n_name)          AS nations,
               listagg(DISTINCT substr(n.n_name, 1, 1), '')
                   WITHIN GROUP (ORDER BY substr(n.n_name, 1, 1)) AS initials,
               COUNT(*)                                      AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


# --------------------------------------------------------------------------
# A26 — approx_top_k (Spark 4 native sketch top-k): the heavy-hitter
# primitive as a single mergeable aggregate (a20 hand-builds the same via
# hashed-bucket counting). On a column whose cardinality is far below
# maxItemsTracked the sketch tracks every item exactly, so the estimates
# equal the exact counts and the oracle is the plain GROUP BY top-k —
# the same "sketch is exact in its exact regime" pinning used for a3/d66.
# --------------------------------------------------------------------------
@register(
    "a26_approx_top_k",
    oracle="""
    SELECT event_type, CAST(cnt AS BIGINT) AS cnt
    FROM (
        SELECT event_type, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rk
        FROM events
        GROUP BY event_type
    )
    WHERE rk <= 3
    ORDER BY cnt DESC, event_type
    """,
)
def a26_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_table as _lt

    events = _lt(spark, sf_dir, "events")
    events.createOrReplaceTempView("events_a26")
    # Request k well past the tie frontier (event_type cardinality is ~5,
    # so k=10 tracks every item exactly), then re-rank deterministically on
    # (cnt DESC, event_type) before cutting to 3 — approx_top_k's own
    # boundary tie-break is unspecified, so letting the sketch pick the
    # top-3 would be a data-dependent flake if two types ever tie for 3rd.
    return spark.sql(
        """
        SELECT event_type, cnt
        FROM (
            SELECT t.item AS event_type, t.count AS cnt,
                   ROW_NUMBER() OVER (ORDER BY t.count DESC, t.item) AS rk
            FROM (
                SELECT explode(approx_top_k(event_type, 10)) AS t
                FROM events_a26
            )
        )
        WHERE rk <= 3
        ORDER BY cnt DESC, event_type
        """
    )


# --------------------------------------------------------------------------
# A27 — mergeable quantile-digest ROLLUP (the t-digest/GK family, the
# quantile analogue of a17's HLL-sketch rollup): per-nation equal-weight
# centroid digests of customer balances, MERGED up to region level
# without touching the raw rows again — the shape that answers "region
# p50/p90" at 100 TB from nation-level summaries instead of a re-scan.
# The digest is DETERMINISTIC (sorted values chunked into K equal-count
# groups; merge = weight-sorted re-chunk at equal cumulative weight), so
# the verdict is stable: both estimates must land within 8% of the
# region's value range of the exact interpolated percentile. Exact
# percentiles are SQL-exact on both engines (Spark `percentile` and
# DuckDB `quantile_cont` are the same linear interpolation).
# Scale: stage 1 is a keyed Arrow-batched agg emitting K rows per
# nation (map-side-combinable shape); stage 2 merges 25*K tiny rows per
# region — the raw table is scanned exactly once.
# --------------------------------------------------------------------------
_A27_K = 16


def _a27_digest(pdf: pd.DataFrame) -> pd.DataFrame:
    """One nation's equal-weight centroid digest: sort, chunk into K
    equal-count groups, emit (mean, weight) per group."""
    import numpy as np

    vals = np.sort(pdf["c_acctbal"].to_numpy(dtype="float64"))
    chunks = np.array_split(vals, min(_A27_K, len(vals)))
    return pd.DataFrame(
        {
            "n_regionkey": pdf["n_regionkey"].iloc[0],
            "mean": [float(c.mean()) for c in chunks if len(c)],
            "weight": [int(len(c)) for c in chunks if len(c)],
        }
    )


def _a27_merge_quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
    """Merge one region's nation digests and read p50/p90 off the merged
    digest: centroids sorted by mean, re-compressed to K equal-weight
    clusters, quantile = mean of the cluster holding the target rank."""
    import numpy as np

    d = pdf.sort_values("mean")
    means = d["mean"].to_numpy(dtype="float64")
    weights = d["weight"].to_numpy(dtype="float64")
    total = weights.sum()
    # Re-compress: greedy equal-cumulative-weight clustering to K.
    budget = total / _A27_K
    merged_m: list[float] = []
    merged_w: list[float] = []
    acc_w = 0.0
    acc_mw = 0.0
    for m, w in zip(means, weights):
        acc_w += w
        acc_mw += m * w
        if acc_w >= budget:
            merged_m.append(acc_mw / acc_w)
            merged_w.append(acc_w)
            acc_w = acc_mw = 0.0
    if acc_w > 0:
        merged_m.append(acc_mw / acc_w)
        merged_w.append(acc_w)
    cum = np.cumsum(merged_w)

    def q(p: float) -> float:
        target = p * total
        idx = int(np.searchsorted(cum, target))
        return float(merged_m[min(idx, len(merged_m) - 1)])

    return pd.DataFrame(
        {
            "n_regionkey": [int(pdf["n_regionkey"].iloc[0])],
            "est_p50": [q(0.5)],
            "est_p90": [q(0.9)],
        }
    )


@register(
    "a27_quantile_digest_rollup",
    oracle="""
    WITH cust AS (
        SELECT r.r_name AS region, c.c_acctbal AS bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT region,
           CAST(COUNT(*) AS BIGINT)                    AS n_customers,
           ROUND(quantile_cont(bal, 0.5), 4)           AS exact_p50,
           ROUND(quantile_cont(bal, 0.9), 4)           AS exact_p90,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM cust GROUP BY region
    """,
)
def a27_quantile_digest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    base = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("n_nationkey", "n_regionkey", "c_acctbal")
    digests = base.groupBy("n_nationkey").applyInPandas(
        _a27_digest, "n_regionkey int, mean double, weight long"
    )
    est = digests.groupBy("n_regionkey").applyInPandas(
        _a27_merge_quantiles, "n_regionkey int, est_p50 double, est_p90 double"
    )
    exact = base.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.expr("percentile(c_acctbal, 0.5)").alias("x50"),
        F.expr("percentile(c_acctbal, 0.9)").alias("x90"),
        (F.max("c_acctbal") - F.min("c_acctbal")).alias("rng"),
    )
    tol = F.col("rng") * 0.08
    return (
        exact.join(est, "n_regionkey")
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            "n_customers",
            F.round("x50", 4).alias("exact_p50"),
            F.round("x90", 4).alias("exact_p90"),
            (F.abs(F.col("est_p50") - F.col("x50")) <= tol).alias("p50_ok"),
            (F.abs(F.col("est_p90") - F.col("x90")) <= tol).alias("p90_ok"),
        )
    )


# --------------------------------------------------------------------------
# A28 — THETA/KMV SKETCH SET OPERATIONS: mergeable distinct-count
# sketches that support UNION, INTERSECTION and DIFFERENCE — the
# operation HLL union (a3) cannot give you (HLL only unions; Theta is
# what Druid/DataSketches deploy when segment-level audience sketches
# must be intersected). KMV keeps the k smallest normalized hashes of
# each set; theta = the k-th smallest. Union: merge, re-truncate to k.
# Intersection: count common hashes below min(theta_a, theta_b) and
# divide by that theta (each surviving hash witnesses 1/theta distinct
# values). Difference: estimate(A) - estimate(intersection). When a
# side holds fewer than k distinct values its sketch is EXACT (theta
# saturates at 1) — pinned at sf0.001/0.01 where n < k. xxhash64 is
# deterministic, so the estimates are fixed numbers per dataset and the
# error-bound verdicts are stable, not stochastic. The exact arm
# (count-distinct + semi-join) is the referee, as in d3/d63.
# Scale: each sketch is k=128 longs produced by TakeOrderedAndProject
# (per-partition top-k, then merge — no full sort, no full shuffle);
# set algebra happens on 2x128 driver-side values, O(1) whatever the
# table size. The exact arm exists only as the verdict's referee.
# --------------------------------------------------------------------------
@register(
    "a28_theta_sketch_setops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND value > 60),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 30)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a)  AS n_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b)  AS n_b,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM a WHERE user_id IN (SELECT user_id FROM b)) AS n_inter,
           TRUE AS union_ok, TRUE AS inter_ok, TRUE AS diff_ok
    """,
)
def a28_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 128
    ev = load_table(spark, sf_dir, "events")
    # Each side feeds THREE consumers (sketch top-k, exact count, the
    # referee semi-join) — cache so the scan+distinct shuffle runs once.
    a_set = (
        ev.filter((F.col("event_type") == "click") & (F.col("value") > 60))
        .select("user_id")
        .distinct()
        .cache()
    )
    b_set = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 30))
        .select("user_id")
        .distinct()
        .cache()
    )

    def kmv(df):
        # Normalized hash in [0, 1); k smallest via TakeOrderedAndProject.
        u = (F.xxhash64("user_id") / F.lit(float(2**64)) + F.lit(0.5)).alias("u")
        return [r["u"] for r in df.select(u).orderBy("u").limit(k).collect()]

    def estimate(sk):
        # Saturated sketch (< k values): exact by construction.
        return float(len(sk)) if len(sk) < k else (k - 1) / sk[k - 1]

    sk_a, sk_b = kmv(a_set), kmv(b_set)
    est_a = estimate(sk_a)
    merged = sorted(set(sk_a) | set(sk_b))[:k]
    est_union = float(len(merged)) if len(merged) < k else (k - 1) / merged[k - 1]
    theta = min(
        sk_a[k - 1] if len(sk_a) == k else 1.0,
        sk_b[k - 1] if len(sk_b) == k else 1.0,
    )
    matches = sum(1 for h in set(sk_a) & set(sk_b) if h < theta)
    est_inter = matches / theta
    est_diff = est_a - est_inter

    # Exact referee arm.
    n_a = a_set.count()
    n_b = b_set.count()
    n_inter = a_set.join(b_set, "user_id", "left_semi").count()
    n_union = n_a + n_b - n_inter
    # Everything downstream is driver-side arithmetic over the collected
    # sketches/counts — release the cached sides instead of retaining
    # them across a 396-row sweep session.
    a_set.unpersist()
    b_set.unpersist()

    # 1/sqrt(k) ~ 8.8%; 3 sigma plus a 2-value absolute floor for the
    # tiny-SF regimes where one hash is a whole percent.
    def ok(est, exact, scale):
        return abs(est - exact) <= max(3.0 / (k**0.5) * scale, 2.0)

    return spark.createDataFrame(
        [(
            n_a, n_b, n_union, n_inter,
            bool(ok(est_union, n_union, n_union)),
            bool(ok(est_inter, n_inter, n_union)),
            bool(ok(est_diff, n_a - n_inter, n_union)),
        )],
        "n_a bigint, n_b bigint, n_union bigint, n_inter bigint,"
        " union_ok boolean, inter_ok boolean, diff_ok boolean",
    )


# --------------------------------------------------------------------------
# A29 — COUNT-MIN SKETCH heavy hitters (Cormode & Muthukrishnan 2005):
# the mergeable frequency sketch that completes this registry's sketch
# alphabet (a2 bitmap, a3 HLL, a17 rollup, a21 histogram, a26 top-k,
# a27 q-digest, a28 theta). d = 4 hash rows x w = 64 counters; item
# stream = orders.o_custkey; estimate(k) = min over rows of the cell
# count. Hashes are md5-derived (engine-portable), so the WHOLE sketch —
# not just its error bound — is a deterministic pure function of the
# data: the oracle rebuilds the identical 256 cells in SQL and the
# one-sided guarantee (est >= exact, always) plus the actual
# overestimate are hash-exact columns, no probabilistic verdict needed.
# Scale: the sketch build is ONE map-side-combinable groupBy collapsing
# any stream to d*w = 256 cells (the whole point of CM at 100 TB: the
# shuffle carries 256 rows no matter the input); query keys join against
# those 256 cells broadcast. Sketches from shards union+re-sum to the
# same cells — mergeability is free from the cell-key layout.
# --------------------------------------------------------------------------
_A29_D, _A29_W = 4, 64


@register(
    "a29_countmin_heavy_hitters",
    oracle="""
    WITH items AS (
        SELECT o_custkey AS k FROM orders
    ), js AS (
        SELECT unnest(range(4)) AS j
    ), cells AS (
        SELECT j,
               CAST(('0x' || substr(md5(j || ':' || CAST(k AS VARCHAR)),
                                    1, 8)) AS BIGINT) % 64 AS c,
               COUNT(*) AS n
        FROM items, js
        GROUP BY 1, 2
    ), q AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS exact
        FROM items WHERE k % 97 = 0 GROUP BY k
    ), est AS (
        SELECT q.k, q.exact, MIN(cells.n) AS est
        FROM q
        JOIN js ON TRUE
        JOIN cells
          ON cells.j = js.j
         AND cells.c = CAST(('0x' || substr(md5(js.j || ':'
                            || CAST(q.k AS VARCHAR)), 1, 8)) AS BIGINT) % 64
        GROUP BY q.k, q.exact
    )
    SELECT k, exact,
           CAST(est AS BIGINT)         AS est,
           CAST(est - exact AS BIGINT) AS overestimate,
           est >= exact                AS never_under
    FROM est
    """,
)
def a29_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, w = _A29_D, _A29_W

    def bucket(j_col, k_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(j_col.cast("string"), F.lit(":"),
                                   k_col.cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % w
        )

    items = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    # Sketch build: explode each item to its d (row, col) cells, then ONE
    # map-side-combinable groupBy -> 256 rows total.
    exploded = items.select(
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"), "k"
    ).select("j", bucket(F.col("j"), F.col("k")).alias("c"))
    cells = exploded.groupBy("j", "c").agg(F.count(F.lit(1)).alias("n"))
    # Deterministic query set + exact referee counts.
    q = (
        items.filter(F.col("k") % 97 == 0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    probes = q.select(
        "k", "exact",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    ).select("k", "exact", "j", bucket(F.col("j"), F.col("k")).alias("c"))
    est = (
        probes.join(F.broadcast(cells), ["j", "c"])
        .groupBy("k", "exact")
        .agg(F.min("n").alias("est"))
    )
    return est.select(
        "k", "exact",
        F.col("est").cast("bigint").alias("est"),
        (F.col("est") - F.col("exact")).cast("bigint").alias("overestimate"),
        (F.col("est") >= F.col("exact")).alias("never_under"),
    )


# --------------------------------------------------------------------------
# A30 — approx-percentile rank-error gate (r16): the contract check the
# sketch family was missing. percentile_approx is how a 100 TB plan gets
# quantile thresholds (one mergeable pass — exact percentiles would
# sort), and its guarantee is a RANK bound: the returned element's rank
# is within n/accuracy of the target rank. This row verifies that
# contract DISTRIBUTIVELY: one sketch agg produces the candidates, one
# more scan counts each candidate's tie-class [count(<v)+1, count(<=v)]
# and checks it intersects [floor((q-eps)n), ceil((q+eps)n)], eps =
# 1/accuracy — the d109 release-gate pattern (a second full pass, never
# a sort). The output carries only (q, n, verdict): the approx VALUES
# stay out of the hashed result on purpose — the sketch's merge order
# is an engine internal, the contract is not.
# --------------------------------------------------------------------------
@register(
    "a30_approx_percentile_rank_gate",
    oracle="""
    SELECT q, CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n,
           true AS within_contract
    FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)
    ORDER BY q
    """,
)
def a30_approx_percentile_rank_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ACC = 1000
    QS = (0.5, 0.9, 0.99)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    sketch = li.agg(
        F.percentile_approx("x", F.array(*[F.lit(q) for q in QS]), ACC).alias(
            "vs"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    probes = li.crossJoin(F.broadcast(sketch)).select(
        "n",
        *[
            F.when(F.col("x") < F.element_at("vs", i + 1), 1)
            .otherwise(0)
            .alias(f"lt{i}")
            for i in range(len(QS))
        ],
        *[
            F.when(F.col("x") <= F.element_at("vs", i + 1), 1)
            .otherwise(0)
            .alias(f"le{i}")
            for i in range(len(QS))
        ],
    )
    counted = probes.groupBy("n").agg(
        *[F.sum(f"lt{i}").alias(f"rank_lo{i}") for i in range(len(QS))],
        *[F.sum(f"le{i}").alias(f"rank_hi{i}") for i in range(len(QS))],
    )
    per_q = []
    for i, q in enumerate(QS):
        eps = 1.0 / ACC
        lo_ok = F.col(f"rank_hi{i}") >= F.floor((q - eps) * F.col("n"))
        hi_ok = F.col(f"rank_lo{i}") + 1 <= F.ceil((q + eps) * F.col("n"))
        per_q.append(
            F.struct(
                F.lit(q).alias("q"),
                F.col("n").cast("bigint").alias("n"),
                (lo_ok & hi_ok).alias("within_contract"),
            )
        )
    return (
        counted.select(F.explode(F.array(*per_q)).alias("r"))
        .select("r.q", "r.n", "r.within_contract")
        .orderBy("q")
    )
