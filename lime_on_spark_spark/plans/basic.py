"""Projection / predicate / conditional plans (SURVEY.md §2b rows P1, P3-P5).

All four are single-table scans with sargable predicates — Catalyst pushes
every filter and the column prune into the parquet scan, so each runs as one
WholeStageCodegen stage with no shuffle (except the final tiny group-by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# P1 — projection, aliasing, computed columns
# --------------------------------------------------------------------------
@register(
    "p1_projection",
    oracle="""
    SELECT p_partkey,
           p_name,
           upper(p_brand)                                   AS brand_uc,
           ROUND(p_retailprice * 1.1, 2)                    AS taxed_price,
           p_size * 2                                       AS double_size
    FROM part
    WHERE p_size >= 10
    """,
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size") >= 10).select(
        "p_partkey",
        "p_name",
        F.upper("p_brand").alias("brand_uc"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("taxed_price"),
        (F.col("p_size") * 2).alias("double_size"),
    )


# --------------------------------------------------------------------------
# P3 — LIKE / regexp predicates + regexp_extract
# --------------------------------------------------------------------------
@register(
    "p3_like_regexp",
    oracle="""
    SELECT regexp_extract(p_name, '^(\\w+)', 1)  AS color,
           p_type,
           COUNT(*)                               AS n_parts,
           ROUND(AVG(p_retailprice), 2)           AS avg_price
    FROM part
    WHERE p_name LIKE '%gear%' OR regexp_matches(p_name, '^(red|blue)')
    GROUP BY color, p_type
    """,
)
def p3_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").like("%gear%") | F.col("p_name").rlike("^(red|blue)")
        )
        .groupBy(
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("color"),
            "p_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# P4 — CASE WHEN / conditional expressions
# --------------------------------------------------------------------------
@register(
    "p4_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END                   AS price_band,
           o_orderstatus,
           COUNT(*)                               AS n_orders,
           ROUND(SUM(o_totalprice), 2)            AS total
    FROM orders
    GROUP BY price_band, o_orderstatus
    """,
)
def p4_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return orders.groupBy(
        band.alias("price_band"), "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# O1 — global sort (range-partitioned total order, no limit)
# --------------------------------------------------------------------------
@register(
    "o1_global_sort",
    oracle="""
    SELECT s_suppkey,
           s_name,
           ROUND(s_acctbal, 2)                              AS acctbal,
           s_nationkey
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order via range partitioning (Exchange rangepartitioning +
    per-partition sort) — distributed, never a single-partition sort. The
    oracle hash is order-insensitive; the unique (s_acctbal, s_suppkey)
    key makes the order itself deterministic for consumers."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        "s_name",
        F.round("s_acctbal", 2).alias("acctbal"),
        "s_nationkey",
    ).orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))


# --------------------------------------------------------------------------
# P5 — null-safe equality (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------
@register(
    "p5_nullsafe_eq",
    oracle="""
    SELECT (nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_linestatus, 'O'))
               AS ns_eq,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ns_eq
    """,
)
def p5_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ns_eq = F.nullif(F.col("l_returnflag"), F.lit("N")).eqNullSafe(
        F.nullif(F.col("l_linestatus"), F.lit("O"))
    )
    return li.groupBy(ns_eq.alias("ns_eq")).agg(F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------------
# S3 — catalog view registration + the SQL-string interface over it
# --------------------------------------------------------------------------
@register(
    "s3_sql_over_views",
    oracle="""
    SELECT r_name,
           COUNT(*)                                          AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT)                  AS key_sum
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def s3_sql_over_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registers every table as a temp view (S3) and answers with
    spark.sql(...) — the engine's SQL-string front door. The SQL text is
    identical ANSI on both engines."""
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, register=True)
    return spark.sql(
        """
        SELECT r_name,
               COUNT(*)                   AS n_nations,
               SUM(n_nationkey)           AS key_sum
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


# --------------------------------------------------------------------------
# P7 — ANSI-safe arithmetic: Spark 4 runs ANSI mode ON, so raw division by
# zero THROWS mid-job — at 100 TB one bad row kills a 6-hour run. The try_*
# family returns NULL instead, making bad denominators a data-quality
# metric rather than a crash. Oracle reconstructs with CASE WHEN.
# --------------------------------------------------------------------------
@register(
    "p7_try_arithmetic",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN ship_days IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_day,
           ROUND(ROUND(AVG(price_per_day), 6), 2) AS avg_price_per_day
    FROM (
        SELECT o.o_orderpriority,
               CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) = 0
                    THEN NULL
                    ELSE datediff('day', o.o_orderdate, l.l_shipdate) END
                   AS ship_days,
               CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) = 0
                    THEN NULL
                    ELSE l.l_extendedprice
                         / datediff('day', o.o_orderdate, l.l_shipdate) END
                   AS price_per_day
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ) t
    GROUP BY o_orderpriority
    """,
)
def p7_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    joined = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderpriority",
        F.nullif(days, F.lit(0)).alias("ship_days"),
        F.try_divide("l_extendedprice", F.nullif(days, F.lit(0))).alias(
            "price_per_day"
        ),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("ship_days").isNull(), 1).otherwise(0)).alias(
            "n_same_day"
        ),
        # Double-round (6dp then 2dp) on BOTH sides: the raw double AVG can
        # differ between engines by ~1 ulp from summation order; a direct
        # 2dp round one ulp from a .xx5 boundary then flips between them.
        # Snapping to 6dp first makes a 2dp tie require the average to sit
        # within 1 ulp of an exact .xx5000 value — 10^4× less likely.
        F.round(F.round(F.avg("price_per_day"), 6), 2).alias("avg_price_per_day"),
    )


# --------------------------------------------------------------------------
# P8 — three-valued-logic semantics: the NULL edge cases every engine must
# agree on (and where hand-rolled predicate pushdown usually breaks).
# x = NULLIF(o_custkey % 3, 0) injects NULLs; the summary pins COUNT vs
# COUNT(col), IN/NOT IN with a NULL in the list (NOT IN is famously
# never-true when the list contains NULL and x isn't matched), null-safe
# equality, and DISTINCT-FROM arithmetic — one row, all engine-portable.
# --------------------------------------------------------------------------
@register(
    "p8_null_semantics",
    oracle="""
    WITH t AS (
        SELECT NULLIF(o_custkey % 3, 0) AS x, o_totalprice AS v
        FROM orders
    )
    SELECT COUNT(*)                                          AS n_rows,
           COUNT(x)                                          AS n_nonnull,
           CAST(SUM(CASE WHEN x IN (1, NULL) THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_in_with_null,
           CAST(SUM(CASE WHEN x NOT IN (1, NULL) THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_notin_with_null,
           CAST(SUM(CASE WHEN x IS DISTINCT FROM 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_distinct_from_1,
           CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_null,
           ROUND(SUM(CASE WHEN x = 1 THEN v END), 2)         AS v_eq_1
    FROM t
    """,
)
def p8_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = F.nullif(F.col("o_custkey") % 3, F.lit(0))
    t = orders.select(x.alias("x"), F.col("o_totalprice").alias("v"))
    in_with_null = F.col("x").isin(1, None)
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("x").alias("n_nonnull"),
        F.sum(F.when(in_with_null, 1).otherwise(0)).cast("bigint").alias(
            "n_in_with_null"
        ),
        F.sum(F.when(~in_with_null, 1).otherwise(0)).cast("bigint").alias(
            "n_notin_with_null"
        ),
        F.sum(
            F.when(~F.col("x").eqNullSafe(F.lit(1)), 1).otherwise(0)
        ).cast("bigint").alias("n_distinct_from_1"),
        F.sum(F.when(F.col("x").isNull(), 1).otherwise(0)).cast("bigint").alias(
            "n_null"
        ),
        F.round(F.sum(F.when(F.col("x") == 1, F.col("v"))), 2).alias("v_eq_1"),
    )


# --------------------------------------------------------------------------
# P9 — try_cast family: ANSI mode makes bad casts FAIL THE JOB (the right
# default at scale — silent NULLs hide data bugs), so ingest paths that
# expect dirty values must opt into tolerance explicitly. Here the JSON
# props field (and a deliberately mangled variant of it) goes through
# try_cast to bigint/date: parseable values survive, garbage becomes NULL,
# the job never dies. DuckDB's TRY_CAST has identical semantics, so every
# branch is oracle-pinned.
# --------------------------------------------------------------------------
@register(
    "p9_try_cast",
    oracle="""
    SELECT event_type,
           COUNT(*)                                          AS n_rows,
           CAST(SUM(CASE WHEN TRY_CAST(props ->> '$.k' AS BIGINT)
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_numeric,
           CAST(SUM(COALESCE(TRY_CAST(props ->> '$.k' AS BIGINT), 0))
                AS BIGINT)                                   AS sum_k,
           CAST(SUM(CASE WHEN TRY_CAST('x' || CAST(event_id AS VARCHAR)
                                       AS BIGINT) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)       AS n_unparseable
    FROM events
    GROUP BY event_type
    """,
)
def p9_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Column.try_cast (Spark 4) — functions module has no free try_cast.
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    bad = F.concat(F.lit("x"), F.col("event_id").cast("string")).try_cast("bigint")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(k.isNotNull().cast("int")).cast("bigint").alias("n_numeric"),
        F.sum(F.coalesce(k, F.lit(0))).cast("bigint").alias("sum_k"),
        F.sum(bad.isNull().cast("int")).cast("bigint").alias("n_unparseable"),
    )
