"""Set operations (SURVEY.md §2g rows U1-U3), incl. the ALL variants.

Scale notes: UNION ALL is a zero-shuffle concatenation of scans; the
distinct variants and INTERSECT/EXCEPT (ALL) hash-shuffle on the full row —
at 100 TB these partition on the projected key set, so the projections below
deliberately prune to the join keys before the set op (column pruning keeps
the shuffle payload minimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


def _keys(spark: SparkSession, sf_dir: str, table: str, col: str) -> DataFrame:
    return load_table(spark, sf_dir, table).select(F.col(col).alias("nationkey"))


# --------------------------------------------------------------------------
# U1 — UNION (distinct) and UNION ALL
# --------------------------------------------------------------------------
@register(
    "u1_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _keys(spark, sf_dir, "customer", "c_nationkey")
    s = _keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.unionByName(s).distinct()


@register(
    "u1_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _keys(spark, sf_dir, "customer", "c_nationkey")
    s = _keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# U2 — INTERSECT and INTERSECT ALL
# --------------------------------------------------------------------------
@register(
    "u2_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _keys(spark, sf_dir, "customer", "c_nationkey")
    s = _keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.intersect(s)


@register(
    "u2_intersect_all",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    INTERSECT ALL
    SELECT c_nationkey FROM customer
    """,
)
def u2_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _keys(spark, sf_dir, "customer", "c_nationkey")
    s = _keys(spark, sf_dir, "supplier", "s_nationkey")
    return s.intersectAll(c)


# --------------------------------------------------------------------------
# U3 — EXCEPT and EXCEPT ALL
# --------------------------------------------------------------------------
@register(
    "u3_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _keys(spark, sf_dir, "customer", "c_nationkey")
    s = _keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.subtract(s)


@register(
    "u3_except_all",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    EXCEPT ALL
    SELECT c_nationkey FROM customer
    """,
)
def u3_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _keys(spark, sf_dir, "customer", "c_nationkey")
    s = _keys(spark, sf_dir, "supplier", "s_nationkey")
    return s.exceptAll(c)


# --------------------------------------------------------------------------
# U4 — union across schema drift: unionByName(allowMissingColumns=True).
# The schema-evolution primitive for training corpora collected over time:
# v1 rows lack columns added in v2 and surface them as NULLs, position
# never matters. The oracle reconstructs the same fill with typed NULLs.
# --------------------------------------------------------------------------
@register(
    "u4_union_schema_drift",
    oracle="""
    SELECT lang,
           COUNT(*)                                   AS n_rows,
           COUNT(source)                              AS n_with_source,
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)                            AS n_missing_chars
    FROM (
        SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
               CAST(NULL AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, lang, source, n_chars
        FROM documents WHERE doc_id % 2 = 1
    ) drifted
    GROUP BY lang
    """,
)
def u4_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source", "n_chars"
    )
    drifted = v1.unionByName(v2, allowMissingColumns=True)
    return drifted.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("source").alias("n_with_source"),
        F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0)).alias(
            "n_missing_chars"
        ),
    )


# --------------------------------------------------------------------------
# U5 — keyed snapshot diff / reconciliation: classify every key across two
# table versions as added / removed / changed / unchanged — the audit a
# pipeline runs after a backfill before swapping a serving table (d21
# builds the merge; this verifies one). Snapshot B is a deterministic
# mutation of orders (price bump on o_orderkey % 7 == 0, drop % 11 == 0,
# with % 13 == 0 keys treated as new arrivals), so the oracle reproduces
# the exact same pair of versions. Lowering: ONE full-outer join on the
# key + a CASE classification + keyed count — no row ever leaves its
# executor twice.
# --------------------------------------------------------------------------
@register(
    "u5_snapshot_diff",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS k, o_totalprice AS v FROM orders
        WHERE o_orderkey % 13 != 0
    ), b AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS v
        FROM orders WHERE o_orderkey % 11 != 0
    ), classified AS (
        SELECT CASE
                 WHEN a.k IS NULL THEN 'added'
                 WHEN b.k IS NULL THEN 'removed'
                 WHEN a.v != b.v  THEN 'changed'
                 ELSE 'unchanged'
               END AS status
        FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n
    FROM classified GROUP BY status
    """,
)
def u5_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("va")
    )
    b = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("vb"),
    )
    status = (
        F.when(F.col("va").isNull(), "added")
        .when(F.col("vb").isNull(), "removed")
        .when(F.col("va") != F.col("vb"), "changed")
        .otherwise("unchanged")
    )
    return (
        a.join(b, "k", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )
