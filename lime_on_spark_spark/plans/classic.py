"""Classic decision-support queries q7-q22 (TPC-H-shaped, adapted to the
driver corpus — no partsupp table, no commit/receipt dates, so q9/q11/q16/
q20 are out of scope and q21/q22 use adapted predicates with the same join
structure).

Widens SURVEY.md §2 rows J1-J4 (multi-join chains, broadcast dims), P2
(disjunctive predicates), A1/A6 (two-level and conditional aggregates), O2
(deterministic top-k), and the correlated-subquery surface (q17/q18/q21/q22:
scalar subquery, IN, EXISTS, NOT EXISTS).

Scale notes: dimension tables (nation, region) carry explicit
``F.broadcast`` hints — they are bounded by geography, never by data scale.
Unbounded sides (customer, supplier, part, orders, lineitem) get NO forced
hint; AQE converts to broadcast at runtime when a filtered side is actually
small. Correlated subqueries are re-expressed as aggregate-then-join
(q17/q18) or semi/anti joins on the correlation key (q21/q22) so each is a
single keyed shuffle, not a per-row probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q7 — volume shipping between two nations (J1 fact-fact chain + J4 dims)
# --------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    shipped = (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        shipped.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q8 — national market share within a region (conditional share aggregate)
# --------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
          AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    ))
    asia = F.broadcast(region.filter(F.col("r_name") == "ASIA"))
    rows = (
        li.join(part.filter(F.col("p_type") == "ECONOMY"),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.filter(
                F.col("o_orderdate").between(
                    F.lit("1996-01-01").cast("timestamp"),
                    F.lit("1997-12-31").cast("timestamp"),
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(asia, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    return rows.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# q13 — customer order-count distribution (outer join + double aggregation)
# --------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q14 — promo revenue share (conditional aggregate over a fact-dim join)
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# q15 — top supplier by quarterly revenue (agg + scalar-max equality)
# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    # Rounding BEFORE the max-equality comparison keeps the float compare
    # stable across engines (summation order differs; 2dp absorbs the ulp).
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("total_revenue")
        )
    )
    top = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_revenue")))
    return (
        revenue.crossJoin(top)  # single-row scalar subquery, not a cartesian
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q17 — small-quantity-order revenue (correlated scalar subquery -> agg-join)
# --------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND p.p_size < 15
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    fparts = part.filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") < 15))
    # Restrict lineitem to the filtered parts FIRST, then compute each
    # part's average quantity from that slice — avg over a part's lineitems
    # is unchanged by the semi-restriction, and the global per-part agg
    # never materializes for parts the filter discards.
    li_f = li.join(fparts.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
    thresholds = li_f.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li_f.join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# q18 — large-volume customers (IN subquery with HAVING -> semi join)
# --------------------------------------------------------------------------
@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_orderkey")
    )
    qualified = orders.join(
        big.withColumnRenamed("l_orderkey", "b_orderkey"),
        F.col("o_orderkey") == F.col("b_orderkey"),
        "left_semi",
    )
    return (
        cust.join(qualified, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19 — discounted revenue under disjunctive brand/size/quantity predicates
# --------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    # Pre-filter each side with the union of its single-table predicates so
    # the scans prune before the join; the full disjunction re-applies after.
    li_pre = li.filter(F.col("l_quantity").between(1, 50))
    part_pre = part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#13", "Brand#20")
    )
    return (
        li_pre.join(part_pre, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q21 — suppliers who shipped last in shared orders (EXISTS + NOT EXISTS).
# Adapted: corpus has no commit/receipt dates, so "kept waiting" = this
# supplier has the latest ship date among the suppliers of a finished
# multi-supplier order. Same semi+anti structure as the original.
# --------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_3'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3_key"),
        F.col("l_suppkey").alias("s3_key"),
        F.col("l_shipdate").alias("d3"),
    )
    # EXISTS: some other supplier in the same order (equi on orderkey,
    # residual on suppkey) — a keyed semi join, no per-row probe.
    with_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_key"))
        & (F.col("l_suppkey") != F.col("s2_key")),
        "left_semi",
    )
    # NOT EXISTS: no other supplier shipped later — keyed anti join.
    latest = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("o3_key"))
        & (F.col("l_suppkey") != F.col("s3_key"))
        & (F.col("d3") > F.col("l_shipdate")),
        "left_anti",
    )
    n3 = F.broadcast(nation.filter(F.col("n_name") == "NATION_3"))
    return (
        latest.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n3, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q22 — dormant high-balance customers (scalar subquery + NOT EXISTS).
# Adapted: corpus has no c_phone, so the "country code" is the last two
# digits of c_name ('Customer#000000042' -> '42'); and every customer has
# orders at all SFs, so "dormant" = no URGENT orders (the NOT EXISTS keeps
# its correlated-with-predicate shape instead of vacuously matching nobody).
# --------------------------------------------------------------------------
@register(
    "q22_dormant_customers",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
        SELECT substr(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
        FROM customer c
        WHERE substr(c.c_name, 17, 2) IN ('00', '11', '22', '33', '44', '55', '66')
          AND c.c_acctbal > (
              SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
          )
    ) custsale
    GROUP BY cntrycode
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    code = F.substring("c_name", 17, 2)
    avg_bal = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0.0).agg(
            F.avg("c_acctbal").alias("avg_bal")
        )
    )
    candidates = (
        cust.withColumn("cntrycode", code)
        .filter(F.col("cntrycode").isin("00", "11", "22", "33", "44", "55", "66"))
        .crossJoin(avg_bal)  # single-row scalar subquery
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    dormant = candidates.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return dormant.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# --------------------------------------------------------------------------
# q2 — minimum-cost supplier (adapted: no partsupp table, so the per-
# (part, supplier) supply cost is derived from lineitem as the observed
# avg unit price; the correlated MIN subquery keeps its shape).
# --------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               ROUND(AVG(l_extendedprice / l_quantity), 4) AS supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           ps.supplycost
    FROM part p
    JOIN ps         ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15
      AND r.r_name = 'ASIA'
      AND ps.supplycost = (
          SELECT MIN(ps2.supplycost)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    # Rounding supplycost BEFORE the min-equality compare keeps the float
    # equality stable across engines (q15 pattern).
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4)
        .alias("supplycost")
    )
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    # Region-restricted (part, supplier, cost) triples: suppliers joined to
    # the bounded geography dim; AQE may broadcast the filtered supplier side.
    asia_ps = (
        ps.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    # Correlated MIN -> per-part aggregate + equality join (one keyed
    # shuffle on partkey, no per-row probe).
    min_cost = asia_ps.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        asia_ps.join(
            min_cost,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .join(part.filter(F.col("p_size") == 15), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q9 — product-type profit by nation and year (adapted: supply cost proxied
# as 0.6 * p_retailprice since there is no partsupp.ps_supplycost).
# --------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity AS amount
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")

    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            part.filter(F.col("p_name").like("%red%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# q11 — important stock (adapted: per-part inventory value derived from
# shipped quantity x retail price for one nation's suppliers; the global
# scalar-subquery threshold keeps its shape).
# --------------------------------------------------------------------------
@register(
    "q11_important_stock",
    oracle="""
    WITH supplied AS (
        SELECT l.l_partkey AS partkey,
               ROUND(SUM(l.l_quantity * p.p_retailprice), 2) AS value
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_1'
        GROUP BY l.l_partkey
    )
    SELECT partkey, value
    FROM supplied
    WHERE value > (SELECT 0.001 * SUM(value) FROM supplied)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    n1_suppliers = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    supplied = (
        li.join(n1_suppliers, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.round(F.sum(F.col("l_quantity") * F.col("p_retailprice")), 2)
            .alias("value")
        )
    )
    threshold = F.broadcast(
        supplied.agg((0.001 * F.sum("value")).alias("cut"))
    )
    return (
        supplied.crossJoin(threshold)  # single-row scalar subquery
        .filter(F.col("value") > F.col("cut"))
        .select("partkey", "value")
    )


# --------------------------------------------------------------------------
# q16 — supplier count per part attribute (adapted: the part<->supplier
# relation comes from lineitem; NOT IN complainers -> anti join).
# --------------------------------------------------------------------------
@register(
    "q16_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'STANDARD'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")

    fparts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "STANDARD")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    # NOT IN over a non-null key column == anti join (no null-semantics trap:
    # s_suppkey is the PK). The excluded set is tiny -> broadcast anti.
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(fparts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q20 — dominant suppliers for promoted parts (adapted: "has excess stock"
# becomes "shipped more than half of a part's 1996 volume" — the nested
# aggregate + IN-subquery -> semi-join structure is preserved).
# --------------------------------------------------------------------------
@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH part_qty AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS ps_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ), tot AS (
        SELECT l_partkey AS t_partkey, SUM(ps_qty) AS total_qty
        FROM part_qty GROUP BY l_partkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT pq.l_suppkey
        FROM part_qty pq
        JOIN tot  ON tot.t_partkey = pq.l_partkey
        JOIN part p ON p.p_partkey = pq.l_partkey
        WHERE pq.ps_qty > 0.5 * tot.total_qty
          AND p.p_name LIKE '%red%'
    )
    ORDER BY s.s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    part_qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("ps_qty"))
    )
    tot = part_qty.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("ps_qty").alias("total_qty")
    )
    dominant = (
        part_qty.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("ps_qty") > 0.5 * F.col("total_qty"))
        .join(
            part.filter(F.col("p_name").like("%red%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("l_suppkey")
    )
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
