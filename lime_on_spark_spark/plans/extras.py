"""Extended analytics surface: pivot, explode/unnest, arg-min/max,
subquery forms, sampling — operators a reference user reaches for beyond
the core §2 rows.

Determinism rules: arg-min/max order on a (value, unique-key) struct so
ties are pinned identically in both engines; explode output carries the
position; sampling is seeded (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Pivot (wide aggregation) — oracle via portable conditional aggregation
# --------------------------------------------------------------------------
@register(
    "a5_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           COUNT(*)                                                        AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a5_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values — explicit values keep
    the plan single-pass (no extra distinct job) and the schema stable."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return out.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        (F.coalesce("F_cnt", F.lit(0)) + F.coalesce("O_cnt", F.lit(0))).alias("n"),
    )


# --------------------------------------------------------------------------
# Explode / unnest with position (lateral view)
# --------------------------------------------------------------------------
@register(
    "f4_posexplode_unnest",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 4)        AS v
    FROM embeddings
    WHERE vec_id < 8
    """,
)
def f4_posexplode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", F.posexplode("embedding").alias("pos", "x"))
        .select("vec_id", "pos", F.round(F.col("x").cast("double"), 4).alias("v"))
    )


# --------------------------------------------------------------------------
# arg-min / arg-max aggregates (min_by/max_by), tie-pinned via struct order
# --------------------------------------------------------------------------
@register(
    "a4_minmax_by",
    oracle="""
    WITH r AS (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey)       AS rn_min,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice DESC, o_orderkey DESC)
                                                                           AS rn_max
        FROM orders
    )
    SELECT o_orderstatus,
           MIN(CASE WHEN rn_min = 1 THEN o_orderkey END)     AS cheapest_order,
           MIN(CASE WHEN rn_max = 1 THEN o_orderkey END)     AS priciest_order,
           ROUND(MIN(o_totalprice), 2)                       AS min_price,
           ROUND(MAX(o_totalprice), 2)                       AS max_price
    FROM r
    GROUP BY o_orderstatus
    """,
)
def a4_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ordkey = F.struct("o_totalprice", "o_orderkey")
    return orders.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", ordkey).alias("cheapest_order"),
        F.max_by("o_orderkey", ordkey).alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


# --------------------------------------------------------------------------
# Scalar subquery: rows above a computed global aggregate
# --------------------------------------------------------------------------
@register(
    "p2_scalar_subquery",
    # Exact-cents formulation, twice over: (1) `price > AVG(price)` becomes
    # the integer comparison cents·n > Σcents — no float threshold for a
    # borderline row to flip on; (2) the emitted average is integer cents
    # rounded at scale 0, where the only tie point (.5) is binary-exact so
    # Spark's HALF_UP and DuckDB's half-away agree. ROUND(AVG(double), 4)
    # here failed at sf0.1: true avg 974.15925 is a 4dp tie, and Spark
    # rounds the shortest decimal repr while DuckDB rounds the binary value.
    oracle="""
    WITH cents AS (
        SELECT p_brand,
               CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS c
        FROM part
    )
    SELECT p_brand,
           COUNT(*)                                     AS n_premium,
           CAST(ROUND(SUM(c) * 1.0 / COUNT(*), 0) AS BIGINT)
                                                        AS avg_premium_cents
    FROM cents
    WHERE c * (SELECT COUNT(*) FROM cents)
          > (SELECT SUM(c) FROM cents)
    GROUP BY p_brand
    """,
)
def p2_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar-subquery pattern as a broadcast singleton join: the
    aggregate is one row, so the comparison distributes for free."""
    part = load_table(spark, sf_dir, "part")
    cents = part.select(
        "p_brand", F.round(F.col("p_retailprice") * 100).cast("long").alias("c")
    )
    totals = cents.agg(
        F.sum("c").alias("sum_c"), F.count(F.lit(1)).alias("n_c")
    )
    return (
        cents.crossJoin(F.broadcast(totals))
        .filter(F.col("c") * F.col("n_c") > F.col("sum_c"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_premium"),
            F.round(F.sum("c") / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_premium_cents"),
        )
    )


# --------------------------------------------------------------------------
# Correlated EXISTS over a date condition (TPC-H q4 shape)
# --------------------------------------------------------------------------
@register(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                                          AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS as a left-semi join with the correlation condition
    inside the join predicate — one shuffle on the order key."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.date_add(orders.o_orderdate, 60).cast("timestamp")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Seeded sampling. Sample composition is partitioning-dependent, so the
# query emits the exact population plus a Spark-computed rate verdict
# (|rate − 0.1| < 0.02; worst observed deviation across sf0.001/0.01/0.1 is
# 0.007) — the a3 oracle pattern for stochastic operators.
# --------------------------------------------------------------------------
@register(
    "s4_seeded_sample",
    oracle="SELECT COUNT(*) AS n_total, TRUE AS rate_ok FROM lineitem",
)
def s4_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sample = li.sample(fraction=0.1, seed=42)
    n_sampled = sample.agg(F.count(F.lit(1)).alias("n_sampled"))
    n_total = li.agg(F.count(F.lit(1)).alias("n_total"))
    return n_total.crossJoin(n_sampled).select(
        "n_total",
        (F.abs(F.col("n_sampled") / F.col("n_total") - 0.1) < 0.02).alias(
            "rate_ok"
        ),
    )


# --------------------------------------------------------------------------
# O4 — Z-order layout for multi-column data skipping. At 100 TB, file-level
# min/max statistics are what turn a point/range predicate into pruned I/O;
# sorting by ONE column gives perfect stats on it and useless stats on
# every other. Interleaving the bits of two (normalized) key columns and
# range-bucketing on the interleave gives each file a small bounding BOX in
# (custkey, orderdate) space, so predicates on EITHER column prune.
# Everything is closed-form column arithmetic: 4-bit normalize per dim,
# bit-interleave to an 8-bit z-value, then the range-partitioned exact
# ntile (operators/exact_ntile.py — no single-task window) assigns "files".
# The query emits both layouts' average normalized bounding-box areas and
# the verdict that z-order's is smaller than the single-column layout's.
# --------------------------------------------------------------------------
@register(
    "o4_zorder_layout",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               date_diff('day', DATE '1992-01-01', o_orderdate) AS day
        FROM orders
    ), bounds AS (
        SELECT MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
               MIN(day) AS dmin, MAX(day) AS dmax
        FROM base
    ), coded AS (
        SELECT o_orderkey, o_custkey, day,
               CAST(FLOOR((o_custkey - cmin) * 16.0 / (cmax - cmin + 1))
                    AS BIGINT) AS bx,
               CAST(FLOOR((day - dmin) * 16.0 / (dmax - dmin + 1))
                    AS BIGINT) AS by
        FROM base, bounds
    ), z AS (
        SELECT o_orderkey, o_custkey, day,
               (((bx >> 0) & 1) << 1) | (((by >> 0) & 1) << 0)
             | (((bx >> 1) & 1) << 3) | (((by >> 1) & 1) << 2)
             | (((bx >> 2) & 1) << 5) | (((by >> 2) & 1) << 4)
             | (((bx >> 3) & 1) << 7) | (((by >> 3) & 1) << 6) AS zval
        FROM coded
    ), zfiles AS (
        SELECT o_custkey, day,
               NTILE(16) OVER (ORDER BY zval, o_orderkey) AS file_id
        FROM z
    ), dfiles AS (
        SELECT o_custkey, day,
               NTILE(16) OVER (ORDER BY day, o_orderkey) AS file_id
        FROM base
    ), zstats AS (
        SELECT AVG((MAX(o_custkey) - MIN(o_custkey))
                   * (MAX(day) - MIN(day))) OVER () AS area
        FROM zfiles GROUP BY file_id LIMIT 1
    ), dstats AS (
        SELECT AVG((MAX(o_custkey) - MIN(o_custkey))
                   * (MAX(day) - MIN(day))) OVER () AS area
        FROM dfiles GROUP BY file_id LIMIT 1
    )
    SELECT 16 AS n_files,
           ROUND((SELECT area FROM zstats), 1)              AS z_avg_bbox_area,
           ROUND((SELECT area FROM dstats), 1)              AS single_avg_bbox_area,
           (SELECT area FROM zstats) < (SELECT area FROM dstats)
                                                            AS zorder_prunes_better
    """,
)
def o4_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.exact_ntile import with_exact_ntile

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias("day"),
    )
    bounds = base.agg(
        F.min("o_custkey").alias("cmin"),
        F.max("o_custkey").alias("cmax"),
        F.min("day").alias("dmin"),
        F.max("day").alias("dmax"),
    )
    coded = base.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.floor(
            (F.col("o_custkey") - F.col("cmin"))
            * 16.0
            / (F.col("cmax") - F.col("cmin") + 1)
        ).alias("bx"),
        F.floor(
            (F.col("day") - F.col("dmin")) * 16.0 / (F.col("dmax") - F.col("dmin") + 1)
        ).alias("by"),
    )
    bit = lambda c, i: F.shiftright(F.col(c), i).bitwiseAND(F.lit(1))  # noqa: E731
    zval = None
    for i in range(4):
        term = F.shiftleft(bit("bx", i), 2 * i + 1).bitwiseOR(
            F.shiftleft(bit("by", i), 2 * i)
        )
        zval = term if zval is None else zval.bitwiseOR(term)
    z = coded.select("o_orderkey", "o_custkey", "day", zval.alias("zval"))

    def avg_area(df, order_cols):
        files = with_exact_ntile(df, 16, order_cols, out_col="file_id")
        return (
            files.groupBy("file_id")
            .agg(
                (
                    (F.max("o_custkey") - F.min("o_custkey"))
                    * (F.max("day") - F.min("day"))
                ).alias("bbox")
            )
            .agg(F.avg("bbox").alias("area"))
        )

    zarea = avg_area(z, ["zval", "o_orderkey"])
    darea = avg_area(base, ["day", "o_orderkey"])
    return (
        zarea.select(F.col("area").alias("z_area"))
        .crossJoin(darea.select(F.col("area").alias("d_area")))
        .select(
            F.lit(16).alias("n_files"),
            F.round("z_area", 1).alias("z_avg_bbox_area"),
            F.round("d_area", 1).alias("single_avg_bbox_area"),
            (F.col("z_area") < F.col("d_area")).alias("zorder_prunes_better"),
        )
    )


# --------------------------------------------------------------------------
# P10 — correlated subqueries through the SQL surface: EXISTS / NOT EXISTS
# / correlated IN submitted as SQL TEXT (spark.sql over the registered
# views), exercising Catalyst's subquery decorrelation
# (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery lowers these
# to semi/anti joins — the only plan that scales; a per-row re-execution
# would be O(n·m)). The oracle is the SAME ANSI text run on DuckDB, so
# this row is Spark-SQL-parity by construction.
# --------------------------------------------------------------------------
_P10_SQL = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_active_with_big_order
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          )
      AND c.c_nationkey IN (
            SELECT n.n_nationkey FROM nation n WHERE n.n_regionkey <= 2
          )
    GROUP BY c.c_mktsegment
"""


@register("p10_correlated_subqueries", oracle=_P10_SQL)
def p10_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("customer", "orders", "nation"))
    return spark.sql(_P10_SQL)


# --------------------------------------------------------------------------
# P11 — LATERAL correlated derived table (Spark 4 SQL surface): top-2
# customers per nation expressed as a per-row correlated subquery. Catalyst
# lowers LATERAL + LIMIT to a ranked join (DomainJoin rewrite) — the same
# physical shape as w4_topk_per_group, so the declarative form costs
# nothing at scale. The oracle is the SAME ANSI text on DuckDB (verbatim
# parity, the p10 discipline).
# --------------------------------------------------------------------------
_P11_SQL = """
    SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
        SELECT c.c_name, c.c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c.c_acctbal DESC, c.c_name
        LIMIT 2
    ) t
"""


@register("p11_lateral_topk", oracle=_P11_SQL)
def p11_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_P11_SQL)


# --------------------------------------------------------------------------
# P12 — WITH RECURSIVE (Spark 4 SQL surface): closure over a binary-tree
# edge set. Docs in each (source, lang) group are ranked and linked
# heap-style (parent rank floor((r-1)/2) -> child rank r), so recursion
# depth is log2(group size) — the depth discipline that keeps recursive
# closure viable at 100 TB (a chain-edge formulation would recurse
# group-size-deep and hit the engine recursion limit; this shape never
# does). Each iteration is one equi-join on the frontier, i.e. exactly the
# iterative min-label step operators/connected_components.py hand-rolls —
# this row pins that Spark's native recursive CTE reproduces it. Oracle =
# SAME text on DuckDB (verbatim parity).
# --------------------------------------------------------------------------
_P12_SQL = """
    WITH RECURSIVE ranked AS (
        SELECT doc_id, source, lang,
               ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY doc_id) - 1 AS rk
        FROM documents
    ), edges AS (
        SELECT p.doc_id AS src, c.doc_id AS dst
        FROM ranked p
        JOIN ranked c
          ON p.source = c.source AND p.lang = c.lang
         AND p.rk = CAST(FLOOR((c.rk - 1) / 2) AS BIGINT)
        WHERE c.rk >= 1
    ), reach(root, doc_id) AS (
        SELECT doc_id, doc_id FROM ranked WHERE rk = 0
        UNION ALL
        SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.doc_id
    )
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM (SELECT root, COUNT(*) AS cluster_size FROM reach GROUP BY root)
    GROUP BY cluster_size
"""


@register("p12_recursive_cte", oracle=_P12_SQL)
def p12_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(_P12_SQL)


# --------------------------------------------------------------------------
# O5 — observed metrics (df.observe): data-quality counters collected as a
# side effect of the SAME scan that does the work — zero extra jobs, the
# production pattern for row-count / revenue reconciliation on a 100 TB
# pipeline (a separate audit query would re-read the input). DISTINCT aggs
# are rejected by CollectMetrics, so the metric set sticks to the
# partial-aggregatable ones. The one-row driver materialization is the
# metrics struct itself — bounded by construction.
# --------------------------------------------------------------------------
@register(
    "o5_observed_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           MAX(l_suppkey) AS max_suppkey
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    """,
)
def o5_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    # String-named observe + queryExecution().observedMetrics(), NOT the
    # pyspark Observation helper: Observation registers with the session's
    # ObservationManager, which then rides along in later task closures
    # and fails serialization (NotSerializableException: ObservationManager
    # poisoning unrelated downstream jobs in the same session). Reading the
    # metrics off the executed plan has no session-level state at all.
    observed = li.observe(
        "o5_metrics",
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.max("l_suppkey").alias("max_suppkey"),
    )
    # The probe aggregate drives the full scan through the observe node;
    # its own execution carries the metrics row.
    probe = observed.groupBy().agg(F.count(F.lit(1)).alias("probe_rows"))
    probe.collect()
    jmetrics = probe._jdf.queryExecution().observedMetrics()
    it = jmetrics.iterator()
    m = {}
    while it.hasNext():
        kv = it.next()
        if kv._1() == "o5_metrics":
            row = kv._2()
            m = {n: row.getAs(n) for n in row.schema().fieldNames()}
    return spark.createDataFrame(
        [(m["n_rows"], m["revenue"], m["avg_qty"], m["max_suppkey"])],
        "n_rows bigint, revenue double, avg_qty double, max_suppkey bigint",
    )


# --------------------------------------------------------------------------
# P13 — parameterized SQL (Spark 4 named-parameter binding): the
# injection-safe templating surface a production query service uses —
# literals bind server-side as typed values, never by string splicing, and
# one parse serves every parameter set. The oracle is the same text with
# the literals inlined, proving binding == inlining semantically.
# --------------------------------------------------------------------------
@register(
    "p13_parameterized_sql",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate <  DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    GROUP BY l_returnflag
    """,
)
def p13_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= :start_date
          AND l_shipdate <  :end_date
          AND l_discount BETWEEN :lo AND :hi
          AND l_quantity < :max_qty
        GROUP BY l_returnflag
        """,
        args={
            "start_date": "1995-01-01",
            "end_date": "1996-01-01",
            "lo": 0.05,
            "hi": 0.07,
            "max_qty": 24.0,
        },
    )


# --------------------------------------------------------------------------
# P14 — SQL scalar UDF (CREATE TEMPORARY FUNCTION ... RETURN expr, Spark
# 4): business logic named once in the catalog and reused across queries.
# Unlike Python UDFs these inline into the plan at analysis time — the
# expression stays inside whole-stage codegen, so a SQL UDF costs exactly
# what writing the expression inline costs (nothing). The oracle inlines
# the definition by hand, pinning that equivalence.
# --------------------------------------------------------------------------
@register(
    "p14_sql_udf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net_revenue,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS charged_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def p14_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_price"
        "(p DOUBLE, d DOUBLE, t DOUBLE)"
        " RETURNS DOUBLE RETURN net_price(p, d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(SUM(net_price(l_extendedprice, l_discount)), 2)
                   AS net_revenue,
               ROUND(SUM(charged_price(l_extendedprice, l_discount, l_tax)), 2)
                   AS charged_revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# P15 — SQL pipe syntax (Spark 4's |> operator, the GoogleSQL pipe-query
# proposal): the same logical query written as a linear pipeline —
# FROM |> WHERE |> AGGREGATE |> ORDER BY — instead of inside-out nested
# SELECTs. Purely surface syntax: Catalyst lowers it to the identical
# plan, which the oracle (classic ANSI spelling of the same query) pins.
# --------------------------------------------------------------------------
@register(
    "p15_sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    """,
)
def p15_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity >= 30
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_rows,
                     ROUND(SUM(l_extendedprice), 2) AS total_price
           GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# P16 — lateral column alias (Spark 3.4+ SQL): later SELECT items reference
# earlier aliases in the SAME projection, removing the subquery/CTE nesting
# that derived-metric chains otherwise force. The chain below is resolved
# by Catalyst into one projection — no extra plan node. DuckDB supports
# the same referencing, so the oracle is near-verbatim.
# --------------------------------------------------------------------------
@register(
    "p16_lateral_column_alias",
    # The alias chain runs on exact integer math (re-rounding an already
    # rounded float chain lands on .005 boundaries where the engines'
    # rounding modes diverge); the one float output rounds at 4dp, which
    # is an exact no-op for a 2dp x 2dp product — no half-cent hazard.
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT)                     AS qty,
           qty * 2                                        AS qty2,
           qty2 + CAST(l_linenumber AS BIGINT)            AS qty2_line,
           ROUND(l_extendedprice * (1 - l_discount), 4)   AS net
    FROM lineitem
    WHERE l_orderkey < 100 AND l_linenumber = 1
    """,
)
def p16_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(l_quantity AS BIGINT)                     AS qty,
               qty * 2                                        AS qty2,
               qty2 + CAST(l_linenumber AS BIGINT)            AS qty2_line,
               ROUND(l_extendedprice * (1 - l_discount), 4)   AS net
        FROM lineitem
        WHERE l_orderkey < 100 AND l_linenumber = 1
        """
    )


# --------------------------------------------------------------------------
# P17 — IDENTIFIER() clause (Spark 3.5+): template a table/column name from
# a string parameter without string-splicing SQL (the injection-safe form
# of dynamic identifiers — the constant folds at analysis time, so the
# plan is identical to naming the table literally). The oracle is the
# literal-name query.
# --------------------------------------------------------------------------
@register(
    "p17_identifier_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)       AS n_orders,
           ROUND(AVG(o_totalprice), 2)    AS avg_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def p17_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT IDENTIFIER(:col_prio)        AS o_orderpriority,
               COUNT(*)                     AS n_orders,
               ROUND(AVG(IDENTIFIER(:col_price)), 2) AS avg_price
        FROM IDENTIFIER(:tbl)
        WHERE IDENTIFIER(:col_status) = 'F'
        GROUP BY IDENTIFIER(:col_prio)
        """,
        args={
            "tbl": "orders",
            "col_prio": "o_orderpriority",
            "col_price": "o_totalprice",
            "col_status": "o_orderstatus",
        },
    )


# --------------------------------------------------------------------------
# P18 — SQL scripting (Spark 4, SQL/PSM compound statements): a BEGIN...END
# block with DECLAREd local variables, a WHILE loop, and scalar-subquery
# SET — procedural control flow that previously needed driver-side Python
# glue now runs as ONE spark.sql call (the script's final statement is the
# returned frame). The loop accumulates the 5th harmonic number on the
# driver (O(1) scalar state, no data touched); the scalar-subquery SET
# binds the corpus-wide average order price once; the final SELECT is an
# ordinary distributed query parameterized by both variables. The oracle
# spells the same logic declaratively (literal H_5, scalar subquery) —
# control flow must not change the answer.
#
# Scale: scripting is driver-side orchestration sugar; every data-touching
# statement inside the block is still a full Catalyst-planned query, so
# the 100 TB story is unchanged from the equivalent multi-statement job.
# --------------------------------------------------------------------------
@register(
    "p18_sql_scripting",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_above_avg,
           ROUND(AVG(o_totalprice), 2) AS avg_above,
           ROUND(1.0 + 1.0/2 + 1.0/3 + 1.0/4 + 1.0/5, 6) AS h5
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def p18_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    from lime_on_spark_spark.session import temp_conf

    load_tables(spark, sf_dir, ("orders",))
    # spark.sql executes the whole script eagerly (the final statement's
    # result comes back as this DataFrame), so restoring the conf right
    # after is safe — and keeps the shared session's parser exactly as
    # other queries expect it.
    with temp_conf(spark, "spark.sql.scripting.enabled", "true"):
        return spark.sql(
            """
        BEGIN
          DECLARE avg_price DOUBLE;
          DECLARE hsum DOUBLE DEFAULT 0.0;
          DECLARE k INT DEFAULT 1;
          WHILE k <= 5 DO
            SET hsum = hsum + 1.0 / k;
            SET k = k + 1;
          END WHILE;
          SET avg_price = (SELECT AVG(o_totalprice) FROM orders);
          SELECT o_orderpriority,
                 COUNT(*) AS n_above_avg,
                 ROUND(AVG(o_totalprice), 2) AS avg_above,
                 ROUND(hsum, 6) AS h5
          FROM orders
          WHERE o_totalprice > avg_price
          GROUP BY o_orderpriority;
        END
        """
        )


# --------------------------------------------------------------------------
# P19 — pandas API on Spark parity: the THIRD query-authoring surface after
# the DataFrame API and SQL text (`pyspark.pandas`, the Koalas lineage).
# A pandas-fluent user writes groupby/agg in pandas idiom; it compiles to
# the SAME Catalyst plan — proven here by the oracle, which is the plain
# SQL spelling of the identical aggregation. The default index is pinned
# to "distributed" inside an option_context (the default
# distributed-sequence index forces an extra pass to assign global
# sequence numbers; a groupby consumer never needs it), so the pandas
# veneer adds no scale hazard: no single-partition index pass, no
# driver-side pandas materialization — to_spark() hands back the lazy
# frame.
# --------------------------------------------------------------------------
@register(
    "p19_pandas_api_parity",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)       AS n_orders,
           ROUND(SUM(o_totalprice), 2)    AS total_price,
           ROUND(AVG(o_totalprice), 2)    AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def p19_pandas_api_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.pandas as ps

    with ps.option_context("compute.default_index_type", "distributed"):
        pdf = load_table(spark, sf_dir, "orders").pandas_api()
        out = (
            pdf.groupby("o_orderpriority")
            .agg(
                n_orders=("o_orderkey", "count"),
                total_price=("o_totalprice", "sum"),
                avg_price=("o_totalprice", "mean"),
            )
            .reset_index()
        )
        res = out.to_spark()
    return res.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round("total_price", 2).alias("total_price"),
        F.round("avg_price", 2).alias("avg_price"),
    )


# --------------------------------------------------------------------------
# P20 — dynamic SQL: session variables (SQL:2016 DECLARE VARIABLE /
# SET VAR, Spark 4) + EXECUTE IMMEDIATE with USING parameters and INTO
# capture — the feature pair behind parameterized dashboards and
# metadata-driven query generation, and the session-scope complement to
# p18's scripting-local DECLARE. The flow: an aggregate lands INTO a
# session variable (driver-held scalar), then a parameterized query text
# executes USING it — every data-touching statement is a full Catalyst
# query; the variable is O(1) driver state. The oracle spells the same
# logic with a scalar subquery (plain ANSI — PORTABLE row), so the
# dynamic path is value-pinned against the declarative twin.
# --------------------------------------------------------------------------
@register(
    "p20_dynamic_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)          AS n_above,
           ROUND(AVG(o_totalprice), 2)       AS avg_above
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def p20_dynamic_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("p20_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE p20_cut DOUBLE")
    # Aggregate INTO the session variable: one Catalyst query, one scalar.
    spark.sql(
        "EXECUTE IMMEDIATE"
        " 'SELECT AVG(o_totalprice) FROM p20_orders' INTO p20_cut"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(COUNT(*) AS BIGINT)    AS n_above,
                  ROUND(AVG(o_totalprice), 2) AS avg_above
           FROM p20_orders WHERE o_totalprice > ?
           GROUP BY o_orderpriority'
        USING p20_cut
        """
    )


# --------------------------------------------------------------------------
# P21 — GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4, DuckDB-originated SQL
# surface): every non-aggregate SELECT item becomes a grouping key and
# the full output sorts by every column — the exploratory-analytics
# spelling that removes the copy-the-projection-into-GROUP-BY chore (and
# with it the silently-wrong-when-they-drift hazard). Near-verbatim in
# both engines; the resolved plan is identical to the explicit spelling,
# so this is parser surface, not a new operator shape.
# --------------------------------------------------------------------------
@register(
    "p21_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT)            AS n_rows,
           ROUND(SUM(l_extendedprice), 2)      AS total_price,
           ROUND(AVG(l_discount), 6)           AS avg_disc
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def p21_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT)            AS n_rows,
               ROUND(SUM(l_extendedprice), 2)      AS total_price,
               ROUND(AVG(l_discount), 6)           AS avg_disc
        FROM lineitem
        WHERE l_quantity >= 25
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# --------------------------------------------------------------------------
# P22 — star expansion with EXCEPT (Spark 4 `SELECT * EXCEPT (...)`,
# DuckDB's EXCLUDE): project everything but the named columns without
# enumerating a wide schema — the ergonomic primitive for "drop the
# blob/debug columns" on tables with hundreds of fields, where a spelled
# projection goes stale on every schema evolution. Column ORDER is part
# of the contract (remaining columns keep their declared order), pinned
# by the driver's schema check.
# --------------------------------------------------------------------------
@register(
    "p22_select_star_except",
    oracle="""
    SELECT * EXCLUDE (o_orderpriority, o_orderstatus)
    FROM orders
    WHERE o_orderkey % 400 = 7
    ORDER BY o_orderkey
    """,
)
def p22_select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT * EXCEPT (o_orderpriority, o_orderstatus)
        FROM orders
        WHERE o_orderkey % 400 = 7
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
# P23 — ORDER BY ALL (the companion of p21's GROUP BY ALL; DuckDB
# pioneered both, Spark 4 ships both): a total order over every output
# column left-to-right without restating the projection — the "give me a
# deterministic dump" ergonomic. Pinned with a LIMIT so the ordering is
# semantically load-bearing (a wrong sort changes WHICH rows survive,
# not just their arrangement, and the value hash catches it).
# --------------------------------------------------------------------------
@register(
    "p23_order_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    LIMIT 7
    """,
)
def p23_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 7
        """
    )


# --------------------------------------------------------------------------
# P24 — DataFrame.transpose (Spark 4, SPARK-47081): the third member of
# the reshape family next to a5's pivot (aggregation into columns) and
# unpivot (columns into rows) — a pure flip of a SUMMARY frame with no
# aggregation: former columns become rows keyed by `key`, index values
# become columns (sorted, so the output schema is deterministic — the
# driver's schema check pins it). Metrics are cast to a common type
# first (transpose requires it: the least common type of all value
# columns).
# Scale: transpose materializes the index values driver-side to NAME the
# output columns (capped by spark.sql.transposeMaxValues) — it is a
# presentation op for BOUNDED summaries; the corpus-scale work is the
# upstream keyed agg, which stays a one-pass combinable census.
# --------------------------------------------------------------------------
@register(
    "p24_transpose",
    oracle="""
    WITH agg AS (
        SELECT c_mktsegment,
               CAST(COUNT(*) AS DOUBLE)    AS n_customers,
               ROUND(AVG(c_acctbal), 4)    AS avg_acctbal
        FROM customer GROUP BY c_mktsegment
    )
    SELECT 'n_customers' AS key,
           MAX(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN n_customers END)
               AS "AUTOMOBILE",
           MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN n_customers END)
               AS "BUILDING",
           MAX(CASE WHEN c_mktsegment = 'FURNITURE' THEN n_customers END)
               AS "FURNITURE",
           MAX(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN n_customers END)
               AS "HOUSEHOLD",
           MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN n_customers END)
               AS "MACHINERY"
    FROM agg
    UNION ALL
    SELECT 'avg_acctbal',
           MAX(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN avg_acctbal END),
           MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN avg_acctbal END),
           MAX(CASE WHEN c_mktsegment = 'FURNITURE' THEN avg_acctbal END),
           MAX(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN avg_acctbal END),
           MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN avg_acctbal END)
    FROM agg
    """,
)
def p24_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    agg = customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
    )
    return agg.transpose()
