"""Join operators (SURVEY.md §2c rows J2, J3, J5, J6, J7).

Scale notes per row:
* J2/J3 — shuffle hash/sort-merge joins on the equi-key; AQE converts to
  broadcast when a side is actually small. No forced hints on unbounded
  sides.
* J5 — theta join on a deliberately tiny input (nation, 25 rows): Spark
  plans BroadcastNestedLoopJoin. Never do this on unbounded inputs.
* J6 — range join: the naive form is a cross product. The scale-correct
  formulation (used here) buckets both sides by the hour and joins on
  (user_id, bucket) with the probe side exploded over the two candidate
  buckets, then applies the exact range as a residual filter — an equi-join
  shuffle that AQE can size, instead of a nested loop.
* J7 — as-of join: no native Spark operator. Formulated as a union of the
  two sides tagged + a running `last(..., ignorenulls)` window over
  (key, ts, side, id) — one shuffle on the key, no point lookups, scales to
  arbitrary key cardinality. The oracle is the SAME window formulation in
  SQL (not DuckDB ASOF JOIN) so tie-breaking is pinned on both engines:
  at equal ts, clicks sort before purchases (side 0 < 1) => '<=' semantics.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # type hints only — pandas is imported lazily inside UDFs
    import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# J2 — left outer join (customers with/without orders)
# --------------------------------------------------------------------------
@register(
    "j2_left_outer",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           COUNT(o_orderkey)                                 AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2)          AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def j2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "j2_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nationkey, s.nationkey)                AS nationkey,
           COALESCE(n_customers, 0)                          AS n_customers,
           COALESCE(n_suppliers, 0)                          AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def j2_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# J3 — left semi / left anti (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------
@register(
    "j3_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_active_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def j3_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


@register(
    "j3_anti",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_inactive
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def j3_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


# --------------------------------------------------------------------------
# J5 — theta (non-equi) join on a bounded input -> BroadcastNestedLoopJoin
# --------------------------------------------------------------------------
@register(
    "j5_theta_join",
    oracle="""
    SELECT n1.n_regionkey                                    AS r_lo,
           n2.n_regionkey                                    AS r_hi,
           COUNT(*)                                          AS n_pairs
    FROM nation n1 JOIN nation n2 ON n1.n_regionkey < n2.n_regionkey
    GROUP BY n1.n_regionkey, n2.n_regionkey
    """,
)
def j5_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_regionkey").alias("r_lo")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_regionkey").alias("r_hi")
    )
    return (
        n1.join(n2, F.col("r_lo") < F.col("r_hi"))
        .groupBy("r_lo", "r_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# J6 — range join: clicks within the hour preceding each purchase
# --------------------------------------------------------------------------
@register(
    "j6_range_join",
    oracle="""
    SELECT p.event_id                                        AS purchase_id,
           COUNT(*)                                          AS n_recent_clicks,
           ROUND(SUM(c.value), 2)                            AS click_value
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.ts >  p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
     AND c.event_type = 'click'
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    bucket = F.floor(sec / 3600)
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
            bucket.alias("p_bucket"),
        )
        # probe side explodes over the two buckets its 1-hour window spans —
        # turns the range join into an equi-join on (user_id, bucket)
        .withColumn(
            "bucket", F.explode(F.array(F.col("p_bucket") - 1, F.col("p_bucket")))
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        bucket.alias("bucket"),
    )
    return (
        purchases.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts"))
        )
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_recent_clicks"),
            F.round(F.sum("c_value"), 2).alias("click_value"),
        )
    )


# --------------------------------------------------------------------------
# J7 — as-of join: latest click at-or-before each purchase, per user
# --------------------------------------------------------------------------
@register(
    "j7_asof_join",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, value, 1 AS side
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, value, 0 AS side
        FROM events WHERE event_type = 'click'
    ), w AS (
        SELECT user_id, ts, event_id, value, side,
               max(CASE WHEN side = 0 THEN ts END) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click_ts,
               last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click_value
        FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts,
           last_click_ts,
           ROUND(last_click_value, 2) AS last_click_value
    FROM w WHERE side = 1
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value", F.lit(1).alias("side")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("side") == 0, F.col("ts"))
    click_val = F.when(F.col("side") == 0, F.col("value"))
    return (
        purchases.unionByName(clicks)
        .withColumn("last_click_ts", F.max(click_ts).over(w))
        .withColumn("last_click_value", F.last(click_val, ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts",
            "last_click_ts",
            F.round("last_click_value", 2).alias("last_click_value"),
        )
    )


@register(
    "j2_right_outer",
    oracle="""
    SELECT n_name,
           COUNT(s_suppkey)                                  AS n_suppliers,
           ROUND(COALESCE(SUM(s_acctbal), 0), 2)             AS total_bal
    FROM supplier
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j2_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.round(F.coalesce(F.sum("s_acctbal"), F.lit(0.0)), 2).alias(
                "total_bal"
            ),
        )
    )


# --------------------------------------------------------------------------
# J7b — FORWARD as-of join: for each click, the next purchase at-or-after.
# Same union+window formulation as j7_asof_join, frame reversed; ties at
# equal ts sort purchases after clicks so an equal-ts purchase is eligible.
# --------------------------------------------------------------------------
@register(
    "j7_asof_forward",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, value, 0 AS side
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, event_id, value, 1 AS side
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT user_id, ts, event_id, value, side,
               first_value(CASE WHEN side = 1 THEN ts END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_purchase_ts,
               first_value(CASE WHEN side = 1 THEN value END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_purchase_value
        FROM u
    )
    SELECT event_id AS click_id, user_id, ts,
           next_purchase_ts,
           ROUND(next_purchase_value, 2) AS next_purchase_value
    FROM w WHERE side = 0
    """,
)
def j7_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("side")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value", F.lit(1).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("side") == 1, F.col("ts"))
    p_val = F.when(F.col("side") == 1, F.col("value"))
    return (
        clicks.unionByName(purchases)
        .withColumn("next_purchase_ts", F.first(p_ts, ignorenulls=True).over(w))
        .withColumn(
            "next_purchase_value", F.first(p_val, ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 0)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            "ts",
            "next_purchase_ts",
            F.round("next_purchase_value", 2).alias("next_purchase_value"),
        )
    )


# --------------------------------------------------------------------------
# J7c — as-of join, cogrouped-pandas formulation. Same semantics and oracle
# as j7_asof_join; instead of the union+window plan, both sides shuffle once
# on user_id and pandas.merge_asof runs per Arrow cogroup. bench.py times
# both: at sf0.1 (10k users, tiny groups) the window formulation wins 40x
# (0.24s vs 9.97s) because per-group Python invocation overhead dominates —
# so the window plan is the DEFAULT as-of join; this variant is the shape
# to reach for only when per-group logic outgrows window expressions
# (multi-column nearest, custom tolerance semantics), and then only with
# group sizes large enough to amortize the Arrow round-trip.
# --------------------------------------------------------------------------
_ASOF_SCHEMA = (
    "purchase_id bigint, user_id bigint, ts timestamp, "
    "last_click_ts timestamp, last_click_value double"
)


def _merge_asof_group(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    import pandas as _pd

    if purchases.empty:
        return _pd.DataFrame(
            {
                "purchase_id": _pd.Series(dtype="int64"),
                "user_id": _pd.Series(dtype="int64"),
                "ts": _pd.Series(dtype="datetime64[ns]"),
                "last_click_ts": _pd.Series(dtype="datetime64[ns]"),
                "last_click_value": _pd.Series(dtype="float64"),
            }
        )
    left = purchases.sort_values(["ts", "event_id"], kind="stable")
    right = (
        clicks.sort_values(["ts", "event_id"], kind="stable")
        .rename(columns={"ts": "last_click_ts", "value": "last_click_value"})
        [["last_click_ts", "last_click_value"]]
    )
    # merge_asof backward keeps the LAST right row at-or-before each left ts;
    # the (ts, event_id) sort makes the equal-ts winner the highest event_id,
    # matching the window formulation's ORDER BY ts, side, event_id.
    merged = _pd.merge_asof(
        left,
        right,
        left_on="ts",
        right_on="last_click_ts",
        direction="backward",
        allow_exact_matches=True,
    )
    return _pd.DataFrame(
        {
            "purchase_id": merged["event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "ts": merged["ts"],
            "last_click_ts": merged["last_click_ts"],
            "last_click_value": merged["last_click_value"].round(2),
        }
    )


@register(
    "j7_asof_pandas",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, value, 1 AS side
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, value, 0 AS side
        FROM events WHERE event_type = 'click'
    ), w AS (
        SELECT user_id, ts, event_id, value, side,
               max(CASE WHEN side = 0 THEN ts END) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click_ts,
               last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click_value
        FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts,
           last_click_ts,
           ROUND(last_click_value, 2) AS last_click_value
    FROM w WHERE side = 1
    """,
)
def j7_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FALLBACK as-of path — ~30x slower than the window formulation at
    sf0.1 (14.2 s vs 0.47 s, BENCH_r05); use ``j7_asof_join`` as the
    default. This variant exists for pandas ``merge_asof`` fidelity and to
    demonstrate the per-key cogroup shape (architecturally scale-safe:
    state per task is one user's events, but the constant factor is Python
    + Arrow transfer, so it loses whenever the window plan applies)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            lambda left, right: _merge_asof_group(left, right), _ASOF_SCHEMA
        )
    )


# --------------------------------------------------------------------------
# J8 — skew-salted join + two-phase salted aggregate, registered against the
# PLAIN SQL oracle: salting must be semantically invisible (identical rows),
# only the shuffle layout changes. Orders per customer are the "hot key"
# stand-in; at 100 TB the same pattern splits a pathological key across
# n_salts reducers where AQE's skew splitting can't (skewed aggregations).
# --------------------------------------------------------------------------
@register(
    "j8_salted_skew_join",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)                    AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def j8_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.salting import salted_join_small_build

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join_small_build(orders, cust, key="o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "a10_salted_agg",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a10_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (key, salt) -> key aggregation over a LOW-cardinality key
    (5 priorities): exactly the shape where one reducer per key melts down
    at scale and salting restores parallelism."""
    from lime_on_spark_spark.operators.salting import salted_sum

    orders = load_table(spark, sf_dir, "orders")
    return salted_sum(
        orders.select("o_orderpriority", "o_totalprice"),
        key="o_orderpriority",
        value="o_totalprice",
        n_salts=16,
        alias="_total",
    ).select(
        "o_orderpriority", F.round("_total", 2).alias("total_price")
    )


# --------------------------------------------------------------------------
# J9 — interval-overlap join (sessions x incident windows), bucketed
# --------------------------------------------------------------------------
@register(
    "j9_interval_overlap_join",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    seq AS (
        SELECT user_id, us,
               CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                        IS NULL
                    OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                        > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ev),
    sid AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM seq),
    sessions AS (
        SELECT user_id, sid, MIN(us) AS s, MAX(us) AS e
        FROM sid GROUP BY user_id, sid),
    buckets AS (
        SELECT us - us % 900000000 AS bs, COUNT(*) AS n FROM ev GROUP BY 1),
    tot AS (
        SELECT (SELECT COUNT(*) FROM ev) AS t,
               (SELECT COUNT(*) FROM buckets) AS nb),
    incidents AS (
        SELECT bs, bs + 900000000 AS be
        FROM buckets, tot WHERE 2 * n * nb > 3 * t),
    pairs AS (
        SELECT s.user_id,
               LEAST(s.e, i.be) - GREATEST(s.s, i.bs) AS ov
        FROM sessions s JOIN incidents i
          ON s.s < i.be AND i.bs < s.e)
    SELECT user_id,
           COUNT(*) AS n_pairs,
           CAST(SUM(ov) AS BIGINT) AS overlap_us
    FROM pairs GROUP BY user_id
    """,
)
def j9_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per-user activity sessions vs global
    "incident" windows (15-min buckets with event volume > 1.5x average,
    the comparison done in exact integers: 2*n*n_buckets > 3*total).

    Scale shape: sessions are gaps-and-islands (one user-keyed window
    sort); the overlap join never runs the naive theta join — each session
    explodes into the hour buckets it spans and each 15-min incident lands
    in exactly one hour bucket, so candidates come from a hash equi-join
    on the bucket and the exact overlap predicate filters residuals.
    Each (session, incident) pair meets in exactly one hour bucket, so no
    dedup pass is needed. Incident table is broadcast (it is tiny by
    construction: volume outliers only).
    """
    b15 = 900_000_000  # 15 min in microseconds
    hour = 3_600_000_000
    gap = 1_800_000_000  # 30-min session gap

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    sess = (
        ev.withColumn("prev", F.lag("us").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull() | (F.col("us") - F.col("prev") > gap), 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sessions = sess.groupBy("user_id", "sid").agg(
        F.min("us").alias("s"), F.max("us").alias("e")
    )

    buckets = (
        ev.select((F.col("us") - F.col("us") % b15).alias("bs"))
        .groupBy("bs")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = ev.agg(F.count(F.lit(1)).alias("t")).crossJoin(
        buckets.agg(F.count(F.lit(1)).alias("nb"))
    )
    incidents = (
        buckets.crossJoin(F.broadcast(tot))
        .filter(2 * F.col("n") * F.col("nb") > 3 * F.col("t"))
        .select("bs", (F.col("bs") + b15).alias("be"))
    )

    # Bucketed candidate generation: sessions span [s//H .. e//H]; a 15-min
    # incident lives in exactly one hour bucket.
    sess_hours = sessions.withColumn(
        "hb",
        F.explode(
            F.sequence(
                ((F.col("s") - F.col("s") % hour) / hour).cast("long"),
                ((F.col("e") - F.col("e") % hour) / hour).cast("long"),
            )
        ),
    )
    inc_hours = incidents.withColumn(
        "hb", ((F.col("bs") - F.col("bs") % hour) / hour).cast("long")
    )
    pairs = sess_hours.join(F.broadcast(inc_hours), "hb").filter(
        (F.col("s") < F.col("be")) & (F.col("bs") < F.col("e"))
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.least("e", "be") - F.greatest("s", "bs")
        ).alias("overlap_us"),
    )


# --------------------------------------------------------------------------
# J10 — SCD2 point-in-time (slowly-changing-dimension) join. The warehouse
# pattern for "join each fact row to the dimension version in effect on the
# fact's date": dimension rows carry [valid_from, valid_to) windows and the
# join is an equi-join on the natural key plus the validity range as a
# residual filter. Here the versioned dimension is built from the data
# itself — each customer's spend tier as of each order date (window cumsum
# -> tier; lead() closes each version) — and the fact side re-joins orders
# to the tier in effect on the order's date. Scale shape: versions-per-key
# is bounded by a customer's distinct order dates, so the equi-join on
# custkey fans out by a small constant before the range residual prunes to
# exactly one version; one shuffle on the key, sort-merge friendly, no
# nested loop. (The j7 as-of union-window formulation is the alternative
# when version tables are not materialized.)
# --------------------------------------------------------------------------
@register(
    "j10_scd2_join",
    oracle="""
    WITH per_date AS (
        SELECT o_custkey AS custkey, o_orderdate AS d,
               SUM(o_totalprice) AS day_spend
        FROM orders GROUP BY o_custkey, o_orderdate
    ), versions AS (
        SELECT custkey,
               d AS valid_from,
               COALESCE(LEAD(d) OVER (PARTITION BY custkey ORDER BY d),
                        DATE '9999-12-31') AS valid_to,
               CASE WHEN SUM(day_spend) OVER (PARTITION BY custkey ORDER BY d)
                         < 200000 THEN 'BRONZE'
                    WHEN SUM(day_spend) OVER (PARTITION BY custkey ORDER BY d)
                         < 500000 THEN 'SILVER'
                    ELSE 'GOLD' END AS tier
        FROM per_date
    )
    SELECT tier,
           COUNT(*)                      AS n_orders,
           ROUND(SUM(o_totalprice), 2)   AS revenue
    FROM orders
    JOIN versions
      ON o_custkey = custkey
     AND o_orderdate >= valid_from
     AND o_orderdate <  valid_to
    GROUP BY tier
    """,
)
def j10_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_date = orders.groupBy(
        F.col("o_custkey").alias("custkey"), F.col("o_orderdate").alias("d")
    ).agg(F.sum("o_totalprice").alias("day_spend"))
    w = Window.partitionBy("custkey").orderBy("d")
    cum = F.sum("day_spend").over(w)
    versions = per_date.select(
        "custkey",
        F.col("d").alias("valid_from"),
        F.coalesce(F.lead("d").over(w), F.lit("9999-12-31").cast("date")).alias(
            "valid_to"
        ),
        F.when(cum < 200000, "BRONZE")
        .when(cum < 500000, "SILVER")
        .otherwise("GOLD")
        .alias("tier"),
    )
    joined = orders.join(
        versions,
        (orders.o_custkey == versions.custkey)
        & (orders.o_orderdate >= versions.valid_from)
        & (orders.o_orderdate < versions.valid_to),
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# --------------------------------------------------------------------------
# J7d — NEAREST-direction as-of join, completing the as-of family
# (backward j7_asof_join / forward j7_asof_forward / pandas fallback):
# each purchase matches the click closest in time in EITHER direction,
# ties broken backward (a click at the identical timestamp sorts before
# the purchase and wins with distance 0). One union + the backward and
# forward windows from the sibling plans in a single pass — still one
# shuffle on user_id, no join at all, so the plan scales exactly like j7.
# Distances compare in microseconds (unix_micros / epoch_us).
# --------------------------------------------------------------------------
@register(
    "j7_asof_nearest",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, value, 1 AS side
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, value, 0 AS side
        FROM events WHERE event_type = 'click'
    ), w AS (
        SELECT user_id, ts, event_id, side,
               max(CASE WHEN side = 0 THEN ts END) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_ts,
               last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_val,
               first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS fwd_ts,
               first_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS fwd_val
        FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts,
           CASE WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL
                     OR epoch_us(ts) - epoch_us(back_ts)
                        <= epoch_us(fwd_ts) - epoch_us(ts))
                THEN back_ts ELSE fwd_ts END AS nearest_click_ts,
           ROUND(CASE WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL
                     OR epoch_us(ts) - epoch_us(back_ts)
                        <= epoch_us(fwd_ts) - epoch_us(ts))
                THEN back_val ELSE fwd_val END, 2) AS nearest_click_value,
           CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL
                     OR epoch_us(ts) - epoch_us(back_ts)
                        <= epoch_us(fwd_ts) - epoch_us(ts))
                THEN 'backward' ELSE 'forward' END AS direction
    FROM w WHERE side = 1
    """,
)
def j7_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value", F.lit(1).alias("side")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("side")
    )
    back_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("side") == 0, F.col("ts"))
    click_val = F.when(F.col("side") == 0, F.col("value"))
    both = (
        purchases.unionByName(clicks)
        .withColumn("back_ts", F.max(click_ts).over(back_w))
        .withColumn("back_val", F.last(click_val, ignorenulls=True).over(back_w))
        .withColumn("fwd_ts", F.first(click_ts, ignorenulls=True).over(fwd_w))
        .withColumn("fwd_val", F.first(click_val, ignorenulls=True).over(fwd_w))
        .filter(F.col("side") == 1)
    )
    take_back = F.col("back_ts").isNotNull() & (
        F.col("fwd_ts").isNull()
        | (
            F.unix_micros("ts") - F.unix_micros("back_ts")
            <= F.unix_micros("fwd_ts") - F.unix_micros("ts")
        )
    )
    return both.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.when(take_back, F.col("back_ts")).otherwise(F.col("fwd_ts")).alias(
            "nearest_click_ts"
        ),
        F.round(
            F.when(take_back, F.col("back_val")).otherwise(F.col("fwd_val")), 2
        ).alias("nearest_click_value"),
        F.when(
            F.col("back_ts").isNull() & F.col("fwd_ts").isNull(), F.lit(None)
        )
        .when(take_back, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


# --------------------------------------------------------------------------
# J7e — as-of join with a match tolerance (pandas merge_asof's
# `tolerance=` contract): the backward match only counts if the click is
# within 1 hour of the purchase; staler matches resolve to NULL. Same
# single-shuffle union+window plan as j7_asof_join with a post-window
# CASE — tolerance adds zero cost. The practical semantics for attribution
# windows ("a click older than an hour didn't drive this purchase").
# --------------------------------------------------------------------------
@register(
    "j7_asof_tolerance",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, value, 1 AS side
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, value, 0 AS side
        FROM events WHERE event_type = 'click'
    ), w AS (
        SELECT user_id, ts, event_id, side,
               max(CASE WHEN side = 0 THEN ts END) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_ts,
               last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS back_val
        FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts,
           CASE WHEN back_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(back_ts) <= 3600000000
                THEN back_ts END AS click_ts,
           ROUND(CASE WHEN back_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(back_ts) <= 3600000000
                THEN back_val END, 2) AS click_value
    FROM w WHERE side = 1
    """,
)
def j7_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value", F.lit(1).alias("side")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("side") == 0, F.col("ts"))
    click_val = F.when(F.col("side") == 0, F.col("value"))
    tol_us = 3600 * 1_000_000
    within = F.col("back_ts").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("back_ts") <= tol_us
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("back_ts", F.max(click_ts).over(w))
        .withColumn("back_val", F.last(click_val, ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts",
            F.when(within, F.col("back_ts")).alias("click_ts"),
            F.round(F.when(within, F.col("back_val")), 2).alias("click_value"),
        )
    )


# --------------------------------------------------------------------------
# J11 — join-strategy hints (SHUFFLE_HASH): the optimizer-override surface
# for the case the planner's default gets wrong at scale. Sort-merge is
# Spark's safe default for two unbounded sides, but when one side is known
# to hash-fit per partition after partitioning (customer here: ~1/10 of
# orders, uniformly keyed), SHUFFLE_HASH skips both sort passes — the
# standard tuning move on a 1000-executor cluster where the sorts, not the
# shuffle, dominate. The hint names a STRATEGY, not a size assumption like
# a forced broadcast, so it stays safe on unbounded inputs (each build
# partition is 1/N of the side); the no-forced-broadcast policy at the top
# of this file is untouched. tests/test_plans.py pins ShuffledHashJoin in
# this plan and SortMergeJoin for the MERGE-hinted twin.
# --------------------------------------------------------------------------
@register(
    "j11_join_strategy_hints",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT)    AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS segment_revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def j11_join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("segment_revenue"),
        )
    )


# --------------------------------------------------------------------------
# O11 — AQE runtime skew-join splitting: the OTHER half of the skew story
# next to j8's manual salting — for plain shuffle joins, Spark's adaptive
# engine detects an oversized partition AT RUNTIME from the map-output
# statistics and splits it across reducers, no query rewrite needed (the
# reason AQE is always on in this engine's 100 TB posture). The fact side
# plants a hot key carrying 50% of 200k rows; thresholds are tuned so the
# hot partition trips the detector under the closed-form data. Self-
# certifying (the o9/o10 discipline): the row executes the join, then
# reads the FINAL adaptive plan and pins skew_split_engaged = both the
# SortMergeJoin's skew=true marker AND a skewed AQEShuffleRead present —
# a conf regression that silently stops splitting FAILS the artifact.
# Broadcast is disabled for this row only (temp_conf): skew splitting
# applies to shuffle joins; a dim this small would otherwise broadcast
# (which is the RIGHT plan — j5/q5 pin that path; this row pins the
# fallback when the build side is too big to broadcast).
# --------------------------------------------------------------------------
@register(
    "o11_aqe_skew_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN i % 2 = 0 THEN 0 ELSE i % 997 END AS k,
               (i * i) % 97 AS x
        FROM (SELECT unnest(range(200000)) AS i)
    ), dim AS (
        SELECT i AS k, i % 7 AS grp
        FROM (SELECT unnest(range(997)) AS i)
    )
    SELECT CAST(grp AS BIGINT)      AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT)   AS sx,
           TRUE                     AS skew_split_engaged
    FROM fact JOIN dim USING (k)
    GROUP BY grp
    """,
)
def o11_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contextlib import ExitStack

    from lime_on_spark_spark.session import temp_conf

    with ExitStack() as stack:
        for k, v in (
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.adaptive.skewJoin.enabled", "true"),
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
            (
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "100KB",
            ),
            ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"),
            ("spark.sql.autoBroadcastJoinThreshold", "-1"),
            ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
            ("spark.sql.shuffle.partitions", "8"),
        ):
            stack.enter_context(temp_conf(spark, k, v))
        fact = spark.range(0, 200000, 1, 8).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id") % 997)
            .alias("k"),
            ((F.col("id") * F.col("id")) % 97).alias("x"),
        )
        dim = spark.range(0, 997).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        res = fact.join(dim, "k").groupBy("grp").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
        )
        # collect() under the confs finalizes THIS QueryExecution's
        # adaptive plan; the markers are read from the same execution.
        rows = res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
    engaged = (
        "isFinalPlan=true" in plan
        and "skew=true" in plan
        and "skewed" in plan
    )
    return spark.createDataFrame(
        [(r["grp"], r["n"], r["sx"], bool(engaged)) for r in rows],
        "grp bigint, n bigint, sx bigint, skew_split_engaged boolean",
    )


# --------------------------------------------------------------------------
# O12 — exchange reuse (TPC-H Q15's top-supplier shape): the per-supplier
# revenue aggregate is consumed TWICE — once to find the global maximum,
# once to select the supplier(s) achieving it. A naive planner runs the
# whole scan+shuffle+aggregate pipeline twice; Spark's physical planner
# (and AQE's stage cache) detects the identical subplan and feeds the
# second consumer from the FIRST shuffle's output — pinned here with a
# plan-derived self-certifying boolean (the o10 discipline): the row
# FAILS if `ReusedExchange` ever drops out of the executed plan. Revenue
# is rounded to 2dp BEFORE the max-equality join so the float-sum
# last-ulp never decides the winner differently across engines.
# Scale: at 100 TB the reused exchange halves the dominant cost (the
# lineitem scan + hash shuffle) of every self-referential query — the
# single most common OLAP anti-pattern when hand-materialized instead.
# --------------------------------------------------------------------------
@register(
    "o12_exchange_reuse",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate <  DATE '1995-04-01'
        GROUP BY l_suppkey
    )
    SELECT l_suppkey, total_rev, TRUE AS exchange_reused
    FROM rev WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def o12_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("total_rev")
        )
    )
    best = rev.agg(F.max("total_rev").alias("mx"))
    out = rev.join(best, rev["total_rev"] == best["mx"]).select(
        "l_suppkey", "total_rev"
    )
    rows = out.collect()
    # Self-certifying: read the EXECUTED plan (post-AQE) — the reuse is
    # an artifact fact, not a code comment.
    reused = "ReusedExchange" in (
        out._jdf.queryExecution().executedPlan().toString()
    )
    return spark.createDataFrame(
        [(r["l_suppkey"], r["total_rev"], bool(reused)) for r in rows],
        "l_suppkey bigint, total_rev double, exchange_reused boolean",
    )


# --------------------------------------------------------------------------
# O13 — explicit caching (the third exchange-economy primitive next to
# o3's bucketing and o12's automatic exchange reuse): a per-flag
# aggregate is .cache()d and consumed by TWO differently-shaped
# queries, so the second consumer reads columnar cache blocks
# (InMemoryTableScan — plan-pinned from the executed plan) instead of
# re-running the lineitem scan+shuffle. Unpersisted before returning:
# a leaked cache block would silently warp every later bench/test in
# the shared session. Values are closed-form in the oracle; the
# self-certifying boolean fails the artifact if caching regresses to
# recompute.
# Scale: o12's ReusedExchange only fires within ONE query's plan tree;
# .cache() is the cross-query equivalent — at 100 TB it is the
# difference between N dashboard queries re-scanning the fact table and
# N reads of a columnar in-memory/disk block.
# --------------------------------------------------------------------------
@register(
    "o13_cache_reuse",
    oracle="""
    WITH rev AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT)                         AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS flag_rev
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_items, flag_rev,
           (SELECT ROUND(SUM(flag_rev), 2) FROM rev) AS total_rev,
           TRUE AS cache_scan_pinned
    FROM rev
    """,
)
def o13_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("flag_rev"),
        )
        .cache()
    )
    try:
        # Consumer 1 materializes the cache; consumer 2 must read it.
        total = rev.agg(F.round(F.sum("flag_rev"), 2).alias("t")).first()["t"]
        per_flag = rev.select("l_returnflag", "n_items", "flag_rev")
        rows = per_flag.collect()
        cached_scan = "InMemoryTableScan" in (
            per_flag._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        rev.unpersist()
    return spark.createDataFrame(
        [
            (r["l_returnflag"], r["n_items"], r["flag_rev"], total,
             bool(cached_scan))
            for r in rows
        ],
        "l_returnflag string, n_items bigint, flag_rev double,"
        " total_rev double, cache_scan_pinned boolean",
    )


# --------------------------------------------------------------------------
# O14 — AQE partition coalescing (the fourth physical-layout pin next to
# o11's skew split, o12's exchange reuse, o13's cache): a grouped
# aggregate whose output is tiny runs under shuffle.partitions=32, and
# ADAPTIVE execution coalesces the post-shuffle read into far fewer
# partitions at runtime — the knob that makes one global
# shuffle.partitions setting livable at every scale (small stages stop
# paying 32-task scheduling overhead; at 1000 executors the same
# mechanism stops a 10k-partition default from fragmenting every small
# stage). Self-certifying: the executed plan must contain an
# AQEShuffleRead with coalesced partitions; the aggregate values are
# SQL-exact.
# Scale: pure runtime re-planning — no data-dependent code; the pin
# fails the artifact if AQE coalescing is ever disabled or regresses.
# --------------------------------------------------------------------------
@register(
    "o14_aqe_coalesce",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT)       AS n_items,
           ROUND(SUM(l_quantity), 2)      AS total_qty,
           TRUE AS aqe_coalesced
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def o14_aqe_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf

    li = load_table(spark, sf_dir, "lineitem")
    # Force a genuinely over-partitioned shuffle for the tiny (~4-row)
    # group-by output, then let AQE shrink it at runtime.
    with temp_conf(spark, "spark.sql.shuffle.partitions", "32"):
        agg = li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        rows = agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
    coalesced = "AQEShuffleRead" in plan and "coalesced" in plan
    return spark.createDataFrame(
        [
            (
                r["l_returnflag"],
                r["l_linestatus"],
                r["n_items"],
                r["total_qty"],
                bool(coalesced),
            )
            for r in rows
        ],
        "l_returnflag string, l_linestatus string, n_items bigint,"
        " total_qty double, aqe_coalesced boolean",
    )


# --------------------------------------------------------------------------
# O15 — AQE sort-merge -> broadcast-hash conversion (the fifth adaptive
# pin next to o11 skew / o12 exchange reuse / o13 cache / o14 coalesce):
# with STATIC broadcast planning disabled (the cold-start reality at
# 100 TB — file-size estimates lie, so a conservative site sets the
# static threshold low or off), the initial physical plan for
# lineitem x supplier is a shuffle join; at runtime AQE observes the
# built side's ACTUAL shuffle bytes under the adaptive threshold and
# re-plans the remaining stages as a broadcast-hash join, erasing the
# big side's shuffle. This is the mechanism that makes join strategy
# robust to stale statistics at scale — the pin fails the artifact if
# conversion regresses. Self-certifying: the pre-adaptive plan must show
# the shuffle join, the executed plan the broadcast; aggregates SQL-exact.
# Scale: runtime re-planning only — no data-dependent code. The converted
# probe side is read with local shuffle readers (no extra exchange).
# --------------------------------------------------------------------------
@register(
    "o15_aqe_bhj_conversion",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT)                          AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           TRUE AS converted_to_broadcast
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def o15_aqe_bhj_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    # Static broadcast OFF (the adaptive threshold would fall back to the
    # static one when unset, so it is pinned explicitly).
    with temp_conf(
        spark, "spark.sql.autoBroadcastJoinThreshold", "-1"
    ), temp_conf(
        spark, "spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB"
    ):
        agg = (
            li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
            .groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                F.round(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    2,
                ).alias("revenue"),
            )
        )
        # The INITIAL physical plan (pre-adaptive) must be a shuffle join —
        # otherwise the row is pinning nothing.
        static_plan = agg._jdf.queryExecution().sparkPlan().toString()
        rows = agg.collect()
        final_plan = agg._jdf.queryExecution().executedPlan().toString()
    converted = (
        (
            "SortMergeJoin" in static_plan
            or "ShuffledHashJoin" in static_plan
        )
        and "BroadcastHashJoin" not in static_plan
        and "BroadcastHashJoin" in final_plan
    )
    return spark.createDataFrame(
        [
            (
                r["s_nationkey"],
                r["n_items"],
                r["revenue"],
                bool(converted),
            )
            for r in rows
        ],
        "s_nationkey bigint, n_items bigint, revenue double,"
        " converted_to_broadcast boolean",
    )


# --------------------------------------------------------------------------
# J12 — null-aware anti join: NOT IN over a nullable subquery is SQL's
# sharpest 3VL trap — one NULL in the subquery makes `x NOT IN (...)`
# UNKNOWN for every x, so the result is EMPTY, and a plain left-anti
# rewrite (NOT EXISTS semantics) silently returns rows instead. Spark
# plans the correct semantics as a null-aware anti join (BroadcastHashJoin
# ... LeftAnti, BuildRight, true — the trailing flag IS the null-aware
# bit, conf spark.sql.optimizeNullAwareAntiJoin). The row runs both arms:
# the null-poisoned subquery (must yield 0) and the IS NOT NULL-guarded
# one (the query users actually mean), plus the plan pin.
# Scale: null-aware anti join requires a broadcastable build side (the
# streamed side must test against ALL build nulls) — which is why the
# guarded NOT EXISTS spelling is the 100 TB-safe default and this row
# keeps the subquery bounded.
# --------------------------------------------------------------------------
@register(
    "j12_null_aware_anti",
    oracle="""
    WITH sub AS (
        SELECT CASE WHEN o_totalprice > 400000 THEN o_custkey END AS k
        FROM orders
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_customers,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM sub))    AS n_with_null,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_custkey NOT IN
                (SELECT k FROM sub WHERE k IS NOT NULL))   AS n_guarded,
           TRUE AS null_aware_planned
    """,
)
def j12_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("j12_customer")
    orders.select(
        F.when(F.col("o_totalprice") > 400000, F.col("o_custkey")).alias("k")
    ).createOrReplaceTempView("j12_sub")
    n_customers = cust.count()
    with_null = spark.sql(
        "SELECT count(*) AS n FROM j12_customer "
        "WHERE c_custkey NOT IN (SELECT k FROM j12_sub)"
    )
    n_with_null = with_null.collect()[0]["n"]
    # The trailing `true` on the LeftAnti broadcast join is Spark's
    # isNullAwareAntiJoin flag — pin it from the executed plan.
    naaj = "LeftAnti, BuildRight, true" in (
        with_null._jdf.queryExecution().executedPlan().toString()
    )
    n_guarded = spark.sql(
        "SELECT count(*) AS n FROM j12_customer WHERE c_custkey NOT IN "
        "(SELECT k FROM j12_sub WHERE k IS NOT NULL)"
    ).collect()[0]["n"]
    return spark.createDataFrame(
        [(n_customers, n_with_null, n_guarded, bool(naaj))],
        "n_customers bigint, n_with_null bigint, n_guarded bigint,"
        " null_aware_planned boolean",
    )
