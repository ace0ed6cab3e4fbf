"""Extra source/sink formats beyond SURVEY.md §2a's parquet rows: CSV, JSON
(lines), and ORC round-trips.

Each query writes a table to the format under test, reads it back, and
aggregates the READ-BACK copy; the DuckDB oracle aggregates the original
parquet. A hash match therefore proves the sink+source pair is lossless —
schema, values, and row multiplicity all survive the round trip.

Scale notes: the writes are distributed (`df.write`, one file per task, no
driver collect); the read-backs use explicit schemas (no inference scan).
Paths are unique per invocation (applicationId + uuid) so concurrent runs
never collide — the same isolation rule as d7_lang_routing.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


def _scratch(spark: SparkSession, tag: str) -> str:
    base = os.environ.get(
        "LIME_ON_SPARK_SCRATCH",
        os.path.join(os.path.dirname(__file__), "..", "..", ".scratch"),
    )
    unique = f"{spark.sparkContext.applicationId}-{uuid.uuid4().hex[:12]}"
    return os.path.join(os.path.abspath(base), f"{tag}-{unique}")


_CUSTOMER_AGG_ORACLE = """
    SELECT c_mktsegment,
           COUNT(*)                    AS n_customers,
           ROUND(SUM(c_acctbal), 2)    AS total_bal,
           ROUND(AVG(c_acctbal), 4)    AS avg_bal,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer
    GROUP BY c_mktsegment
"""


def _customer_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.min("c_custkey").cast("bigint").alias("min_key"),
        F.max("c_custkey").cast("bigint").alias("max_key"),
    )


# --------------------------------------------------------------------------
# S4b — CSV sink + source round-trip (header, explicit read schema)
# --------------------------------------------------------------------------
@register("s4_csv_roundtrip", oracle=_CUSTOMER_AGG_ORACLE)
def s4_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip must survive doubles (Java shortest-round-trip
    formatting) and strings; the read uses the writer's schema, never
    inference (an inference pass is an extra full scan at 100 TB)."""
    cust = load_table(spark, sf_dir, "customer")
    path = _scratch(spark, "s4_csv")
    cust.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(cust.schema).option("header", True).csv(path)
    return _customer_agg(back)


# --------------------------------------------------------------------------
# S4c — JSON-lines sink + source round-trip
# --------------------------------------------------------------------------
@register("s4_json_roundtrip", oracle=_CUSTOMER_AGG_ORACLE)
def s4_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    path = _scratch(spark, "s4_json")
    cust.write.mode("overwrite").json(path)
    back = spark.read.schema(cust.schema).json(path)
    return _customer_agg(back)


# --------------------------------------------------------------------------
# S4d — ORC sink + source round-trip (columnar alternative to parquet)
# --------------------------------------------------------------------------
@register("s4_orc_roundtrip", oracle=_CUSTOMER_AGG_ORACLE)
def s4_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    path = _scratch(spark, "s4_orc")
    cust.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return _customer_agg(back)


# --------------------------------------------------------------------------
# O3 — bucketed tables + shuffle-free co-located join. At 100 TB, bucketing
# the two biggest fact tables on their join key at write time removes the
# per-query shuffle entirely: both scans come up hash-partitioned the same
# way and the SortMergeJoin runs in place. The helper exposes the raw
# bucketed join so tests/test_bucketing.py can assert the physical plan has
# NO Exchange; the registered query returns the (oracle-checked) aggregate.
# --------------------------------------------------------------------------
_BUCKETED_JOIN_ORACLE = """
    SELECT c_mktsegment,
           COUNT(*)                      AS n_orders,
           ROUND(SUM(o_totalprice), 2)   AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
"""


def bucketed_join_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[str]]:
    """Write orders/customer bucketed by the join key, return (joined_df,
    table_names). Caller drops the tables after materializing."""
    unique = uuid.uuid4().hex[:12]
    t_orders = f"o3_orders_b_{unique}"
    t_cust = f"o3_cust_b_{unique}"
    (
        load_table(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(t_orders)
    )
    (
        load_table(spark, sf_dir, "customer")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(t_cust)
    )
    # MERGE hint pins SortMergeJoin so the no-Exchange claim tests the
    # bucketing, not an AQE broadcast that would also skip the shuffle.
    joined = (
        spark.table(t_orders)
        .hint("MERGE")
        .join(spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return joined, [t_orders, t_cust]


@register("o3_bucketed_join", oracle=_BUCKETED_JOIN_ORACLE)
def o3_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined, tables = bucketed_join_frames(spark, sf_dir)
    result = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    rows = result.collect()  # materialize before dropping the tables
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return spark.createDataFrame(rows, result.schema)


# --------------------------------------------------------------------------
# S4e — parquet schema evolution: two writer generations land files with
# different schemas in the same dataset; mergeSchema=true reconciles them
# at read time (missing columns -> NULL). The other half of the U4 story:
# drift handled at the storage layer instead of the union operator.
# --------------------------------------------------------------------------
@register(
    "s4_merge_schema",
    oracle="""
    SELECT lang,
           COUNT(*)     AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT lang, CAST(NULL AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 1
    ) merged
    GROUP BY lang
    """,
)
def s4_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    base = _scratch(spark, "s4-mergeschema")
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "lang")
        .write.parquet(f"{base}/gen=1")
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "lang", "n_chars")
        .write.parquet(f"{base}/gen=2")
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    result = merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("total_chars"),
    )
    rows = result.collect()  # materialize before the scratch dir disappears
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


# --------------------------------------------------------------------------
# S4f — hive-partitioned write + partition-pruned read. partitionBy at
# write time is what makes 100-TB scans affordable: a reader filtering on
# the partition column touches only matching directories (PartitionFilters
# in the scan, asserted by tests/test_bucketing.py).
# --------------------------------------------------------------------------
def partition_pruned_scan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, str]:
    """Write events partitioned by event_type, return (pruned_df, base_dir).
    Caller cleans up base_dir after materializing."""
    events = load_table(spark, sf_dir, "events")
    base = _scratch(spark, "s4-partitioned")
    events.write.partitionBy("event_type").parquet(base)
    pruned = spark.read.parquet(base).filter(F.col("event_type") == "purchase")
    return pruned, base


@register(
    "s4_partition_pruning",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           COUNT(*)              AS n_purchases,
           ROUND(SUM(value), 2)  AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY day
    """,
)
def s4_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    pruned, base = partition_pruned_scan(spark, sf_dir)
    result = pruned.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    rows = result.collect()
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


# --------------------------------------------------------------------------
# S4g — small-file compaction: the lakehouse maintenance pass. Streaming /
# per-task writers fragment a table into thousands of tiny files; at 100 TB
# the resulting per-file open/footer overhead dominates scan time (the
# "small files problem"). The compactor rewrites the table to max(1,
# bytes/target) evenly-sized files via repartition — a single shuffle whose
# output is the ONLY state; no driver materialization. The query fragments
# documents into 64 shards, compacts to 4, and aggregates the compacted
# copy: the oracle aggregating the ORIGINAL parquet proves row/value
# conservation end-to-end, and the in-query verdict pins the file-count
# drop (the part SQL can't see).
# --------------------------------------------------------------------------
@register(
    "s4_compaction",
    oracle="""
    SELECT lang,
           COUNT(*)                      AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
           CAST(MIN(doc_id) AS BIGINT)   AS min_id,
           CAST(MAX(doc_id) AS BIGINT)   AS max_id,
           TRUE                          AS compacted_ok
    FROM documents
    GROUP BY lang
    """,
)
def s4_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _n_files(path: str) -> int:
        return sum(
            1
            for _, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    docs = load_table(spark, sf_dir, "documents")
    frag_path = _scratch(spark, "s4_frag")
    docs.repartition(64).write.mode("overwrite").parquet(frag_path)
    n_before = _n_files(frag_path)

    compact_path = _scratch(spark, "s4_compact")
    # repartition (not coalesce): coalesce(4) would chain 16 source files
    # per task WITHOUT rebalancing bytes, so one straggler file skews the
    # output; the shuffle buys evenly-sized target files — what you want
    # when the compacted table is read thousands of times afterwards.
    spark.read.parquet(frag_path).repartition(4).write.mode(
        "overwrite"
    ).parquet(compact_path)
    n_after = _n_files(compact_path)

    back = spark.read.parquet(compact_path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
        F.lit(n_after < n_before and n_after <= 4).alias("compacted_ok"),
    )


# --------------------------------------------------------------------------
# S6 — custom Python DataSource (Spark 4 pyspark.sql.datasource): a
# connector written in Python whose scan still fans out across executors
# (one task per InputPartition). The registered source generates a
# deterministic closed-form series, so DuckDB reproduces it from range()
# exactly — proving rows arrive complete and partition slicing drops or
# duplicates nothing (the classic custom-connector bug class).
# --------------------------------------------------------------------------
@register(
    "s6_python_datasource",
    oracle="""
    SELECT CAST(i % 8 AS INT)                          AS bucket,
           COUNT(*)                                    AS n,
           ROUND(SUM((i * i % 97) / 10.0), 4)          AS sum_v,
           CAST(MIN(i) AS BIGINT)                      AS min_i,
           CAST(MAX(i) AS BIGINT)                      AS max_i
    FROM (SELECT unnest(range(5000)) AS i)
    GROUP BY bucket
    """,
)
def s6_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import SyntheticSeriesSource

    try:
        spark.dataSource.register(SyntheticSeriesSource)
    except Exception:
        pass  # already registered in this session
    series = (
        spark.read.format("synthetic_series")
        .option("n", 5000)
        .option("partitions", 8)
        .load()
    )
    return series.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 4).alias("sum_v"),
        F.min("i").cast("bigint").alias("min_i"),
        F.max("i").cast("bigint").alias("max_i"),
    )


# --------------------------------------------------------------------------
# S7 — corrupt-record tolerance: at 100 TB some fraction of every JSON feed
# is malformed, and a scan that throws on the first bad byte is useless.
# The pipeline contract is: parse what parses, quarantine what doesn't,
# count both. Corruption is injected deterministically (every 97th event's
# props gets a leading junk byte — LEADING, because Jackson and most
# streaming parsers accept trailing garbage after a complete object) so
# the oracle can replicate the rule; the
# Spark side parses with from_json (malformed -> NULL struct, the
# PERMISSIVE contract) and splits the feed into parsed/quarantined counts
# per event type — one scan, no driver involvement.
# --------------------------------------------------------------------------
@register(
    "s7_corrupt_json_handling",
    oracle="""
    WITH feed AS (
        SELECT event_type,
               CASE WHEN event_id % 97 = 0 THEN 'x' || props
                    ELSE props END AS raw
        FROM events
    )
    SELECT event_type,
           COUNT(*)                                           AS n_rows,
           CAST(SUM(CASE WHEN json_valid(raw) THEN 1 ELSE 0 END)
                AS BIGINT)                                    AS n_parsed,
           CAST(SUM(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END)
                AS BIGINT)                                    AS n_quarantined,
           CAST(SUM(CASE WHEN json_valid(raw)
                    THEN CAST(raw ->> '$.k' AS BIGINT) ELSE 0 END)
                AS BIGINT)                                    AS sum_k
    FROM feed
    GROUP BY event_type
    """,
)
def s7_corrupt_json_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 97 == 0, F.concat(F.lit("x"), "props")
    ).otherwise(F.col("props"))
    # PERMISSIVE from_json returns an all-null struct (not NULL) for bad
    # input; the quarantine signal is the declared corrupt-record column,
    # which carries the raw bytes iff the parse failed.
    parsed = F.from_json(
        raw,
        "k bigint, _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    return (
        events.select("event_type", parsed.alias("p"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("p._corrupt").isNull().cast("int")).cast("bigint").alias(
                "n_parsed"
            ),
            F.sum(F.col("p._corrupt").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_quarantined"),
            F.sum(F.coalesce(F.col("p.k"), F.lit(0))).cast("bigint").alias(
                "sum_k"
            ),
        )
    )


# --------------------------------------------------------------------------
# O6 — dynamic partition pruning: the flagship 100-TB scan optimization.
# The fact table is laid out partitioned by ship month; the date dimension
# (derived from orders, as a warehouse date-dim would be) is filtered to
# one quarter. The fact side's month list is NOT statically knowable, so
# Catalyst inserts a dynamicpruningexpression subquery that reuses the
# broadcast dim to prune fact partitions AT RUNTIME — the scan reads 3
# month-directories out of ~84 instead of the whole table. The in-query
# verdict pins `dynamicpruningexpression` in the executed plan (the part
# SQL can't see); the oracle recomputes the join-aggregate directly.
# --------------------------------------------------------------------------
@register(
    "o6_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
        FROM orders
        WHERE EXTRACT(year FROM o_orderdate) = 1995
          AND EXTRACT(quarter FROM o_orderdate) = 2
    )
    SELECT l.ship_month, CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price,
           TRUE AS dpp_active
    FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_extendedprice
          FROM lineitem) l
    JOIN dim d ON l.ship_month = d.ship_month
    GROUP BY l.ship_month
    """,
)
def o6_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    path = _scratch(spark, "o6_dpp")
    li.select("l_extendedprice", "ship_month").write.partitionBy(
        "ship_month"
    ).mode("overwrite").parquet(path)
    # At this toy scale the stats-based benefit heuristic (estimated
    # pruned bytes vs subquery overhead) correctly rejects DPP, so the
    # demo disables useStats for this one query; on a real 100 TB fact
    # table the stats themselves show the benefit and DPP fires with
    # defaults. Restored in `finally` — per-query, not session-wide.
    use_stats_key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    prev = spark.conf.get(use_stats_key, "true")
    spark.conf.set(use_stats_key, "false")
    try:
        fact = spark.read.parquet(path)
        dim = (
            load_table(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= "1995-04-01")
                & (F.col("o_orderdate") <= "1995-06-30")
            )
            .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
            .distinct()
        )
        res = (
            fact.join(F.broadcast(dim), "ship_month")
            .groupBy("ship_month")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            )
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        dpp = "dynamicpruningexpression" in plan.lower()
        rows = [(*r, dpp) for r in res.collect()]
        schema = "ship_month string, n_rows bigint, total_price double, dpp_active boolean"
        return spark.createDataFrame(rows, schema)
    finally:
        spark.conf.set(use_stats_key, prev)
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# S8 — text-line sink + source round-trip: the 5th format family (after
# parquet/csv/json/orc). Raw-text lakes (log shipping, WET extracts) store
# one record per line with an ad-hoc delimiter; the reader gets ONE
# `value` column and parsing is explicit scan-stage expressions — schema
# lives in the pipeline, not the file. The round-trip pins both
# directions: spark.write.text emits the tab-joined records, read.text +
# split reparses them, and the oracle aggregates the ORIGINAL table, so
# any quoting/escaping/ordering loss breaks the match.
# --------------------------------------------------------------------------
@register(
    "s8_text_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)         AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)     AS total_chars,
           CAST(MIN(doc_id) AS BIGINT)      AS min_id,
           CAST(MAX(doc_id) AS BIGINT)      AS max_id
    FROM documents
    GROUP BY lang
    """,
)
def s8_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    path = _scratch(spark, "s8_text")
    # Tab never occurs in the corpus text (space-separated word salad), so
    # it is a safe line-level delimiter; a production WET writer would
    # escape instead.
    lines = docs.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            "lang",
            F.col("n_chars").cast("string"),
            "text",
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    try:
        parsed = (
            spark.read.text(path)
            .select(F.split("value", "\t", 4).alias("f"))
            .select(
                F.col("f")[0].cast("bigint").alias("doc_id"),
                F.col("f")[1].alias("lang"),
                F.col("f")[2].cast("bigint").alias("n_chars"),
                F.col("f")[3].alias("text"),
            )
        )
        result = parsed.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# S10 — dynamic partition overwrite: the idempotent-backfill primitive.
# With partitionOverwriteMode=dynamic, an INSERT OVERWRITE replaces ONLY
# the partitions present in the incoming data — re-running yesterday's
# job rewrites yesterday's directories and leaves the rest of a 100 TB
# table untouched (static mode would truncate the whole table). The query
# lays documents out partitioned by lang, re-processes ONLY the 'en'
# partition (n_chars + 1000), and aggregates the readback: en rows carry
# the bump, other langs are bit-identical originals — which is exactly
# what the oracle's CASE reproduces. Conf is set per-query and restored.
# --------------------------------------------------------------------------
@register(
    "s10_dynamic_partition_overwrite",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN n_chars + 1000
                         ELSE n_chars END) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM documents
    GROUP BY lang
    """,
)
def s10_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    path = _scratch(spark, "s10_dpo")
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    docs.write.partitionBy("lang").mode("overwrite").parquet(path)
    try:
        spark.conf.set(mode_key, "dynamic")
        # The backfill job: only the 'en' partition is in the incoming
        # frame, so only .../lang=en is rewritten.
        (
            docs.filter(F.col("lang") == "en")
            .withColumn("n_chars", F.col("n_chars") + 1000)
            .write.partitionBy("lang")
            .mode("overwrite")
            .parquet(path)
        )
        back = spark.read.parquet(path)
        result = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        spark.conf.set(mode_key, prev)
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# O8 — catalog statistics via ANALYZE TABLE (cost-based-optimizer food):
# at 100 TB the CBO's join-order and broadcast decisions are only as good
# as table/column stats, and ANALYZE is the maintenance job that feeds
# them. The query materializes documents as a catalog table, runs ANALYZE
# (table-level + column-level), reads the recorded rowCount/distinct
# counts back via the catalog, and pins rowCount == actual as the
# verdict. DESCRIBE-based stats readout is the same surface a human
# operator checks.
# --------------------------------------------------------------------------
@register(
    "o8_analyze_table_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           TRUE AS stats_match_actual
    FROM documents
    """,
)
def o8_analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    t = f"o8_docs_{uuid.uuid4().hex[:12]}"
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").format("parquet").saveAsTable(t)
    try:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR COLUMNS lang")
        # Catalog-recorded stats, as the CBO sees them.
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t}").select(
                F.col("col_name").alias("info_name"),
                F.col("data_type").alias("info_value"),
            ).collect()
        }
        stats_line = desc.get("Statistics", "")
        col_desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE EXTENDED {t} lang").select(
                F.col("info_name"), F.col("info_value")
            ).collect()
        }
        actual_rows = spark.table(t).count()
        actual_langs = spark.table(t).select("lang").distinct().count()
        stated_rows = None
        for tok in stats_line.replace(",", " ").split():
            if tok.isdigit():
                stated_rows = int(tok)  # last integer = row count
        stated_langs = int(col_desc.get("distinct_count", "-1"))
        ok = stated_rows == actual_rows and stated_langs == actual_langs
        return spark.createDataFrame(
            [(actual_rows, actual_langs, ok)],
            "n_rows bigint, n_langs bigint, stats_match_actual boolean",
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# --------------------------------------------------------------------------
# O9 — runtime Bloom-filter join pruning (the shuffle-join analog of O6's
# DPP): for a selective dim-side filter on a NON-partition key, Catalyst
# builds a bloom_filter_agg over the dim's join keys and injects
# might_contain on the fact side, so most fact rows drop BEFORE the join
# shuffle instead of after it — at 100 TB this is the difference between
# shuffling the whole fact table and shuffling the matching fraction. The
# creation/application thresholds are tuned for real tables, so the demo
# forces them for this one query (restored in `finally`); broadcast is
# disabled so a shuffle join actually exists to prune. The in-query
# verdict pins bloom_filter_agg + might_contain in the optimized plan;
# the filter is semantics-preserving, so the oracle is the plain
# join-aggregate.
# --------------------------------------------------------------------------
@register(
    "o9_bloom_filter_join",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)          AS n_rows,
           ROUND(SUM(l_extendedprice), 2)    AS total_price,
           TRUE                              AS bloom_active
    FROM lineitem l
    JOIN (SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT') o
      ON l.l_orderkey = o.o_orderkey
    GROUP BY l_returnflag
    """,
)
def o9_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        dim = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        res = (
            li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            )
        )
        plan = res._jdf.queryExecution().optimizedPlan().toString()
        bloom = "bloom_filter_agg" in plan and "might_contain" in plan
        rows = [(*r, bloom) for r in res.collect()]
        schema = (
            "l_returnflag string, n_rows bigint, total_price double,"
            " bloom_active boolean"
        )
        return spark.createDataFrame(rows, schema)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --------------------------------------------------------------------------
# S12 — Python DataSource WRITER (Spark 4 `DataSource.writer`): the missing
# quadrant of the custom-connector matrix (s6 read-batch, s11 read-stream).
# Executors spool one JSON-lines file per partition and return per-task
# commit messages; the driver's commit() publishes them atomically behind
# _MANIFEST.json (two-phase commit — readers consume ONLY manifest-listed
# files, so a crashed job leaks nothing). The query writes lineitem's money
# columns through the sink, reads back exactly the manifest's files, and
# aggregates the READ-BACK copy — the oracle aggregates the original
# parquet, so a hash match proves conservation across the Python write
# path. The abort path (planted task failure -> no manifest, no visible
# files) is exercised in tests/test_plans.py.
# --------------------------------------------------------------------------
@register(
    "s12_python_datasource_sink",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)          AS n_rows,
           ROUND(SUM(l_quantity), 2)         AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)    AS sum_price,
           CAST(4 AS BIGINT)                 AS n_files,
           TRUE                              AS manifest_rows_match
    FROM lineitem
    """,
)
def s12_python_datasource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from lime_on_spark_spark.sources.python_source import JsonManifestSink

    try:
        spark.dataSource.register(JsonManifestSink)
    except Exception:
        pass  # already registered in this session
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    path = _scratch(spark, "s12_sink")
    (
        src.repartition(4)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    with open(os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f["name"]) for f in manifest["files"]]
    back = spark.read.schema(src.schema).json(files)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.lit(len(files)).cast("bigint").alias("n_files"),
        (F.count(F.lit(1)) == F.lit(manifest["total_rows"])).alias(
            "manifest_rows_match"
        ),
    )


# --------------------------------------------------------------------------
# S14 — Python DataSource filter pushdown (Spark 4.1 `pushFilters`): the
# planning-time quadrant of the Python connector matrix (s6 read, s11
# stream-read, s12 write). The reader handles EqualTo(bucket) by striding
# the generated series and LessThan(i) by clamping partition planning, so
# the connector materializes only matching rows — for a database- or
# API-backed source this is the difference between reading a partition and
# reading the world. The emitted `pushed` flag records, per row, that BOTH
# predicates actually arrived via pushFilters; the oracle pins
# filter_pushed = TRUE, so the correctness artifact fails — not just slows
# down — if planning ever stops pushing.
# --------------------------------------------------------------------------
@register(
    "s14_python_datasource_pushdown",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)             AS n,
           ROUND(SUM((i * i % 97) / 10.0), 4)   AS sum_v,
           CAST(MIN(i) AS BIGINT)               AS min_i,
           CAST(MAX(i) AS BIGINT)               AS max_i,
           TRUE                                 AS filter_pushed
    FROM (SELECT unnest(range(5000)) AS i)
    WHERE i % 8 = 3 AND i < 4000
    """,
)
def s14_python_datasource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import FilteredSeriesSource

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        try:
            spark.dataSource.register(FilteredSeriesSource)
        except Exception:
            pass  # already registered in this session
        series = (
            spark.read.format("synthetic_series_pushdown")
            .option("n", 5000)
            .option("partitions", 8)
            .load()
        )
        # collect() under the enabled conf, then return a local frame: the
        # conf is restored on exit, so this query cannot silently re-plan
        # every LATER Python-source scan in the shared session under a
        # pushdown mode they were not written for.
        rows = (
            series.filter((F.col("bucket") == 3) & (F.col("i") < 4000))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum("v"), 4).alias("sum_v"),
                F.min("i").cast("bigint").alias("min_i"),
                F.max("i").cast("bigint").alias("max_i"),
                F.bool_and("pushed").alias("filter_pushed"),
            )
            .collect()
        )
        return spark.createDataFrame(
            rows,
            "n bigint, sum_v double, min_i bigint, max_i bigint,"
            " filter_pushed boolean",
        )


def _register_manifest_classes(spark: SparkSession) -> None:
    """Register the sink+source pair (idempotent per session) — the shared
    prologue of every manifest-connector row (s16/s17/s18)."""
    from lime_on_spark_spark.sources.python_source import (
        JsonManifestSink,
        JsonManifestSource,
    )

    for cls in (JsonManifestSink, JsonManifestSource):
        try:
            spark.dataSource.register(cls)
        except Exception:
            pass  # already registered in this session


def _synthetic_series(spark: SparkSession, lo: int, hi: int, parts: int):
    """(i, v) over [lo, hi) in `parts` contiguous range partitions — the
    closed-form series every manifest row writes and every oracle replays
    as `(i * i % 97) / 10.0`."""
    return spark.range(lo, hi, 1, parts).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.col("id") % 97) / 10.0).alias("v"),
    )


def _seed_retained_dir(spark: SparkSession, path: str) -> None:
    """Three retained commits — append 4000/4 files, append 2000/2,
    logical-overwrite 1000/2 — the directory state BOTH s17 (time travel)
    and s18 (vacuum) assert closed-form counts against. One definition so
    the two rows can never drift onto different seeds."""
    for df, mode in (
        (_synthetic_series(spark, 0, 4000, 4), "append"),      # -> v1
        (_synthetic_series(spark, 4000, 6000, 2), "append"),   # -> v2
        (_synthetic_series(spark, 0, 1000, 2), "overwrite"),   # -> v3
    ):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode(mode)
            .save()
        )


# --------------------------------------------------------------------------
# S16 — manifest data skipping: the lakehouse zone-map primitive, fusing
# s12's writer (per-file per-column min/max stats in _MANIFEST.json) with
# s14's pushFilters machinery into WHOLE-FILE pruning. spark.range's
# contiguous partitions give 4 files with disjoint id zones [0,2k),
# [2k,4k), [4k,6k), [6k,8k); the band predicate 2500 <= i < 5500 zone-
# prunes files 1 and 4, so planning opens 2 of 4 files — the reader
# emits (n_files_read, n_files_total) on every row and the oracle pins
# files_read = 2 < files_total = 4, so the artifact FAILS (not just
# slows down) if skipping stops working. Accepted filters are also
# applied row-exactly in read() (zone overlap does not imply every row
# matches), and tests/test_plans.py plants unparseable bytes in a pruned
# file to prove it is never opened.
# Scale: stats ride the existing commit messages (O(#files) driver state)
# and pruning is a driver-side manifest scan before planning — the same
# shape as Delta/Iceberg data skipping; at 100 TB a clustered predicate
# reads the zone, not the world.
# --------------------------------------------------------------------------
@register(
    "s16_manifest_data_skipping",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)             AS n,
           ROUND(SUM((i * i % 97) / 10.0), 4)   AS sum_v,
           CAST(MIN(i) AS BIGINT)               AS min_i,
           CAST(MAX(i) AS BIGINT)               AS max_i,
           CAST(2 AS BIGINT)                    AS files_read,
           CAST(4 AS BIGINT)                    AS files_total,
           TRUE                                 AS skipping_effective
    FROM (SELECT unnest(range(8000)) AS i)
    WHERE i >= 2500 AND i < 5500
    """,
)
def s16_manifest_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf

    _register_manifest_classes(spark)
    # 4 contiguous range partitions -> 4 files with DISJOINT id zones
    # (spark.range slices [p*2000, (p+1)*2000) per partition id).
    src = _synthetic_series(spark, 0, 8000, 4)
    path = _scratch(spark, "s16_skip")
    (
        src.write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        back = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
        )
        # collect() under the enabled conf (the s14 discipline): the conf
        # is restored on exit so later Python-source scans in the shared
        # session are not silently re-planned under pushdown.
        rows = (
            back.filter((F.col("i") >= 2500) & (F.col("i") < 5500))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum("v"), 4).alias("sum_v"),
                F.min("i").cast("bigint").alias("min_i"),
                F.max("i").cast("bigint").alias("max_i"),
                F.min("n_files_read").cast("bigint").alias("files_read"),
                F.min("n_files_total").cast("bigint").alias("files_total"),
                (F.min("n_files_read") < F.min("n_files_total")).alias(
                    "skipping_effective"
                ),
            )
            .collect()
        )
    return spark.createDataFrame(
        rows,
        "n bigint, sum_v double, min_i bigint, max_i bigint,"
        " files_read bigint, files_total bigint, skipping_effective boolean",
    )


# --------------------------------------------------------------------------
# S17 — manifest time travel: every commit writes an immutable
# _MANIFEST-v{N}.json snapshot before updating the latest pointer, and
# the reader's `version` option plans against any snapshot — the
# Delta/Iceberg AS OF primitive on the Python connector. Three commits
# (append v1, append v2, logical-overwrite v3 with retain_history so v1/
# v2's files survive on disk) and three versioned reads: the oracle pins
# each version's row count, value sum, and file count closed-form, so
# the artifact fails if any snapshot drifts, the overwrite clobbers
# history, or the version pointer skips. Reclaiming retained files is an
# explicit vacuum, never a write side effect — at 100 TB an overwrite
# that eagerly deleted history would break every concurrent AS OF reader.
# --------------------------------------------------------------------------
@register(
    "s17_manifest_time_travel",
    oracle="""
    SELECT CAST(3 AS BIGINT)  AS latest_version,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(4000)) AS i))          AS v1_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(4000)) AS i))          AS v1_sum,
           CAST(4 AS BIGINT)  AS v1_files,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(6000)) AS i))          AS v2_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(6000)) AS i))          AS v2_sum,
           CAST(6 AS BIGINT)  AS v2_files,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(1000)) AS i))          AS v3_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(1000)) AS i))          AS v3_sum,
           CAST(2 AS BIGINT)  AS v3_files
    """,
)
def s17_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_manifest_classes(spark)
    path = _scratch(spark, "s17_tt")
    # v1: 4 files / 4000 rows; v2: 6 files / 6000 rows; v3 (overwrite,
    # retained): 2 files / 1000 rows — see _seed_retained_dir.
    _seed_retained_dir(spark, path)

    def read_version(version: int | None):
        rd = spark.read.format("json_manifest_source").option("path", path)
        if version is not None:
            rd = rd.option("version", version)
        return rd.load()

    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import _load_manifest

    # Spark refuses to plan a pushFilters-implementing Python source with
    # the pushdown conf off; collect under it and return a local frame
    # (the s14/s16 conf-isolation discipline).
    vals: list = []
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        for version in (1, 2, None):  # None = latest
            row = (
                read_version(version)
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.round(F.sum("v"), 4).alias("s"),
                    F.min("n_files_total").cast("bigint").alias("f"),
                )
                .first()
            )
            vals += [row["n"], row["s"], row["f"]]
    latest = _load_manifest(path)["version"]
    return spark.createDataFrame(
        [tuple([latest] + vals)],
        "latest_version bigint,"
        " v1_rows bigint, v1_sum double, v1_files bigint,"
        " v2_rows bigint, v2_sum double, v2_files bigint,"
        " v3_rows bigint, v3_sum double, v3_files bigint",
    )


# --------------------------------------------------------------------------
# S18 — manifest vacuum: the retention-reclaim half of the s17 contract
# (writes never delete history; VACUUM does, explicitly — the Delta
# VACUUM / Iceberg expire_snapshots primitive). After s17's three
# retained commits, vacuum(retain_versions=1) must keep exactly the
# latest snapshot's files, delete the 6 orphaned data files and the 2
# expired _MANIFEST-v{N} snapshots, leave the latest read intact, and
# make the expired version UNREADABLE (pinned as a boolean — the reclaim
# is real, not bookkeeping). All counts closed-form in the oracle.
# Scale: driver-side O(#files) metadata pass; no data read, no job run —
# at 100 TB vacuum cost is listing, which is why retention is a separate
# explicit operation.
# --------------------------------------------------------------------------
@register(
    "s18_manifest_vacuum",
    oracle="""
    SELECT CAST(8 AS BIGINT) AS files_before,
           CAST(2 AS BIGINT) AS files_after,
           CAST(6 AS BIGINT) AS removed_files,
           CAST(2 AS BIGINT) AS removed_manifests,
           CAST(3 AS BIGINT) AS version_floor,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(1000)) AS i))   AS latest_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(1000)) AS i))   AS latest_sum,
           TRUE AS expired_version_unreadable
    """,
)
def s18_manifest_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        _load_manifest,
        vacuum_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s18_vac")
    _seed_retained_dir(spark, path)

    def data_files() -> int:
        return sum(
            1
            for n in os.listdir(path)
            if n.endswith(".json") and not n.startswith("_")
        )

    before = data_files()
    report = vacuum_manifest_path(path, retain_versions=1)
    after = data_files()
    try:
        _load_manifest(path, 1)
        expired_unreadable = False
    except FileNotFoundError:
        expired_unreadable = True
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum("v"), 4).alias("s"),
            )
            .first()
        )
    return spark.createDataFrame(
        [
            (
                before,
                after,
                report["removed_files"],
                report["removed_manifests"],
                report["version_floor"],
                row["n"],
                row["s"],
                expired_unreadable,
            )
        ],
        "files_before bigint, files_after bigint, removed_files bigint,"
        " removed_manifests bigint, version_floor bigint,"
        " latest_rows bigint, latest_sum double,"
        " expired_version_unreadable boolean",
    )


# --------------------------------------------------------------------------
# O10 — nested schema pruning: deep event/telemetry payloads ship as
# struct columns, and a scan that reads the WHOLE struct to answer a
# one-leaf query drags every sibling through IO — at 100 TB the nested
# analogue of q1's top-level column pruning. A struct-typed parquet
# (payload.vt double + payload.meta.k int, parsed from the events JSON)
# is written to scratch; the read selects only et and payload.meta.k, and
# Catalyst's nested-schema pruning must narrow ReadSchema to that leaf —
# the sibling payload.vt absent. Self-certifying (the o9 discipline): the
# row carries nested_pruned = "vt missing AND meta.k present in the
# executed scan's ReadSchema", so the oracle pins TRUE and the artifact
# fails if a regression widens the scan back to the full struct.
# --------------------------------------------------------------------------
@register(
    "o10_nested_schema_pruning",
    oracle="""
    SELECT event_type                                        AS et,
           CAST(COUNT(*) AS BIGINT)                          AS n,
           CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT)   AS sum_k,
           TRUE                                              AS nested_pruned
    FROM events
    GROUP BY event_type
    """,
)
def o10_nested_schema_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re as _re

    events = load_table(spark, sf_dir, "events")
    nested = events.select(
        "event_id",
        F.col("event_type").alias("et"),
        F.struct(
            F.col("value").alias("vt"),
            F.struct(
                F.get_json_object("props", "$.k").cast("int").alias("k")
            ).alias("meta"),
        ).alias("payload"),
    )
    path = _scratch(spark, "o10_nested")
    nested.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    res = back.groupBy("et").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("payload.meta.k")).cast("bigint").alias("sum_k"),
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"ReadSchema: struct<([^\n]*)", plan)
    read_schema = m.group(1) if m else ""
    pruned = (
        "vt" not in read_schema
        and "meta" in read_schema
        and "k:int" in read_schema.replace(" ", "")
    )
    rows = [(*r, pruned) for r in res.collect()]
    return spark.createDataFrame(
        rows, "et string, n bigint, sum_k bigint, nested_pruned boolean"
    )


# --------------------------------------------------------------------------
# S19 — manifest row-level DELETE via deletion vectors: the Delta/Iceberg
# merge-on-read primitive (the missing half of GDPR-at-scale next to
# d50's purge audit). DELETE WHERE writes a position-list sidecar per
# affected file plus a new manifest snapshot — data files are NEVER
# rewritten (md5-pinned byte-identical in this row AND in pytest); the
# reader anti-applies the DVs; time travel still reads the pre-delete
# snapshot in full; vacuum reclaims DVs with the snapshots that
# reference them (pinned in pytest). The matching-position scan runs
# distributed, one task per candidate file, and composes with s16's zone
# maps: the band predicate [1500, 4500) provably cannot touch file 4's
# [6000, 8000) zone, so files_scanned = 3 < files_total = 4 is pinned —
# the artifact fails if DELETE stops skipping or starts rewriting.
# Scale: driver state is O(#deleted positions) — the Delta DV-bitmap
# asymptotics; commit is a metadata publish.
# --------------------------------------------------------------------------
@register(
    "s19_manifest_delete_vectors",
    oracle="""
    WITH s AS (SELECT unnest(range(8000)) AS i),
         live AS (SELECT * FROM s WHERE i < 1500 OR i >= 4500)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM live)       AS n_live,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4) FROM live) AS sum_v,
           (SELECT CAST(MIN(i) AS BIGINT) FROM live)         AS min_i,
           (SELECT CAST(MAX(i) AS BIGINT) FROM live)         AS max_i,
           CAST(0 AS BIGINT)                                 AS band_rows,
           CAST(8000 AS BIGINT)                              AS v1_rows,
           CAST(3000 AS BIGINT)                              AS rows_deleted,
           CAST(3 AS BIGINT)                                 AS dv_files,
           CAST(3 AS BIGINT)                                 AS files_scanned,
           CAST(4 AS BIGINT)                                 AS files_total,
           TRUE                                              AS data_files_byte_identical
    """,
)
def s19_manifest_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        delete_where_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s19_dv")
    (
        _synthetic_series(spark, 0, 8000, 4)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )

    def _data_md5s() -> dict:
        return {
            n: hashlib.md5(
                open(os.path.join(path, n), "rb").read()
            ).hexdigest()
            for n in sorted(os.listdir(path))
            if n.endswith(".json") and not n.startswith(("_", "dv-"))
        }

    before = _data_md5s()
    report = delete_where_manifest_path(
        spark, path, [("i", "ge", 1500), ("i", "lt", 4500)]
    )
    byte_identical = _data_md5s() == before

    def _read(version=None):
        rd = spark.read.format("json_manifest_source").option("path", path)
        if version is not None:
            rd = rd.option("version", version)
        return rd.load()

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        live = (
            _read()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_live"),
                F.round(F.sum("v"), 4).alias("sum_v"),
                F.min("i").cast("bigint").alias("min_i"),
                F.max("i").cast("bigint").alias("max_i"),
            )
            .first()
        )
        # The deleted band is UNREADABLE through the latest snapshot...
        band = (
            _read()
            .filter((F.col("i") >= 1500) & (F.col("i") < 4500))
            .count()
        )
        # ...while time travel to the pre-delete snapshot reads every row.
        v1_rows = _read(version=1).count()
    return spark.createDataFrame(
        [
            (
                live["n_live"], live["sum_v"], live["min_i"], live["max_i"],
                band, v1_rows,
                report["rows_deleted"], report["dv_files_written"],
                report["files_scanned"], report["files_total"],
                bool(byte_identical),
            )
        ],
        "n_live bigint, sum_v double, min_i bigint, max_i bigint,"
        " band_rows bigint, v1_rows bigint, rows_deleted bigint,"
        " dv_files bigint, files_scanned bigint, files_total bigint,"
        " data_files_byte_identical boolean",
    )


# --------------------------------------------------------------------------
# S20 — manifest schema evolution: add-a-column across commits, the
# month-one need of every long-lived lake. The v2 append carries an
# extra column w; commit() reconciles (prior columns must survive with
# identical types — dropping or retyping is refused loudly, pinned in
# pytest) and publishes the superset schema; the reader NULL-fills old
# files for the added column, so COUNT(w) counts exactly the v2 rows
# while SUM(v) spans both epochs. Time travel still reads v1 UNDER V1'S
# SCHEMA (2 data columns — snapshots are immutable, so the old epoch
# never widens retroactively). All counts closed-form in the oracle;
# n_cols are read from the manifests, so a reconcile regression fails
# the artifact, not just a test.
# Scale: evolution is pure metadata (no file rewritten, no backfill job)
# — the Delta/Iceberg semantics that make adding a column O(1) at 100 TB.
# --------------------------------------------------------------------------
@register(
    "s20_manifest_schema_evolution",
    oracle="""
    WITH v1 AS (SELECT unnest(range(4000)) AS i),
         v2 AS (SELECT unnest(range(4000, 6000)) AS i)
    SELECT CAST(6000 AS BIGINT)                              AS n_total,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT i FROM v1 UNION ALL SELECT i FROM v2)) AS sum_v,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v2)         AS n_with_w,
           (SELECT CAST(SUM(i % 7) AS BIGINT) FROM v2)       AS sum_w,
           CAST(4000 AS BIGINT)                              AS null_w_rows,
           CAST(3 AS BIGINT)                                 AS latest_cols,
           CAST(4000 AS BIGINT)                              AS v1_rows,
           CAST(2 AS BIGINT)                                 AS v1_cols
    """,
)
def s20_manifest_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import _load_manifest

    _register_manifest_classes(spark)
    path = _scratch(spark, "s20_evo")
    (
        _synthetic_series(spark, 0, 4000, 4)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    (
        _synthetic_series(spark, 4000, 6000, 2)
        .withColumn("w", F.col("i") % 7)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    # Manifest-declared DATA columns per epoch (metadata cols excluded):
    # the reconcile result itself, not an inference artifact.
    latest_cols = len(_load_manifest(path)["schema"])
    v1_cols = len(_load_manifest(path, 1)["schema"])
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        back = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
        )
        row = back.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.round(F.sum("v"), 4).alias("sum_v"),
            F.count("w").cast("bigint").alias("n_with_w"),
            F.sum("w").cast("bigint").alias("sum_w"),
            F.sum(F.col("w").isNull().cast("int")).cast("bigint").alias(
                "null_w_rows"
            ),
        ).first()
        v1_rows = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .option("version", 1)
            .load()
            .count()
        )
    return spark.createDataFrame(
        [
            (
                row["n_total"], row["sum_v"], row["n_with_w"], row["sum_w"],
                row["null_w_rows"], latest_cols, v1_rows, v1_cols,
            )
        ],
        "n_total bigint, sum_v double, n_with_w bigint, sum_w bigint,"
        " null_w_rows bigint, latest_cols bigint, v1_rows bigint,"
        " v1_cols bigint",
    )


# --------------------------------------------------------------------------
# S21 — manifest compaction + physical purge (the Delta OPTIMIZE /
# Iceberg rewrite_data_files primitive): s19's deletion vectors are
# LOGICAL — the bytes stay on disk, which is half of GDPR. Compaction
# reads the live rows (DVs anti-applied) and rewrites them as a fresh
# overwrite commit (retain_history, so pre-compact snapshots stay
# readable until an explicit vacuum); vacuum then reclaims the old files
# AND the DVs. The purge pin is on RAW BYTES: after compact + vacuum,
# the deleted sentinel ids appear in NO remaining data file — physically
# erased, not just unreadable. Live values are pinned identical across
# the rewrite (counts + sums), file count drops 4 -> 2, and the DV
# sidecars are gone.
# Scale: the rewrite is one distributed read -> write over live rows
# only (never touches deleted bytes except to skip them); at 100 TB you
# compact per partition/zone on a schedule — the same two jobs.
# --------------------------------------------------------------------------
@register(
    "s21_manifest_compaction_purge",
    oracle="""
    WITH s AS (SELECT unnest(range(8000)) AS i),
         live AS (SELECT * FROM s WHERE i < 1500 OR i >= 4500)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM live)       AS n_live,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4) FROM live) AS sum_v,
           CAST(4 AS BIGINT)                                 AS files_before,
           CAST(2 AS BIGINT)                                 AS files_after,
           CAST(0 AS BIGINT)                                 AS dv_files_after,
           TRUE                                              AS history_readable_before_vacuum,
           TRUE                                              AS purged_bytes_absent
    """,
)
def s21_manifest_compaction_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        delete_where_manifest_path,
        vacuum_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s21_opt")
    (
        _synthetic_series(spark, 0, 8000, 4)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    delete_where_manifest_path(
        spark, path, [("i", "ge", 1500), ("i", "lt", 4500)]
    )

    def data_files() -> list:
        return sorted(
            n
            for n in os.listdir(path)
            if n.endswith(".json") and not n.startswith(("_", "dv-"))
        )

    files_before = len(data_files())
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        live = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .drop("n_files_read", "n_files_total")
        )
        # COMPACT: rewrite the live rows (DVs applied by the read) as one
        # retained overwrite commit — 2 consolidated files, range-
        # partitioned so the zone maps stay disjoint for later skipping.
        (
            live.repartitionByRange(2, "i")
            .write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode("overwrite")
            .save()
        )
        # Pre-compact history is still readable until vacuum (v2 = the
        # post-delete snapshot: 5000 live of 8000 physical rows).
        v2_n = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .option("version", 2)
            .load()
            .count()
        )
        history_ok = v2_n == 5000
        # PURGE: vacuum to the compacted snapshot only — old files and
        # their DV sidecars are reclaimed.
        vacuum_manifest_path(path, retain_versions=1)
        after = data_files()
        dv_after = sum(1 for n in os.listdir(path) if n.startswith("dv-"))
        row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_live"),
                F.round(F.sum("v"), 4).alias("sum_v"),
            )
            .first()
        )
    # RAW-BYTES pin: the deleted band's ids appear in no remaining data
    # file — the difference between unreadable and erased.
    blobs = "".join(
        open(os.path.join(path, n), encoding="utf-8").read() for n in after
    )
    # Key/value byte pattern with optional whitespace: the spool encoder
    # may write `"i": 1500` (stdlib json) or `"i":1500` (orjson fast
    # path) — the pin is on the VALUE bytes being gone, not on the
    # encoder's separator style.
    import re as _re

    def _has_i(k: int) -> bool:
        return _re.search(rf'"i":\s*{k}[,}}]', blobs) is not None

    purged = not any(_has_i(k) for k in (1500, 2999, 4499)) and _has_i(1499)
    return spark.createDataFrame(
        [
            (
                row["n_live"], row["sum_v"],
                files_before, len(after), dv_after,
                bool(history_ok), bool(purged),
            )
        ],
        "n_live bigint, sum_v double, files_before bigint,"
        " files_after bigint, dv_files_after bigint,"
        " history_readable_before_vacuum boolean,"
        " purged_bytes_absent boolean",
    )


# --------------------------------------------------------------------------
# S22 — manifest MERGE upsert: the Delta MERGE INTO primitive completing
# the connector's DML triad (s19 DELETE, s21 OPTIMIZE, s22 MERGE).
# Matched keys are logically deleted via deletion vectors and the update
# rows land as new executor-spooled data files; BOTH changes publish as
# ONE atomic snapshot, so no reader can observe the delete without the
# insert. The update batch [4000, 8000) half-overlaps the seeded
# [0, 6000): 2000 updates (value formula changes — pinned by the band
# sum), 2000 inserts; time travel to the pre-merge snapshot still reads
# all 6000 original values. Schema and key-uniqueness contracts are
# validated loudly (pytest); data files stay byte-identical (merge-on-
# read, pinned in pytest with the s19 md5 discipline).
# Scale: the matched scan is one task per data file with the update key
# set (bounded by the CDC batch); the insert path is the s12 two-phase
# spool; the commit is a metadata publish.
# --------------------------------------------------------------------------
@register(
    "s22_manifest_merge_upsert",
    oracle="""
    WITH old AS (SELECT unnest(range(6000)) AS i),
         upd AS (SELECT unnest(range(4000, 8000)) AS i),
         merged AS (
             SELECT i, (i * i % 97) / 10.0 AS v FROM old WHERE i < 4000
             UNION ALL
             SELECT i, (i * i % 89) / 10.0 AS v FROM upd
         )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM merged)  AS n_total,
           (SELECT ROUND(SUM(v), 4) FROM merged)          AS sum_v,
           (SELECT ROUND(SUM(v), 4) FROM merged
            WHERE i >= 4000 AND i < 6000)                 AS updated_band_sum,
           CAST(2000 AS BIGINT)                           AS rows_updated,
           CAST(2000 AS BIGINT)                           AS rows_inserted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM old)     AS v1_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4) FROM old) AS v1_sum
    """,
)
def s22_manifest_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s22_merge")
    (
        _synthetic_series(spark, 0, 6000, 3)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    updates = spark.range(4000, 8000, 1, 2).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.col("id") % 89) / 10.0).alias("v"),
    )
    report = merge_into_manifest_path(spark, path, updates, "i")

    def _read(version=None):
        rd = spark.read.format("json_manifest_source").option("path", path)
        if version is not None:
            rd = rd.option("version", version)
        return rd.load()

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        row = _read().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.round(F.sum("v"), 4).alias("sum_v"),
        ).first()
        band = (
            _read()
            .filter((F.col("i") >= 4000) & (F.col("i") < 6000))
            .agg(F.round(F.sum("v"), 4))
            .first()[0]
        )
        v1 = _read(version=1).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("v"), 4).alias("s"),
        ).first()
    return spark.createDataFrame(
        [
            (
                row["n_total"], row["sum_v"], band,
                report["rows_updated"], report["rows_inserted"],
                v1["n"], v1["s"],
            )
        ],
        "n_total bigint, sum_v double, updated_band_sum double,"
        " rows_updated bigint, rows_inserted bigint,"
        " v1_rows bigint, v1_sum double",
    )


# --------------------------------------------------------------------------
# S23 — STREAMING reads from the manifest connector (the lakehouse-ingest
# quadrant; offsets ARE manifest versions): a Structured Streaming source
# over a json_manifest_sink path where each micro-batch reads exactly the
# data files added between two snapshots — the Delta/Iceberg streaming-
# source semantics for append-only tables. Run 1 drains the three seeded
# commits into a checkpointed parquet sink; a FOURTH commit lands while
# the query is down; run 2 restarts from the checkpoint and must process
# ONLY the new commit (pinned: run 2's input-row count == the new
# commit's rows). The oracle is the closed-form union of all four
# commits — a duplicate (re-read commit) or gap (skipped commit) at any
# restart boundary breaks the value hash. Append-only is a loud
# contract: a removed file raises (pinned in pytest alongside the
# per-commit batching).
# Scale: offset planning is a driver-side manifest diff (O(#files));
# each added file is one executor task — ingest throughput scales with
# commit width, and recovery cost is reading ONE version pointer.
# --------------------------------------------------------------------------
@register(
    "s23_manifest_stream_read",
    oracle="""
    SELECT CAST(i % 8 AS INT)                          AS bucket,
           COUNT(*)                                    AS n,
           ROUND(SUM((i * i % 97) / 10.0), 4)          AS sum_v,
           CAST(MIN(i) AS BIGINT)                      AS min_i,
           CAST(MAX(i) AS BIGINT)                      AS max_i,
           TRUE                                        AS run2_incremental
    FROM (SELECT unnest(range(8000)) AS i)
    GROUP BY bucket
    """,
)
def s23_manifest_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        ManifestStreamSource,
    )

    _register_manifest_classes(spark)
    try:
        spark.dataSource.register(ManifestStreamSource)
    except Exception:
        pass  # already registered in this session
    path = _scratch(spark, "s23_src")
    out = _scratch(spark, "s23_out")
    ck = _scratch(spark, "s23_ckpt")

    def commit(lo: int, hi: int, parts: int) -> None:
        (
            _synthetic_series(spark, lo, hi, parts)
            .write.format("json_manifest_sink")
            .option("path", path)
            .mode("append")
            .save()
        )

    def run_stream() -> list:
        q = (
            spark.readStream.format("json_manifest_stream_source")
            .option("path", path)
            .load()
            .select("i", "v")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = list(q.recentProgress or [])
        q.stop()
        return progresses

    # Run 1: three commits exist; the stream bootstraps them all.
    commit(0, 1000, 2)
    commit(1000, 3000, 2)
    commit(3000, 6000, 2)
    run_stream()
    # A commit lands while the query is DOWN; the restart must consume
    # exactly it — version offsets live in Spark's checkpoint.
    commit(6000, 8000, 2)
    p2 = run_stream()
    run2_rows = sum(int((p or {}).get("numInputRows", 0)) for p in p2)
    run2_incremental = run2_rows == 2000

    sink = spark.read.parquet(out)
    return sink.groupBy(
        F.pmod("i", F.lit(8)).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 4).alias("sum_v"),
        F.min("i").cast("bigint").alias("min_i"),
        F.max("i").cast("bigint").alias("max_i"),
        F.lit(bool(run2_incremental)).alias("run2_incremental"),
    )


# --------------------------------------------------------------------------
# S24 — CHANGE DATA FEED between manifest snapshots (the Delta CDF /
# Iceberg changelog primitive — the read half of CDC, completing the DML
# surface: s19 DELETE, s21 OPTIMIZE, s22 MERGE all become *consumable*
# as row-level changes). Lineage here: v1 seeds 6000 rows, v2 DELETEs
# the [1000, 2000) band, v3 MERGEs [5000, 7000) (2000 updates split as
# 1000 matched + 1000 inserts under the merge value formula). The feed
# v1 -> v3 must therefore contain EXACTLY 2000 deletes (the DELETE band
# + the MERGE-matched band, under the ORIGINAL value formula — CDC
# emits the pre-image) and 2000 inserts (the update batch under the NEW
# formula). The oracle replays that closed form; a feed that re-reads
# unchanged rows, misses a DV, or emits post-image deletes breaks the
# value hash. Bootstrap completeness is pinned separately: CDF 0 -> 1
# is all-inserts with count 6000.
# Scale: the feed is a driver-side manifest diff (O(#files + #DV
# positions)) + one executor task per CHANGED file — cost scales with
# the change, not the table (the property that makes downstream
# incremental consumers viable at 100 TB).
# --------------------------------------------------------------------------
@register(
    "s24_manifest_change_data_feed",
    oracle="""
    WITH del AS (
        SELECT i, (i * i % 97) / 10.0 AS v
        FROM (SELECT unnest(range(1000, 2000)) AS i)
        UNION ALL
        SELECT i, (i * i % 97) / 10.0
        FROM (SELECT unnest(range(5000, 6000)) AS i)
    ), ins AS (
        SELECT i, (i * i % 89) / 10.0 AS v
        FROM (SELECT unnest(range(5000, 7000)) AS i)
    )
    SELECT 'delete' AS change_type,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM del) AS n,
           (SELECT CAST(MIN(i) AS BIGINT) FROM del)   AS min_i,
           (SELECT CAST(MAX(i) AS BIGINT) FROM del)   AS max_i,
           (SELECT ROUND(SUM(v), 4) FROM del)         AS sum_v,
           CAST(6000 AS BIGINT)                       AS bootstrap_inserts
    UNION ALL
    SELECT 'insert',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ins),
           (SELECT CAST(MIN(i) AS BIGINT) FROM ins),
           (SELECT CAST(MAX(i) AS BIGINT) FROM ins),
           (SELECT ROUND(SUM(v), 4) FROM ins),
           CAST(6000 AS BIGINT)
    """,
)
def s24_manifest_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s24_cdf")
    (
        _synthetic_series(spark, 0, 6000, 3)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    delete_where_manifest_path(
        spark, path, [("i", "ge", 1000), ("i", "lt", 2000)]
    )
    updates = spark.range(5000, 7000, 1, 2).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.col("id") % 89) / 10.0).alias("v"),
    )
    merge_into_manifest_path(spark, path, updates, "i")
    # Bootstrap completeness: "from empty" is all-inserts, full count.
    boot = changes_between_manifest_path(spark, path, 0, 1)
    bootstrap_inserts = boot.filter(
        F.col("_change_type") == "insert"
    ).count()
    assert boot.count() == bootstrap_inserts  # no phantom deletes
    feed = changes_between_manifest_path(spark, path, 1, 3)
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("i").cast("bigint").alias("min_i"),
            F.max("i").cast("bigint").alias("max_i"),
            F.round(F.sum("v"), 4).alias("sum_v"),
        )
        .withColumn(
            "bootstrap_inserts", F.lit(int(bootstrap_inserts)).cast("bigint")
        )
    )


# --------------------------------------------------------------------------
# S25 — OPTIMISTIC CONCURRENCY on manifest commits (the Delta/Iceberg
# commit-protocol check): a writer declares the snapshot version its
# plan was based on (`expected_version`); if another commit landed in
# between, commit() refuses LOUDLY — before a single spool file is
# renamed in — and the loser re-plans against the current snapshot and
# retries. Without the check, interleaved appends are last-writer-wins:
# the loser's manifest read-modify-write would silently drop the
# winner's files from the table. The row stages exactly that race
# (writer B based on v1 commits after A already advanced the table to
# v2), pins that the conflict is detected, that the directory holds no
# conflict litter (no spool dirs, exactly the committed data files),
# and that B's retry lands as v3 with nothing lost.
# Scale: the check is one version comparison at commit — O(1) metadata,
# the same cost at 100 TB as at 9000 rows.
# --------------------------------------------------------------------------
@register(
    "s25_manifest_occ_conflict",
    oracle="""
    SELECT CAST(9000 AS BIGINT)                        AS n_total,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(9000)) AS i))    AS sum_v,
           CAST(3 AS BIGINT)                           AS final_version,
           TRUE                                        AS conflict_detected,
           TRUE                                        AS no_spool_litter,
           CAST(6 AS BIGINT)                           AS data_files
    """,
)
def s25_manifest_occ_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import _load_manifest

    _register_manifest_classes(spark)
    path = _scratch(spark, "s25_occ")

    def append(lo: int, hi: int, expected: int | None) -> None:
        w = (
            _synthetic_series(spark, lo, hi, 2)
            .write.format("json_manifest_sink")
            .option("path", path)
            .mode("append")
        )
        if expected is not None:
            w = w.option("expected_version", str(expected))
        w.save()

    append(0, 4000, None)  # v1 seed
    append(4000, 6000, 1)  # writer A, based on v1 -> lands v2
    conflict_detected = False
    try:
        # Writer B also planned against v1; A's commit landed first.
        append(6000, 9000, 1)
    except Exception as exc:  # surfaces through Py4J — match the message
        conflict_detected = "concurrent commit conflict" in str(exc)
    # B re-plans against the CURRENT snapshot and retries.
    append(6000, 9000, _load_manifest(path)["version"])
    manifest = _load_manifest(path)
    names = os.listdir(path)
    no_litter = not any(n.startswith("_temp-") for n in names)
    data_files = sum(
        1
        for n in names
        if n.endswith(".json") and not n.startswith(("_", "dv-"))
    )
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        back = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_total"),
                F.round(F.sum("v"), 4).alias("sum_v"),
            )
            .first()
        )
    return spark.createDataFrame(
        [
            (
                back["n_total"], back["sum_v"],
                manifest["version"], bool(conflict_detected),
                bool(no_litter), data_files,
            )
        ],
        "n_total bigint, sum_v double, final_version bigint,"
        " conflict_detected boolean, no_spool_litter boolean,"
        " data_files bigint",
    )


# --------------------------------------------------------------------------
# S26 — per-file BLOOM FILTER skipping on the manifest connector: the
# point-lookup half of data skipping. Zone maps (s16) prune RANGES; on a
# hash-like key column every file's [min, max] spans nearly the whole
# domain, so an equality probe prunes NOTHING by zones — exactly the
# lookup shape (find one document by content hash in a 100 TB lake)
# where Delta/Iceberg deploy blooms. The writer streams each row's key
# into a fixed 16 KiB-bit filter per file (O(m) memory, never a value
# set); the reader probes the k md5-derived bits and skips files that
# provably lack the literal. Pinned: the bloom lookup reads 1 of 4
# files while the SAME probe against a bloom-less copy of the table
# reads all 4 (the zone-only control — proof blooms do the work), and
# an absent key returns zero rows (false positives may cost a read,
# never a wrong row: accepted probes are also exact row filters).
# Scale: filters live in the manifest (KBs/file); probing is driver-side
# planning — a point lookup opens O(1) files instead of O(#files).
# --------------------------------------------------------------------------
@register(
    "s26_manifest_bloom_skipping",
    oracle="""
    SELECT CAST(1234 AS BIGINT)                       AS i,
           ROUND((1234 * 1234 % 97) / 10.0, 4)        AS v,
           CAST(1 AS BIGINT)                          AS bloom_files_read,
           CAST(4 AS BIGINT)                          AS files_total,
           CAST(4 AS BIGINT)                          AS zone_only_files_read,
           CAST(0 AS BIGINT)                          AS absent_key_rows
    """,
)
def s26_manifest_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from lime_on_spark_spark.session import temp_conf

    _register_manifest_classes(spark)
    bloomed = _scratch(spark, "s26_bloom")
    control = _scratch(spark, "s26_zone")

    def keyed():
        # spark.range with 4 partitions splits deterministically: file p
        # holds i in [p*2000, (p+1)*2000) — but the KEY is md5(i), so each
        # file's key zone spans ~the whole hex domain (zones can't prune).
        return spark.range(0, 8000, 1, 4).select(
            F.col("id").alias("i"),
            F.md5(F.col("id").cast("string")).alias("key"),
            F.round((F.col("id") * F.col("id") % 97) / 10.0, 4).alias("v"),
        )

    (
        keyed().write.format("json_manifest_sink")
        .option("path", bloomed)
        .option("bloom_columns", "key")
        .mode("append")
        .save()
    )
    (
        keyed().write.format("json_manifest_sink")
        .option("path", control)
        .mode("append")
        .save()
    )
    probe = hashlib.md5(b"1234").hexdigest()

    def lookup(path: str):
        return (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .filter(F.col("key") == probe)
        )

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        hit = lookup(bloomed).first()
        zone_only = lookup(control).first()
        absent = (
            spark.read.format("json_manifest_source")
            .option("path", bloomed)
            .load()
            .filter(F.col("key") == "not-a-real-md5-key")
            .count()
        )
    return spark.createDataFrame(
        [
            (
                hit["i"], hit["v"],
                hit["n_files_read"], hit["n_files_total"],
                zone_only["n_files_read"], absent,
            )
        ],
        "i bigint, v double, bloom_files_read bigint, files_total bigint,"
        " zone_only_files_read bigint, absent_key_rows bigint",
    )


# --------------------------------------------------------------------------
# D97 — INCREMENTAL VIEW MAINTENANCE from the change data feed: the
# production consumer CDF exists for. A per-bucket aggregate (COUNT +
# SUM — self-maintainable deltas) is materialized at snapshot v1, the
# table then takes a DELETE (v2) and a MERGE (v3), and the view is
# brought current by applying ONLY the s24 feed: +1/+v per insert,
# -1/-v per delete (CDC pre-images make the delete side subtractable).
# The row pins the maintained view cell-for-cell against a full
# recompute over the latest snapshot (matches_full, 1e-6 tolerance) AND
# hash-pins the values against the closed-form oracle — an IVM that
# drops a delta, double-applies a change, or misses a pre-image
# diverges from both.
# Scale: the refresh touches O(|change|) rows + O(#buckets) state — at
# 100 TB the difference between a view you can afford to keep current
# (read 4000 changed rows) and one you cannot (re-aggregate 7000 — or
# 10^11 — live rows). Deletes-as-negative-rows is the classic
# self-maintainable-aggregate construction (Gupta & Mumick).
# --------------------------------------------------------------------------
@register(
    "d97_incremental_view_maintenance",
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
           TRUE                      AS matches_full
    FROM live GROUP BY bucket
    """,
)
def d97_incremental_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "d97_ivm")
    (
        _synthetic_series(spark, 0, 6000, 3)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )

    def read_version(version: int | None):
        rd = spark.read.format("json_manifest_source").option("path", path)
        if version is not None:
            rd = rd.option("version", version)
        return rd.load().select("i", "v")

    bucket = (F.col("i") % 8).cast("int").alias("bucket")
    # Materialize the view at v1 (in a real pipeline this is a stored
    # table; localCheckpoint pins one evaluation so the "old" view can't
    # silently re-read a mutated path).
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        mv0 = (
            read_version(1)
            .groupBy(bucket)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("v").alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    delete_where_manifest_path(
        spark, path, [("i", "ge", 1000), ("i", "lt", 2000)]
    )
    updates = spark.range(5000, 7000, 1, 2).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.col("id") % 89) / 10.0).alias("v"),
    )
    merge_into_manifest_path(spark, path, updates, "i")
    # REFRESH: deltas from the feed only — deletes as negative rows.
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    deltas = (
        changes_between_manifest_path(spark, path, 1, 3)
        .select(bucket, sign.alias("w"), "v")
        .groupBy("bucket")
        .agg(
            F.sum("w").cast("long").alias("n"),
            F.sum(F.col("w") * F.col("v")).alias("s"),
        )
    )
    mv1 = (
        mv0.unionByName(deltas)
        .groupBy("bucket")
        .agg(F.sum("n").cast("bigint").alias("n"), F.sum("s").alias("s"))
        .filter(F.col("n") > 0)
    )
    # Verify against a FULL recompute over the latest snapshot. Collected
    # HERE: the manifest reads must run under the pushdown conf, which
    # does not outlive this function — the driver evaluates the returned
    # frame later, so it must be a literal.
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        full = read_version(None).groupBy(bucket).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_full"),
            F.sum("v").alias("s_full"),
        )
        rows = (
            mv1.join(full, "bucket", "full_outer")
            .select(
                "bucket",
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
        rows, "bucket int, n bigint, sum_v double, matches_full boolean"
    )


# --------------------------------------------------------------------------
# S27 — change-data-feed UPDATE PAIRING (Delta CDF's _change_type
# refinement): a consumer that treats a MERGE as delete+insert loses the
# update identity CDC consumers key on (audit trails, SCD2 builders,
# downstream upserts). With update_key, a key carrying BOTH a delete and
# an insert in the feed is re-tagged update_preimage/update_postimage —
# one keyed window over the CHANGE SET (a single shuffle sized by the
# change, never the table). The s24 lineage splits exactly: the MERGE-
# matched band [5000, 6000) becomes 1000 pre + 1000 post pairs (old
# formula on the pre-image, new on the post — value-pinned), the DELETE
# band stays 1000 pure deletes, the MERGE tail [6000, 7000) stays 1000
# pure inserts. A pairing bug (missed DV, key joined against the table,
# tag leakage) breaks the closed-form hash.
# --------------------------------------------------------------------------
@register(
    "s27_manifest_cdf_updates",
    oracle="""
    WITH pre AS (
        SELECT i, (i * i % 97) / 10.0 AS v
        FROM (SELECT unnest(range(5000, 6000)) AS i)
    ), post AS (
        SELECT i, (i * i % 89) / 10.0 AS v
        FROM (SELECT unnest(range(5000, 6000)) AS i)
    ), del AS (
        SELECT i, (i * i % 97) / 10.0 AS v
        FROM (SELECT unnest(range(1000, 2000)) AS i)
    ), ins AS (
        SELECT i, (i * i % 89) / 10.0 AS v
        FROM (SELECT unnest(range(6000, 7000)) AS i)
    )
    SELECT 'delete' AS change_type,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM del) AS n,
           (SELECT CAST(MIN(i) AS BIGINT) FROM del)   AS min_i,
           (SELECT CAST(MAX(i) AS BIGINT) FROM del)   AS max_i,
           (SELECT ROUND(SUM(v), 4) FROM del)         AS sum_v
    UNION ALL
    SELECT 'insert',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ins),
           (SELECT CAST(MIN(i) AS BIGINT) FROM ins),
           (SELECT CAST(MAX(i) AS BIGINT) FROM ins),
           (SELECT ROUND(SUM(v), 4) FROM ins)
    UNION ALL
    SELECT 'update_preimage',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pre),
           (SELECT CAST(MIN(i) AS BIGINT) FROM pre),
           (SELECT CAST(MAX(i) AS BIGINT) FROM pre),
           (SELECT ROUND(SUM(v), 4) FROM pre)
    UNION ALL
    SELECT 'update_postimage',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM post),
           (SELECT CAST(MIN(i) AS BIGINT) FROM post),
           (SELECT CAST(MAX(i) AS BIGINT) FROM post),
           (SELECT ROUND(SUM(v), 4) FROM post)
    """,
)
def s27_manifest_cdf_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s27_upd")
    (
        _synthetic_series(spark, 0, 6000, 3)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    delete_where_manifest_path(
        spark, path, [("i", "ge", 1000), ("i", "lt", 2000)]
    )
    updates = spark.range(5000, 7000, 1, 2).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.col("id") % 89) / 10.0).alias("v"),
    )
    merge_into_manifest_path(spark, path, updates, "i")
    feed = changes_between_manifest_path(spark, path, 1, 3, update_key="i")
    return feed.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("i").cast("bigint").alias("min_i"),
        F.max("i").cast("bigint").alias("max_i"),
        F.round(F.sum("v"), 4).alias("sum_v"),
    )


# --------------------------------------------------------------------------
# S28 — batch CDF through the DSv2 READER (Delta's `readChangeFeed`
# batch shape): `spark.read.format("json_manifest_source")
# .option("read_changes", "true").option("starting_version", 1)`.
# Same planning (_cdf_tasks) and executor scan as the s24 function —
# this row proves the CONNECTOR SURFACE: schema epoch is the ending
# snapshot's, the `_change_type` column rides along, and no pushdown
# session conf is needed (the CDF reader declines filter pushdown
# entirely). Pinned: the reader's aggregates equal the closed form AND
# a row-set equality flag against the s24 function path — the two
# spellings can never drift.
# --------------------------------------------------------------------------
@register(
    "s28_manifest_cdf_reader",
    oracle="""
    WITH del AS (
        SELECT i, (i * i % 97) / 10.0 AS v
        FROM (SELECT unnest(range(1000, 2000)) AS i)
        UNION ALL
        SELECT i, (i * i % 97) / 10.0
        FROM (SELECT unnest(range(5000, 6000)) AS i)
    ), ins AS (
        SELECT i, (i * i % 89) / 10.0 AS v
        FROM (SELECT unnest(range(5000, 7000)) AS i)
    )
    SELECT 'delete' AS change_type,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM del) AS n,
           (SELECT ROUND(SUM(v), 4) FROM del)         AS sum_v,
           TRUE                                       AS reader_matches_function
    UNION ALL
    SELECT 'insert',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ins),
           (SELECT ROUND(SUM(v), 4) FROM ins),
           TRUE
    """,
)
def s28_manifest_cdf_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s28_cdfr")
    (
        _synthetic_series(spark, 0, 6000, 3)
        .write.format("json_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    delete_where_manifest_path(
        spark, path, [("i", "ge", 1000), ("i", "lt", 2000)]
    )
    updates = spark.range(5000, 7000, 1, 2).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.col("id") % 89) / 10.0).alias("v"),
    )
    merge_into_manifest_path(spark, path, updates, "i")
    # localCheckpoint pins ONE execution of each feed: the equality pin
    # below consumes both sides twice and the aggregate a third time —
    # without it every action re-runs the per-changed-file scan tasks.
    via_reader = (
        spark.read.format("json_manifest_source")
        .option("path", path)
        .option("read_changes", "true")
        .option("starting_version", 1)
        .load()
        .localCheckpoint(eager=True)
    )
    via_fn = changes_between_manifest_path(
        spark, path, 1, 3
    ).localCheckpoint(eager=True)
    # Row-set equality between the two spellings (order-insensitive).
    matches = (
        via_reader.exceptAll(via_fn).count() == 0
        and via_fn.exceptAll(via_reader).count() == 0
    )
    return (
        via_reader.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("v"), 4).alias("sum_v"),
        )
        .withColumn("reader_matches_function", F.lit(bool(matches)))
    )


# --------------------------------------------------------------------------
# S29 — manifest RESTORE: the Delta `RESTORE TABLE ... VERSION AS OF`
# primitive over the json_manifest stack — roll a table BACK by
# publishing FORWARD: a new commit whose file list equals the target
# snapshot's, so history is never rewritten, the rollback is itself
# auditable, and the change feed sees it as ordinary inserts/deletes
# with no special casing. Over the s17/s18 seeded lineage (v1 append
# 4000/4, v2 append 2000/2 -> 6000/6, v3 overwrite 1000/2, all
# retained), RESTORE to v2 publishes v4 with v2's 6 files / 6000 rows;
# the readback aggregates are closed-form over range(6000), and
# CDF(3,4) must show exactly v2-not-in-v3 as inserts (6000) and
# v3-not-in-v4 as deletes (1000) — the composition proof that restore
# needs no CDF special casing.
# Scale: a restore is a driver-side manifest publish (O(#files)
# metadata); no data is read, copied, or rewritten at any table size.
# --------------------------------------------------------------------------
@register(
    "s29_manifest_restore",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS restored_from,
           CAST(4 AS BIGINT) AS new_version,
           CAST(6 AS BIGINT) AS files_restored,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(6000)) AS i))        AS n_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(6000)) AS i))        AS sum_v,
           CAST(6000 AS BIGINT) AS cdf_inserts,
           CAST(1000 AS BIGINT) AS cdf_deletes,
           TRUE AS vacuumed_restore_refused
    """,
)
def s29_manifest_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        restore_manifest_path,
        vacuum_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s29_restore")
    _seed_retained_dir(spark, path)  # v1..v3, all retained
    stats = restore_manifest_path(spark, path, to_version=2)  # -> v4

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum("v"), 4).alias("s"),
            )
            .first()
        )
    cdf = dict(
        changes_between_manifest_path(spark, path, 3, 4)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    # Negative control: after a deep vacuum the restore target is gone
    # and restore must refuse loudly (never publish a manifest pointing
    # at missing files).
    vacuum_manifest_path(path, retain_versions=1)
    try:
        restore_manifest_path(spark, path, to_version=3)
        refused = False
    except FileNotFoundError:
        refused = True
    return spark.createDataFrame(
        [(
            stats["restored_from"],
            stats["new_version"],
            stats["files_restored"],
            row["n"],
            row["s"],
            int(cdf.get("insert", 0)),
            int(cdf.get("delete", 0)),
            bool(refused),
        )],
        "restored_from bigint, new_version bigint, files_restored bigint,"
        " n_rows bigint, sum_v double, cdf_inserts bigint,"
        " cdf_deletes bigint, vacuumed_restore_refused boolean",
    )


# --------------------------------------------------------------------------
# S31 — manifest SHALLOW CLONE: the Delta `CREATE TABLE ... SHALLOW
# CLONE` primitive — a zero-copy fork of a table for experimentation or
# staged migration. The clone's v1 manifest lists the source's current
# files via symlinks (the shared-fs spelling of Delta's absolute-path
# references), so clone cost is O(#files) metadata. Copy-on-write
# divergence is pinned IN-ROW: an append lands only in the clone, a
# DELETE writes only the clone's DV sidecars, and the source is
# byte-identical after both (rows, version, zero DV files — the
# src_clean boolean). Sums are closed-form over the seeded lineage.
# Scale: no data read or copied at any table size; the documented
# hazard (source VACUUM dangles clone references — exactly Delta's)
# lives in the clone docstring.
# --------------------------------------------------------------------------
@register(
    "s31_manifest_shallow_clone",
    oracle="""
    SELECT CAST(2 AS BIGINT)    AS files_cloned,
           CAST(3 AS BIGINT)    AS src_version,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(1000)) AS i))        AS cloned_rows,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(1000)) AS i)) + 500  AS clone_after_append,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(100, 1000)) AS i)) + 500
                                                           AS clone_after_delete,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4) FROM (
                SELECT unnest(range(100, 1000)) AS i
                UNION ALL
                SELECT unnest(range(6000, 6500)) AS i))    AS clone_sum_v,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(1000)) AS i))        AS src_rows,
           TRUE AS src_clean
    """,
)
def s31_manifest_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        _load_manifest,
        clone_manifest_path,
        delete_where_manifest_path,
    )

    _register_manifest_classes(spark)
    src = _scratch(spark, "s31_src")
    dst = _scratch(spark, "s31_clone")
    _seed_retained_dir(spark, src)  # v1..v3; latest = 1000 rows / 2 files
    stats = clone_manifest_path(spark, src, dst)

    def read_agg(path):
        with temp_conf(
            spark, "spark.sql.python.filterPushdown.enabled", "true"
        ):
            return (
                spark.read.format("json_manifest_source")
                .option("path", path)
                .load()
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.round(F.sum("v"), 4).alias("s"),
                )
                .first()
            )

    cloned_rows = read_agg(dst)["n"]
    # Diverge: append 500 rows to the CLONE only, then DELETE i < 100
    # (hits only cloned files -> clone-local DV sidecars).
    (
        _synthetic_series(spark, 6000, 6500, 1)
        .write.format("json_manifest_sink")
        .option("path", dst)
        .mode("append")
        .save()
    )
    after_append = read_agg(dst)["n"]
    delete_where_manifest_path(spark, dst, [("i", "lt", 100)])
    after_delete = read_agg(dst)
    # Source isolation: rows, version, and ZERO delete-vector sidecars.
    src_row = read_agg(src)
    src_m = _load_manifest(src)
    src_clean = (
        src_m["version"] == 3
        and not [
            n for n in os.listdir(src) if n.startswith("dv-")
        ]
        and all("dv" not in f for f in src_m["files"])
    )
    return spark.createDataFrame(
        [(
            stats["files_cloned"],
            stats["src_version"],
            cloned_rows,
            after_append,
            after_delete["n"],
            after_delete["s"],
            src_row["n"],
            bool(src_clean),
        )],
        "files_cloned bigint, src_version bigint, cloned_rows bigint,"
        " clone_after_append bigint, clone_after_delete bigint,"
        " clone_sum_v double, src_rows bigint, src_clean boolean",
    )


# --------------------------------------------------------------------------
# S32 — manifest CHECK constraints: Delta's `ALTER TABLE ADD CONSTRAINT
# CHECK`, enforced at WRITE time — the data-quality gate that makes a
# table trustworthy downstream (no consumer re-validates invariants the
# writer already guaranteed). A violating row fails its executor task
# BEFORE any spool file is renamed in, so the refused write leaves the
# table byte-identical (version and rows pinned in-row). ANSI/Delta 3VL:
# NULL never violates — a row with a NULL constrained column commits
# (pinned in-row with an explicit null row).
# Scale: validation is a per-row predicate inside the existing executor
# spool loop — zero extra passes, no driver involvement, no shuffle.
# --------------------------------------------------------------------------
@register(
    "s32_manifest_check_constraints",
    oracle="""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(2000)) AS i))      AS n_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(2000)) AS i))      AS sum_v,
           CAST(2 AS BIGINT)  AS version,
           TRUE AS violation_refused,
           TRUE AS table_unchanged,
           TRUE AS null_passes
    """,
)
def s32_manifest_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _j

    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import _load_manifest

    _register_manifest_classes(spark)
    path = _scratch(spark, "s32_check")
    checks = _j.dumps([["i", "ge", 0], ["i", "lt", 5000]])

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("check_constraints", checks)
            .mode("append")
            .save()
        )

    write(_synthetic_series(spark, 0, 2000, 2))  # in-bounds -> v1
    # NULL constrained column: 3VL, never a violation -> v2 commits.
    null_row = spark.createDataFrame(
        [(None, 0.0)], "i bigint, v double"
    )
    write(null_row)
    m_before = _load_manifest(path)
    # Out-of-bounds rows: the write must refuse and leave the table
    # byte-identical (same version, same files).
    try:
        write(_synthetic_series(spark, 4000, 6000, 2))  # i up to 5999
        refused = False
    except Exception as exc:  # noqa: BLE001 — Py4J wraps the ValueError
        refused = "check constraint violated" in str(exc)
    m_after = _load_manifest(path)
    unchanged = m_after == m_before
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .agg(
                F.count("i").cast("bigint").alias("n"),
                F.round(F.sum("v"), 4).alias("s"),
            )
            .first()
        )
    return spark.createDataFrame(
        [(
            row["n"],
            row["s"],
            m_after["version"],
            bool(refused),
            bool(unchanged),
            bool(m_after["total_rows"] == 2001),  # the null row committed
        )],
        "n_rows bigint, sum_v double, version bigint,"
        " violation_refused boolean, table_unchanged boolean,"
        " null_passes boolean",
    )


# --------------------------------------------------------------------------
# S33 — RENAME COLUMN via column mapping: Delta's columnMapping.mode=name
# primitive — a rename is ONE manifest publish; data files keep their
# original physical JSON keys forever and every consumer translates at
# its disk boundary. The row exercises the full lifecycle ACROSS the
# rename: a post-rename append (writer maps logical->physical, so old
# and new files agree on disk keys), a DELETE filtered on the renamed
# column (DV scan + zone stats keyed physical), the change feed spanning
# the rename (defined — the additive check compares PHYSICAL columns),
# time travel to the pre-rename snapshot (old logical name), and the
# collision guard (a new column may not reuse a renamed column's
# physical name). Counts/sums closed-form over the seeded series.
# Scale: a rename is O(1) metadata at any table size — the entire point.
# --------------------------------------------------------------------------
@register(
    "s33_manifest_rename_column",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS renamed_version,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(2400)) AS i))     AS n_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4) FROM (
                SELECT unnest(range(1900)) AS i
                UNION ALL
                SELECT unnest(range(2000, 2500)) AS i)) AS sum_reading,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(2000)) AS i))     AS v1_sum,
           CAST(500 AS BIGINT) AS cdf_inserts,
           CAST(100 AS BIGINT) AS cdf_deletes,
           TRUE AS collision_refused
    """,
)
def s33_manifest_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        delete_where_manifest_path,
        rename_column_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s33_rename")

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode("append")
            .save()
        )

    write(_synthetic_series(spark, 0, 2000, 2))  # v1: columns (i, v)
    stats = rename_column_manifest_path(spark, path, "v", "reading")  # v2
    # Post-rename append speaks the NEW logical schema; on disk the new
    # file writes the original physical key, matching the old files.
    write(
        _synthetic_series(spark, 2000, 2500, 1).withColumnRenamed(
            "v", "reading"
        )
    )  # v3
    # DELETE filtered on the RENAMED column (and the key): the scan and
    # zone stats translate to physical. The range [1900, 2000) sits in a
    # PRE-rename file, so the deletes survive the v1->v4 feed (a delete
    # inside the same window as its insert nets out — CDF semantics).
    delete_where_manifest_path(
        spark,
        path,
        [("i", "ge", 1900), ("i", "lt", 2000), ("reading", "ge", 0.0)],
    )  # v4: -100 rows
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum("reading"), 4).alias("s"),
            )
            .first()
        )
        v1_row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .option("version", 1)
            .load()
            .agg(F.round(F.sum("v"), 4).alias("s"))
            .first()
        )
    # Change feed ACROSS the rename: v1 -> v4 is additive in PHYSICAL
    # terms (the rename changed no disk key), so the feed is defined and
    # carries the latest logical column names.
    cdf = dict(
        changes_between_manifest_path(spark, path, 1, 4)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    # Collision guard: an appended NEW column must not reuse the renamed
    # column's still-occupied physical name.
    try:
        write(
            _synthetic_series(spark, 2500, 2600, 1)
            .withColumnRenamed("v", "reading")
            .withColumn("v", F.lit(1.0))
        )
        refused = False
    except Exception as exc:  # noqa: BLE001 — Py4J wraps the ValueError
        refused = "collides with the physical name" in str(exc)
    return spark.createDataFrame(
        [(
            stats["new_version"],
            row["n"],
            row["s"],
            v1_row["s"],
            int(cdf.get("insert", 0)),
            int(cdf.get("delete", 0)),
            bool(refused),
        )],
        "renamed_version bigint, n_rows bigint, sum_reading double,"
        " v1_sum double, cdf_inserts bigint, cdf_deletes bigint,"
        " collision_refused boolean",
    )


# --------------------------------------------------------------------------
# S34 — DROP COLUMN via column mapping: the drop sibling of s33's RENAME
# (Delta `ALTER TABLE ... DROP COLUMN` under columnMapping.mode=name). A
# drop is ONE manifest publish; the column's physical JSON key stays in
# every old data file as an unread tombstone. The row pins the whole
# contract: a post-drop append speaks the narrower schema; time travel to
# the pre-drop snapshot still reads the column; the change feed ACROSS
# the drop stays defined; and — the key correctness pin — RE-ADDING the
# same logical name maps to a FRESH physical key, so the 2000 old rows'
# buried aux values can never resurrect under the new column (they read
# NULL; only the 100 post-re-add rows carry values). Counts/sums are
# closed-form over the seeded series.
# Scale: drop and re-add are O(1) metadata at any table size — no job
# touches the 100 TB of data files; reclaiming dead bytes is a later
# compaction, never the DDL.
# --------------------------------------------------------------------------
@register(
    "s34_manifest_drop_column",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS dropped_version,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(2600)) AS i))      AS n_rows,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(2600)) AS i))      AS sum_v,
           CAST(100 AS BIGINT)                           AS n_aux_rows,
           ROUND(500.0, 4)                               AS sum_aux,
           (SELECT ROUND(SUM(CAST(i % 7 AS DOUBLE)), 4)
            FROM (SELECT unnest(range(2000)) AS i))      AS v1_sum_aux,
           CAST(600 AS BIGINT)                           AS cdf_inserts,
           CAST(0 AS BIGINT)                             AS cdf_deletes,
           TRUE                                          AS no_resurrection
    """,
)
def s34_manifest_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        drop_column_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s34_drop")

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode("append")
            .save()
        )

    # v1: columns (i, v, aux) — aux is the column under test.
    write(
        _synthetic_series(spark, 0, 2000, 2).withColumn(
            "aux", (F.col("i") % 7).cast("double")
        )
    )
    stats = drop_column_manifest_path(spark, path, "aux")  # v2: DROP aux
    # v3: post-drop append speaks the NARROWER schema (the pre-drop
    # schema would now be an illegal implicit re-add of 'aux').
    write(_synthetic_series(spark, 2000, 2500, 1))
    # v4: RE-ADD logical 'aux' via additive schema evolution — the writer
    # must remap it to a fresh physical key (the tombstoned key 'aux'
    # still holds the old values in the v1 files).
    write(
        _synthetic_series(spark, 2500, 2600, 1).withColumn(
            "aux", F.lit(5.0)
        )
    )
    from lime_on_spark_spark.session import temp_conf

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        latest = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum("v"), 4).alias("sv"),
                F.count("aux").cast("bigint").alias("na"),
                F.round(F.sum("aux"), 4).alias("sa"),
                # Any non-NULL aux on a pre-re-add row would be a value
                # resurrected from the dropped column's buried physical
                # key.
                F.sum(
                    (F.col("aux").isNotNull() & (F.col("i") < 2500)).cast(
                        "int"
                    )
                )
                .cast("bigint")
                .alias("resurrected"),
            )
            .first()
        )
        # Time travel to the pre-drop snapshot: the old schema (with aux
        # and its original physical key) is fully readable.
        v1_row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .option("version", 1)
            .load()
            .agg(F.round(F.sum("aux"), 4).alias("sa"))
            .first()
        )
    # Change feed ACROSS the drop: additive in physical terms except the
    # tombstoned key, which the guard skips — the feed emits v3+v4's 600
    # inserts under v4's schema.
    cdf = dict(
        changes_between_manifest_path(spark, path, 1, 4)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    return spark.createDataFrame(
        [(
            stats["new_version"],
            latest["n"],
            latest["sv"],
            latest["na"],
            latest["sa"],
            v1_row["sa"],
            int(cdf.get("insert", 0)),
            int(cdf.get("delete", 0)),
            bool(latest["resurrected"] == 0),
        )],
        "dropped_version bigint, n_rows bigint, sum_v double,"
        " n_aux_rows bigint, sum_aux double, v1_sum_aux double,"
        " cdf_inserts bigint, cdf_deletes bigint, no_resurrection boolean",
    )


# --------------------------------------------------------------------------
# S35 — DESCRIBE HISTORY: the audit surface over the manifest connector
# (Delta `DESCRIBE HISTORY`). Every publish — append, delete, merge,
# rename, drop, restore — stamps a commit_info record into its versioned
# snapshot; the snapshot IS the commit record (claimed atomically at
# publish), so history needs no separate log and VACUUM retention bounds
# it for free. The row runs the whole DML alphabet once and reads the
# history back as a table: version ordering, op names, and the
# rows/files trajectory are all closed-form.
# Scale: O(#retained versions) driver metadata — the table's data size
# never appears in the cost.
# --------------------------------------------------------------------------
@register(
    "s35_manifest_describe_history",
    oracle="""
    SELECT CAST(version AS BIGINT) AS version, op,
           CAST(total_rows AS BIGINT) AS total_rows,
           CAST(n_files AS BIGINT) AS n_files
    FROM (VALUES
        (7, 'RESTORE',       1500, 3),
        (6, 'DROP COLUMN',   1490, 4),
        (5, 'RENAME COLUMN', 1490, 4),
        (4, 'MERGE',         1490, 4),
        (3, 'DELETE',        1490, 3),
        (2, 'APPEND',        1500, 3),
        (1, 'APPEND',        1000, 2)
    ) AS t(version, op, total_rows, n_files)
    """,
)
def s35_manifest_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        delete_where_manifest_path,
        drop_column_manifest_path,
        history_manifest_path,
        merge_into_manifest_path,
        rename_column_manifest_path,
        restore_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s35_history")

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode("append")
            .save()
        )

    write(_synthetic_series(spark, 0, 1000, 2))  # v1: 1000 rows, 2 files
    write(_synthetic_series(spark, 1000, 1500, 1))  # v2: +500, 3 files
    delete_where_manifest_path(spark, path, [("i", "lt", 10)])  # v3: -10
    # v4: update 5 existing keys — DV'd out of old files, re-inserted as
    # one new file; net rows unchanged.
    merge_into_manifest_path(
        spark, path, _synthetic_series(spark, 100, 105, 1), "i"
    )
    rename_column_manifest_path(spark, path, "v", "val")  # v5
    drop_column_manifest_path(spark, path, "val")  # v6
    restore_manifest_path(spark, path, to_version=2)  # v7
    hist = history_manifest_path(path)
    return spark.createDataFrame(
        [
            (e["version"], e["op"], e["total_rows"], e["n_files"])
            for e in hist
        ],
        "version bigint, op string, total_rows bigint, n_files bigint",
    )


# --------------------------------------------------------------------------
# S36 — GENERATED COLUMNS: Delta's `GENERATED ALWAYS AS (expr)` on the
# manifest connector. A derived integer key (here bucket = i div 500) is
# declared ONCE at first write and rides the manifest like the column
# mapping: the spool computes it when absent, VERIFIES it when provided
# (a mismatch fails the task before any spool rename — the table is
# untouched), and zone maps cover it like any column — so a reader
# filtering on the derived key file-skips without computing the
# expression (range-partitioned writes make each file's bucket zone a
# point). DDL interplay guarded: the generation source cannot be
# renamed or dropped while the rule lives.
# Scale: this is the partition-pruning pattern for derived keys (day
# buckets, shards) — the filter prunes at the manifest, so the 100 TB
# scan never starts.
# --------------------------------------------------------------------------
@register(
    "s36_manifest_generated_columns",
    oracle="""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT unnest(range(2500)) AS i))      AS n_total,
           (SELECT ROUND(SUM((i * i % 97) / 10.0), 4)
            FROM (SELECT unnest(range(2500)) AS i))      AS sum_v,
           CAST(500 AS BIGINT)                           AS n_bucket2,
           CAST(500 AS BIGINT)                           AS n_bucket4,
           CAST(1 AS BIGINT)                             AS files_read_b2,
           CAST(6 AS BIGINT)                             AS files_total,
           TRUE                                          AS violation_refused,
           TRUE                                          AS table_unchanged
    """,
)
def s36_manifest_generated_columns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import _load_manifest

    _register_manifest_classes(spark)
    path = _scratch(spark, "s36_gen")

    def write(df, declare=False):
        w = (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
        )
        if declare:
            w = w.option("generated_columns", '{"bucket": ["i", "div", 500]}')
        w.mode("append").save()

    # v1: 4 contiguous range partitions of [0, 2000) declare the rule;
    # the DF does NOT carry `bucket` — the spool computes it.
    write(_synthetic_series(spark, 0, 2000, 4), declare=True)
    # v2: the rule rides the manifest — no option, no column, 1 file.
    write(_synthetic_series(spark, 2000, 2400, 1))
    # v3: a writer MAY provide the column when the values match.
    write(
        _synthetic_series(spark, 2400, 2500, 1).withColumn(
            "bucket", F.floor(F.col("i") / 500).cast("bigint")
        )
    )
    v_before = _load_manifest(path)["version"]
    try:
        write(
            _synthetic_series(spark, 2500, 2600, 1).withColumn(
                "bucket", F.lit(0).cast("bigint")  # wrong on every row
            )
        )
        refused = False
    except Exception as exc:  # noqa: BLE001 — Py4J wraps the ValueError
        refused = "generated column violation" in str(exc)
    unchanged = _load_manifest(path)["version"] == v_before

    def read():
        return (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
        )

    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        tot = read().agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("v"), 4).alias("s"),
        ).first()
        b2 = (
            read()
            .filter(F.col("bucket") == 2)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.max("n_files_read").alias("fr"),
                F.max("n_files_total").alias("ft"),
            )
            .first()
        )
        n_b4 = read().filter(F.col("bucket") == 4).count()
    return spark.createDataFrame(
        [(
            tot["n"],
            tot["s"],
            b2["n"],
            int(n_b4),
            int(b2["fr"]),
            int(b2["ft"]),
            bool(refused),
            bool(unchanged),
        )],
        "n_total bigint, sum_v double, n_bucket2 bigint, n_bucket4 bigint,"
        " files_read_b2 bigint, files_total bigint,"
        " violation_refused boolean, table_unchanged boolean",
    )


# --------------------------------------------------------------------------
# S37 — ROW TRACKING: stable row ids on the manifest connector (Delta row
# tracking's id semantics on the merge-on-read path). Every data file
# owns a contiguous id range [base_row_id, base+n_rows) claimed from a
# monotone table counter at commit; the reader surfaces id = base +
# position as `_row_id`. Stability contract pinned closed-form: DELETE
# never shifts a survivor's id (positions are immutable; a DV'd id
# vanishes), appends claim fresh ranges, MERGE re-inserts updated keys
# under NEW ids (delete+insert — documented divergence from Delta's
# materialized preservation), and ids are never reused. The id algebra
# is a pure range-sum exercise for the oracle.
# Scale: ids are metadata arithmetic (base + position) — no column is
# written, no shuffle happens; the stable key incremental consumers
# need comes free with the manifest.
# --------------------------------------------------------------------------
@register(
    "s37_manifest_row_tracking",
    oracle="""
    WITH ids AS (
        SELECT unnest(range(1500)) AS rid
    ), live AS (
        SELECT rid FROM ids
        WHERE rid >= 100 AND rid NOT IN (200, 201, 202, 203, 204)
        UNION ALL
        SELECT unnest(range(1500, 1505)) AS rid
    )
    SELECT CAST(COUNT(*) AS BIGINT)          AS n_live,
           CAST(COUNT(DISTINCT rid) AS BIGINT) AS n_distinct_ids,
           CAST(MIN(rid) AS BIGINT)          AS min_id,
           CAST(MAX(rid) AS BIGINT)          AS max_id,
           CAST(SUM(rid) AS BIGINT)          AS id_mass,
           CAST(1505 AS BIGINT)              AS next_row_id
    FROM live
    """,
)
def s37_manifest_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        _load_manifest,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s37_rowid")

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode("append")
            .save()
        )

    # v1+v2: ids 0..1499 land in i order (contiguous range partitions,
    # files claim ranges in sorted-name order within each commit).
    write(_synthetic_series(spark, 0, 1000, 2))
    write(_synthetic_series(spark, 1000, 1500, 1))
    # v3: DELETE i < 100 — survivor ids untouched, ids 0..99 vanish.
    delete_where_manifest_path(spark, path, [("i", "lt", 100)])
    # v4: MERGE keys 200..204 — old positions DV'd, re-inserts claim
    # fresh ids 1500..1504.
    merge_into_manifest_path(
        spark, path, _synthetic_series(spark, 200, 205, 1), "i"
    )
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        row = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .option("with_row_ids", "true")
            .load()
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_live"),
                F.countDistinct("_row_id").cast("bigint").alias(
                    "n_distinct_ids"
                ),
                F.min("_row_id").alias("min_id"),
                F.max("_row_id").alias("max_id"),
                F.sum("_row_id").alias("id_mass"),
            )
            .first()
        )
    return spark.createDataFrame(
        [(
            row["n_live"],
            row["n_distinct_ids"],
            row["min_id"],
            row["max_id"],
            row["id_mass"],
            int(_load_manifest(path)["next_row_id"]),
        )],
        "n_live bigint, n_distinct_ids bigint, min_id bigint,"
        " max_id bigint, id_mass bigint, next_row_id bigint",
    )


# --------------------------------------------------------------------------
# S38 — per-commit CDF attribution (_commit_version): the net manifest
# diff (s24) compares ONLY the endpoints, so a row inserted at v4 and
# deleted at v5 leaves no trace in changes(v1, v5) — correct for state
# convergence (d97 IVM), wrong for audit/replay consumers who need every
# change in commit order (Delta CDF semantics). per_commit=True unions
# the adjacent diffs (v, v+1] with a _commit_version tag: the 50
# short-lived rows appear as BOTH their insert (v4) and their delete
# (v5), and per-version counts are exact. The row pins the two modes
# against each other — the net feed's totals AND the per-commit
# attribution, including the short-lived rows only one of them can see.
# Scale: one manifest load per intermediate version (metadata), one task
# per changed-file-per-commit — cost scales with the change stream, not
# the table.
# --------------------------------------------------------------------------
@register(
    "s38_manifest_cdf_per_commit",
    oracle="""
    SELECT * FROM (VALUES
        (2, 'delete', 100),
        (3, 'delete',   5),
        (3, 'insert',   5),
        (4, 'insert', 200),
        (5, 'delete',  50)
    ) AS t(commit_version, change_type, n)
    ORDER BY commit_version, change_type
    """,
)
def s38_manifest_cdf_per_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s38_cdc")

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode("append")
            .save()
        )

    write(_synthetic_series(spark, 0, 1000, 2))  # v1
    delete_where_manifest_path(spark, path, [("i", "lt", 100)])  # v2: -100
    merge_into_manifest_path(  # v3: 5 in-place updates (delete+insert)
        spark, path, _synthetic_series(spark, 200, 205, 1), "i"
    )
    write(_synthetic_series(spark, 1000, 1200, 1))  # v4: +200
    # v5: delete 50 of the rows inserted at v4 — short-lived rows the
    # NET diff can never see.
    delete_where_manifest_path(
        spark, path, [("i", "ge", 1000), ("i", "lt", 1050)]
    )

    per = changes_between_manifest_path(spark, path, 1, 5, per_commit=True)
    attributed = (
        per.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(F.count(F.lit(1)).cast("int").alias("n"))
        .orderBy("commit_version", "change_type")
    )
    # Cross-mode consistency pin: the net feed's totals must equal the
    # per-commit totals MINUS the short-lived cancellations (the 50 rows
    # inserted at v4 and deleted at v5 net out; the 5 merge re-inserts do
    # NOT — their deletes hit v1-era positions).
    net = dict(
        changes_between_manifest_path(spark, path, 1, 5)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    assert (int(net.get("insert", 0)), int(net.get("delete", 0))) == (
        155,
        105,
    ), f"net feed totals diverged: {net}"
    return attributed.withColumn(
        "commit_version", F.col("commit_version").cast("int")
    )


# --------------------------------------------------------------------------
# S39 — protocol feature gates: Delta's reader/writer table-features
# contract. Every publish derives and stamps the features the snapshot
# REQUIRES (reader: deletion_vectors / column_mapping / dropped_columns;
# writer: generated_columns / row_tracking), and every manifest load —
# the single choke point under scans, CDF, streams, DML, DDL, vacuum,
# history — refuses a table requiring a feature this build does not
# know, instead of silently misreading data a future writer produced
# (ignoring an unknown DV encoding would resurrect deleted rows). The
# row builds a table that exercises the full feature set, pins the
# stamped lists, and injects an unknown required feature as the
# negative control.
# Scale: two O(1) metadata checks per commit/load; the forward-compat
# insurance every shared 100 TB table needs.
# --------------------------------------------------------------------------
@register(
    "s39_manifest_feature_gates",
    oracle="""
    SELECT 'column_mapping,deletion_vectors,dropped_columns'
               AS reader_features,
           'generated_columns,row_tracking' AS writer_features,
           CAST(1400 AS BIGINT)             AS n_rows,
           TRUE                             AS unknown_refused,
           TRUE                             AS refused_before_data
    """,
)
def s39_manifest_feature_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os

    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        _load_manifest,
        delete_where_manifest_path,
        drop_column_manifest_path,
        rename_column_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s39_gates")

    (
        _synthetic_series(spark, 0, 1500, 2)
        .withColumn("aux", (F.col("i") % 3).cast("double"))
        .write.format("json_manifest_sink")
        .option("path", path)
        .option("retain_history", "true")
        .option("generated_columns", '{"bucket": ["i", "div", 500]}')
        .mode("append")
        .save()
    )  # v1: generated + row tracking
    delete_where_manifest_path(spark, path, [("i", "lt", 100)])  # v2: DV
    rename_column_manifest_path(spark, path, "v", "reading")  # v3: mapping
    drop_column_manifest_path(spark, path, "aux")  # v4: dropped
    m = _load_manifest(path)
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        n = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
            .count()
        )
    # Negative control: a FUTURE writer stamps a feature this build does
    # not know; both the latest pointer and the versioned snapshot carry
    # it, and the very next load must refuse.
    poisoned = dict(m)
    poisoned["reader_features"] = list(m["reader_features"]) + [
        "columnar_teleportation"
    ]
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(poisoned, fh)
    refused = before_data = False
    try:
        spark.read.format("json_manifest_source").option(
            "path", path
        ).load().count()
    except Exception as exc:  # noqa: BLE001 — Py4J wraps the ValueError
        refused = "columnar_teleportation" in str(exc)
        # The refusal happens at PLAN time (manifest load), before any
        # data file is opened.
        before_data = "does not support" in str(exc)
    return spark.createDataFrame(
        [(
            ",".join(m["reader_features"]),
            ",".join(m["writer_features"]),
            int(n),
            bool(refused),
            bool(before_data),
        )],
        "reader_features string, writer_features string, n_rows bigint,"
        " unknown_refused boolean, refused_before_data boolean",
    )


# --------------------------------------------------------------------------
# S40 — DYNAMIC PARTITION OVERWRITE (Spark's
# `partitionOverwriteMode=dynamic`, the Hive/Delta `INSERT OVERWRITE`
# partition-replacement contract): an overwrite of a partitioned table
# replaces ONLY the partitions present in the incoming frame; every
# other partition survives untouched. Static mode — the default — wipes
# the whole table first, which on a 100 TB date-partitioned corpus
# turns "re-run yesterday" into "destroy three years". The row seeds a
# table partitioned by order priority, rewrites ONE partition (URGENT,
# evens only) under dynamic mode, pins that the other four partitions
# are byte-identical survivors, and runs the SAME overwrite under
# static mode as the negative control (exactly one partition remains).
# Scale: dynamic overwrite is the idempotent daily-backfill primitive —
# the job rewrites the day it reprocessed, never the table.
# --------------------------------------------------------------------------
@register(
    "s40_dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                           OR o_orderkey % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
           TRUE                                        AS others_survived,
           TRUE                                        AS static_wiped_rest
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def s40_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    target = F.col("o_orderpriority") == "1-URGENT"
    rewrite = orders.filter(target & (F.col("o_orderkey") % 2 == 0))

    def seed(path: str) -> None:
        orders.write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(path)

    def overwrite(path: str, mode: str) -> None:
        (
            rewrite.write.mode("overwrite")
            .option("partitionOverwriteMode", mode)
            .partitionBy("o_orderpriority")
            .parquet(path)
        )

    # Dynamic arm: only the URGENT partition is replaced.
    dyn = _scratch(spark, "s40_dyn")
    seed(dyn)
    before = {
        r["o_orderpriority"]: r["n"]
        for r in spark.read.parquet(dyn)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    overwrite(dyn, "dynamic")
    after_df = (
        spark.read.parquet(dyn)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_after"))
    )
    after = {
        r["o_orderpriority"]: r["n_after"] for r in after_df.collect()
    }
    others_survived = all(
        after.get(p) == n for p, n in before.items() if p != "1-URGENT"
    ) and len(after) == len(before)
    # Static arm (negative control): the same overwrite under the default
    # mode leaves ONLY the rewritten partition.
    st = _scratch(spark, "s40_static")
    seed(st)
    overwrite(st, "static")
    static_parts = [
        r["o_orderpriority"]
        for r in spark.read.parquet(st)
        .select("o_orderpriority")
        .distinct()
        .collect()
    ]
    static_wiped = static_parts == ["1-URGENT"]
    return after_df.select(
        "o_orderpriority",
        "n_after",
        F.lit(bool(others_survived)).alias("others_survived"),
        F.lit(bool(static_wiped)).alias("static_wiped_rest"),
    )


# --------------------------------------------------------------------------
# S41 — FILES METADATA TABLE (Delta's DESCRIBE DETAIL / `files` view,
# Iceberg's `.files` metadata table): the per-file inventory — physical
# rows, DV'd rows, live rows, row-id range, zone bounds — exposed as an
# ordinary DataFrame, because small-files pressure, DV debt (a file 90%
# deleted wants compaction), and skew diagnosis are QUERIES at 100 TB,
# not log-spelunking. The row builds the s38 five-commit lineage (two
# range files + a delete + a merge re-insert + an append + a partial
# delete) whose physical layout is fully determined, and pins every
# file's accounting closed-form: base_row_id continuity (monotone
# counter in sorted-name order), n_deleted per DV, live = rows - DV'd,
# and the i-column zone bounds the skipping reader prunes by.
# Scale: O(#files) driver-side metadata — no data file is opened.
# --------------------------------------------------------------------------
@register(
    "s41_manifest_files_table",
    oracle="""
    SELECT * FROM (VALUES
        (1, 500, 105, 395,    0, TRUE,  0,  499),
        (2, 500,   0, 500,  500, FALSE, 500, 999),
        (3,   5,   0,   5, 1000, FALSE, 200, 204),
        (4, 200,  50, 150, 1005, TRUE, 1000, 1199)
    ) AS t(file_ord, n_rows, n_deleted, live_rows, base_row_id,
           has_dv, zone_min_i, zone_max_i)
    ORDER BY file_ord
    """,
)
def s41_manifest_files_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.sources.python_source import (
        _load_manifest,
        delete_where_manifest_path,
        merge_into_manifest_path,
    )

    _register_manifest_classes(spark)
    path = _scratch(spark, "s41_files")

    def write(df):
        (
            df.write.format("json_manifest_sink")
            .option("path", path)
            .option("retain_history", "true")
            .mode("append")
            .save()
        )

    write(_synthetic_series(spark, 0, 1000, 2))  # v1: files [0,500) [500,1000)
    delete_where_manifest_path(spark, path, [("i", "lt", 100)])  # v2: DV f1
    merge_into_manifest_path(  # v3: 5 updates — DV f1 + 5-row re-insert
        spark, path, _synthetic_series(spark, 200, 205, 1), "i"
    )
    write(_synthetic_series(spark, 1000, 1200, 1))  # v4: one 200-row file
    delete_where_manifest_path(  # v5: DV on v4's file
        spark, path, [("i", "ge", 1000), ("i", "lt", 1050)]
    )

    rows = []
    for f in sorted(
        _load_manifest(path)["files"], key=lambda f: f["base_row_id"]
    ):
        zone = f["stats"]["i"]
        rows.append(
            (
                int(f["n_rows"]),
                int(f.get("n_deleted", 0)),
                int(f["n_rows"] - f.get("n_deleted", 0)),
                int(f["base_row_id"]),
                bool(f.get("dv")),
                int(zone["min"]),
                int(zone["max"]),
            )
        )
    return (
        spark.createDataFrame(
            [(i + 1, *r) for i, r in enumerate(rows)],
            "file_ord int, n_rows int, n_deleted int, live_rows int,"
            " base_row_id int, has_dv boolean, zone_min_i int,"
            " zone_max_i int",
        )
    )


# --------------------------------------------------------------------------
# S42 — malformed-CSV read modes (the CSV twin of s7's corrupt-JSON row):
# CSV is where ingest corruption actually arrives at 100 TB, and Spark's
# three contract levels are the operational knob — PERMISSIVE null-fills
# the bad field and captures the raw line in the declared corrupt-record
# column (quarantine-and-continue), DROPMALFORMED silently shrinks the
# table (counted here, never assumed), FAILFAST refuses the batch (pinned
# by the negative control). One deterministic feed — every 89th order's
# price replaced by a non-numeric token — drives all three modes, and
# the oracle recomputes every count and the good-row price mass from the
# clean table.
# Scale: mode handling is per-task streaming parse state — no shuffle,
# no driver involvement; the quarantine column is the Dolma-attributes
# pattern at the ingest boundary.
# --------------------------------------------------------------------------
@register(
    "s42_csv_malformed_modes",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)                            AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 89 = 0 THEN 1 ELSE 0 END)
                AS BIGINT)                                     AS n_quarantined,
           CAST(SUM(CASE WHEN o_orderkey % 89 = 0 THEN 0 ELSE 1 END)
                AS BIGINT)                                     AS n_dropmalformed,
           ROUND(SUM(CASE WHEN o_orderkey % 89 = 0 THEN 0
                          ELSE o_totalprice END), 2)           AS sum_good_price,
           TRUE                                                AS failfast_raised
    FROM orders
    """,
)
def s42_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Bad rows are STRUCTURALLY malformed (a truncated 2-token line):
    # Spark 4's DROPMALFORMED drops token-count violations but treats a
    # mere cast failure as a null-filled field, so the corruption must be
    # structural for all three modes to diverge.
    good = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.col("o_totalprice").cast("string"),
        F.col("o_orderpriority"),
    )
    bad = F.concat_ws(",", F.col("o_orderkey").cast("string"), F.lit("oops"))
    line = F.when(F.col("o_orderkey") % 89 == 0, bad).otherwise(good)
    path = _scratch(spark, "s42_csv")
    orders.select(line.alias("value")).write.mode("overwrite").text(path)

    schema = "o_orderkey bigint, o_totalprice double, o_orderpriority string"

    def read(mode: str, with_corrupt: bool = False):
        opts = {"mode": mode}
        sch = schema
        if with_corrupt:
            opts["columnNameOfCorruptRecord"] = "_corrupt"
            sch = schema + ", _corrupt string"
        return spark.read.options(**opts).schema(sch).csv(path)

    # PERMISSIVE: quarantine-and-continue. (Spark requires caching before
    # filtering on the internal corrupt-record column for CSV.)
    perm = read("PERMISSIVE", with_corrupt=True).cache()
    stats = perm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_corrupt").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_quarantined"),
        F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias(
            "sum_good_price"
        ),
    ).first()
    # The returned frame is built from the collected stats row, so the
    # cached PERMISSIVE read has no remaining consumer — release it
    # rather than letting it sit in executor memory for the rest of a
    # 396-row sweep session.
    perm.unpersist()
    # Counting a DROPMALFORMED read is a planner minefield: count() never
    # parses fields, and ANY count of a provably non-null expression
    # folds back to count-star (both probed to return the unparsed row
    # count). CSV malformed-ness is judged against the columns the plan
    # actually requires, so the honest pin is the production shape:
    # materialize the full-width cleaned read to parquet and count THAT.
    cleaned = _scratch(spark, "s42_cleaned")
    read("DROPMALFORMED").write.mode("overwrite").parquet(cleaned)
    n_drop = spark.read.parquet(cleaned).count()
    failfast_raised = False
    try:
        read("FAILFAST").collect()
    except Exception as exc:  # noqa: BLE001 — Py4J wraps SparkException
        # Pin the REASON, not just "it raised": an unrelated failure
        # (missing path, bad schema) must not pass the contract vacuously.
        failfast_raised = "MALFORMED" in str(exc).upper()
    return spark.createDataFrame(
        [(
            stats["n_rows"],
            stats["n_quarantined"],
            int(n_drop),
            float(stats["sum_good_price"]),
            bool(failfast_raised),
        )],
        "n_rows bigint, n_quarantined bigint, n_dropmalformed bigint,"
        " sum_good_price double, failfast_raised boolean",
    )


# --------------------------------------------------------------------------
# O17 — FILTER PUSHDOWN pin (the scan-side twin of o10's schema-pruning
# pin): a selective predicate must reach the parquet reader as
# PushedFilters — at 100 TB the difference between "row-group statistics
# skip most of the table" and "every row is decoded then thrown away".
# Self-certifying (the o9/o10 discipline): the row executes a selective
# lineitem read (l_returnflag = 'R' AND l_quantity < 5) and derives
# filters_pushed = "both predicates appear in the executed scan's
# PushedFilters AND the scan's ReadSchema excludes the unprojected money
# columns" from the physical plan string; the oracle pins TRUE, so a
# regression that stops pushing (e.g. a UDF wrapping the predicate, a
# cast blocking the translation) fails the artifact, not just a vibe.
# --------------------------------------------------------------------------
@register(
    "o17_filter_pushdown",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)      AS n,
           ROUND(SUM(l_quantity), 2)     AS sum_qty,
           TRUE                          AS filters_pushed
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity < 5
    GROUP BY l_returnflag
    """,
)
def o17_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re as _re

    li = load_table(spark, sf_dir, "lineitem")
    res = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 5))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = m.group(1) if m else ""
    rs = _re.search(r"ReadSchema: struct<([^\n]*)", plan)
    read_schema = rs.group(1) if rs else ""
    ok = (
        "EqualTo(l_returnflag,R)" in pushed
        and "LessThan(l_quantity,5.0)" in pushed
        and "l_extendedprice" not in read_schema
        and "l_shipdate" not in read_schema
    )
    rows = [(*r, ok) for r in res.collect()]
    return spark.createDataFrame(
        rows,
        "l_returnflag string, n bigint, sum_qty double,"
        " filters_pushed boolean",
    )


# --------------------------------------------------------------------------
# S43 — VARIANT-in-PARQUET roundtrip (the storage half of f28/t35): a
# VARIANT column written to parquet (Spark 4 shreds it as the
# metadata/value binary pair) must read back as VARIANT with every
# typed path extraction intact — the lakehouse contract for landing
# schemaless payloads WITHOUT exploding them to strings or locking a
# struct schema at write time. The feed lifts events.props-shaped JSON
# (plus unix-micros timestamps) to VARIANT, writes, reads back, and
# re-aggregates via variant_get; the oracle computes the same aggregate
# from the ORIGINAL events table, so agreement proves the
# parse -> shred -> store -> reassemble -> extract loop lossless.
# Self-certifying pins (the o9/o10 discipline): the read-back schema
# must still SAY variant (a silent stringification would flip it) and
# row counts must survive the roundtrip.
# Scale: shredded variant stays columnar at rest; extraction is per-row
# JVM work at scan stage — no Python, no shuffle before the census agg.
# --------------------------------------------------------------------------
@register(
    "s43_variant_parquet_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)   AS n,
           ROUND(SUM(value), 2)       AS sum_v,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
           TRUE                       AS schema_is_variant,
           TRUE                       AS rows_preserved
    FROM events
    GROUP BY event_type
    """,
)
def s43_variant_parquet_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from lime_on_spark_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    n_src = ev.count()
    lifted = ev.select(
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("event_type").alias("et"),
                    F.col("value").alias("v"),
                    F.unix_micros("ts").alias("ts_us"),
                )
            )
        ).alias("payload")
    )
    path = _scratch(spark, "s43_variant")
    lifted.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    is_variant = back.schema["payload"].dataType.typeName() == "variant"
    agg = back.select(
        F.variant_get("payload", "$.et", "string").alias("event_type"),
        F.variant_get("payload", "$.v", "double").alias("v"),
        F.variant_get("payload", "$.ts_us", "long").alias("ts_us"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("v"), 2).alias("sum_v"),
        F.min("ts_us").cast("bigint").alias("min_ts_us"),
    )
    rows_preserved = bool(
        back.count() == n_src
    )
    return agg.select(
        "event_type", "n", "sum_v", "min_ts_us",
        F.lit(bool(is_variant)).alias("schema_is_variant"),
        F.lit(rows_preserved).alias("rows_preserved"),
    )
