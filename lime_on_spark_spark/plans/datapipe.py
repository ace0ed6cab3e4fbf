"""LLM-data-pipeline operators over `documents` (SURVEY.md §2k rows
D1 exact dedup, D5 text stats, D6 multimodal join, D7 routing + S4 sink).

Near-dup / ANN operators (D2-D4) live in plans/vectors.py with the vector
math they depend on.

Scale notes:
* D1 groups on `sha2(text, 256)` — the shuffle payload is the 32-byte hash,
  never the document body; survivor choice is `min(doc_id)`, a plain
  aggregate (no window, no sort).
* D5/D6/D7 are single-shuffle aggregates on low-cardinality keys.
* D7 performs a real partitioned parquet write (S4): `partitionBy('lang')`
  gives partition pruning to every downstream per-language read, which is
  the routing primitive a 100 TB corpus pipeline needs.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# D1 — exact dedup (bench headline; BASELINE.md row 7: 1 summary row)
# --------------------------------------------------------------------------
@register(
    "d1_exact_dedup",
    oracle="""
    SELECT COUNT(*)                                           AS n_docs,
           COUNT(DISTINCT text)                               AS n_distinct,
           COUNT(*) - COUNT(DISTINCT text)                    AS n_dups
    FROM documents
    """,
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_dups"),
    )


@register(
    "d1_dedup_keep_first",
    oracle="""
    SELECT MIN(doc_id) AS doc_id
    FROM documents
    GROUP BY sha256(text)
    """,
)
def d1_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor set of exact dedup: lowest doc_id per distinct text.

    Hash-groupBy on the digest so the shuffle carries 32 bytes per row, not
    the document body — the formulation that holds at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2("text", 256))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


# --------------------------------------------------------------------------
# D5 — text analysis / quality stats per (lang, source)
# --------------------------------------------------------------------------
@register(
    "d5_text_stats",
    oracle="""
    SELECT lang,
           source,
           COUNT(*)                                           AS n_docs,
           ROUND(AVG(len(string_split(text, ' '))), 4)        AS avg_tokens,
           ROUND(AVG(length(text)), 4)                        AS avg_chars,
           MAX(n_chars)                                       AS max_chars,
           CAST(SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
                AS BIGINT)                                    AS n_chars_consistent
    FROM documents
    GROUP BY lang, source
    """,
)
def d5_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(n_tokens), 4).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(
            F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0)
        ).cast("bigint").alias("n_chars_consistent"),
    )


# --------------------------------------------------------------------------
# D6 — multimodal join: text + embedding + label in one row
# --------------------------------------------------------------------------
@register(
    "d6_multimodal_join",
    oracle="""
    SELECT label,
           lang,
           COUNT(*)                                           AS n,
           ROUND(AVG(n_chars), 4)                             AS avg_chars,
           CAST(MIN(len(embedding)) AS INTEGER)               AS dim_min,
           CAST(MAX(len(embedding)) AS INTEGER)               AS dim_max
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY label, lang
    """,
)
def d6_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("label", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min(F.size("embedding")).alias("dim_min"),
            F.max(F.size("embedding")).alias("dim_max"),
        )
    )


# --------------------------------------------------------------------------
# D7 + S4 — language routing via a real partitioned parquet write
# --------------------------------------------------------------------------
@register(
    "d7_lang_routing",
    oracle="""
    SELECT lang,
           COUNT(*)                                           AS n_docs,
           ROUND(AVG(n_chars), 4)                             AS avg_chars,
           COUNT(DISTINCT source)                             AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def d7_lang_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route documents into per-language parquet partitions, then aggregate
    from the routed copy — the oracle checks the round-trip loses nothing.

    `partitionBy('lang')` is the 100-TB routing primitive: downstream
    per-language consumers read only their directory (partition pruning).
    """
    docs = load_table(spark, sf_dir, "documents")
    scratch = os.environ.get(
        "LIME_ON_SPARK_SCRATCH", os.path.join(os.path.dirname(__file__), "..", "..", ".scratch")
    )
    # Unique per-invocation sink: a fixed path would let concurrent runs
    # (parallel test workers, bench + driver) overwrite each other's output
    # mid-read. applicationId + uuid keeps every writer isolated.
    unique = f"{spark.sparkContext.applicationId}-{uuid.uuid4().hex[:12]}"
    sink = os.path.join(
        os.path.abspath(scratch), f"d7_routing-{unique}.parquet"
    )
    docs.write.mode("overwrite").partitionBy("lang").parquet(sink)
    routed = spark.read.parquet(sink)
    return routed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# --------------------------------------------------------------------------
# D8 — deterministic hash-based train/val/test split. Assignment is a pure
# function of the stable document key (md5 of doc_id), so the split is
# reproducible across runs, engines, and cluster sizes — no RNG state, no
# seed coordination, and adding executors can never reshuffle membership.
# This is the split primitive a 100-TB training pipeline needs: a map-only
# expression, verified exactly against DuckDB's md5.
# --------------------------------------------------------------------------
def md5_split_label(key_col):
    """d8's split assignment as a reusable expression: first hex nibble of
    md5(key) — 0-b (12/16 = 75%) train, c-d (12.5%) val, e-f (12.5%) test.
    Pure function of the key: engine-portable (DuckDB's md5 derives the
    identical label — the d8 oracle), repartition/fan-out-free, and
    property-pinned against hashlib in tests/test_properties.py."""
    nib = F.substring(F.md5(key_col.cast("string")), 1, 1)
    return F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test")


@register(
    "d8_hash_split",
    oracle="""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                 ELSE 'test'
               END AS split,
               n_chars, lang
        FROM documents
    ) assigned
    GROUP BY split
    """,
)
def d8_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", md5_split_label(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# --------------------------------------------------------------------------
# D8b — stratified sample: per-language sampling fractions via sampleBy.
# Bernoulli per-row draw (seeded) — no shuffle, each task filters its own
# partition, so it scales as a pure scan. The engine-specific RNG means the
# sampled SET has no SQL twin, but the per-stratum rate does: the query
# emits each stratum's exact population plus a Spark-computed rate verdict
# (|rate − target| < 0.15; worst observed deviation across sf0.001/0.01/0.1
# is 0.104, and sampleBy is seed-deterministic so the margin can't drift).
# tests/test_properties.py still pins determinism and tighter rate bounds.
# --------------------------------------------------------------------------
@register(
    "d8_stratified_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_total, TRUE AS rate_ok
    FROM documents
    GROUP BY lang
    """,
)
def d8_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    # Downsample the majority class, keep the rest: the class-rebalancing
    # shape of a training-data pipeline. (The distinct() above is a bounded
    # label-vocabulary scan, not data-sized.)
    fractions = {lang: (0.2 if lang == "en" else 0.8) for lang in langs}
    sample = docs.sampleBy("lang", fractions, seed=42)
    sampled = sample.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    target = F.when(F.col("lang") == "en", 0.2).otherwise(0.8)
    return totals.join(sampled, "lang", "left").select(
        "lang",
        "n_total",
        (
            F.abs(
                F.coalesce("n_sampled", F.lit(0)) / F.col("n_total") - target
            )
            < 0.15
        ).alias("rate_ok"),
    )


# --------------------------------------------------------------------------
# D12 — exact-quota deterministic sampling per source ("data mixing"): take
# exactly ceil(q·n_src) docs from each source, chosen by md5 rank — a
# seedless, engine-reproducible stand-in for per-stratum random sampling
# when the mix ratio must be EXACT (sampleBy is Bernoulli: right rate,
# wrong count). Window ranks within source partitions (high-cardinality
# enough at corpus scale; a hot source falls back to the salted pattern).
# --------------------------------------------------------------------------
@register(
    "d12_quota_sample",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    )
    SELECT source,
           COUNT(*)      AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM ranked
    WHERE rk <= CAST(ceil(0.3 * n_src) AS BIGINT)
    GROUP BY source
    """,
)
def d12_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_src"),
    )
    return (
        ranked.filter(F.col("rk") <= F.ceil(0.3 * F.col("n_src")).cast("bigint"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


# --------------------------------------------------------------------------
# D1c — priority-based dedup survivor: among exact duplicates (same text
# digest), keep the BEST copy (longest, tie-break smallest doc_id) rather
# than the first seen — the canonical-selection rule real corpora need when
# duplicates differ in metadata quality. Same digest-keyed shuffle as
# d1_dedup_keep_first; survivorship is max_by over the group.
# --------------------------------------------------------------------------
@register(
    "d1_dedup_keep_best",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (
                   PARTITION BY md5(text)
                   ORDER BY n_chars DESC, doc_id
               ) AS rk
        FROM documents
    )
    SELECT lang,
           COUNT(*)     AS n_survivors,
           CAST(SUM(n_chars) AS BIGINT) AS survivor_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM ranked
    WHERE rk = 1
    GROUP BY lang
    """,
)
def d1_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    survivors = docs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum("n_chars").alias("survivor_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


# --------------------------------------------------------------------------
# D20 — winsorization: clip n_chars to each language's exact [p05, p95]
# band — the standard outlier treatment before computing corpus statistics
# that feed sampling weights. Percentiles come from one per-lang aggregate
# (tiny result, broadcast back onto the scan); the clip itself is a pure
# column expression.
# --------------------------------------------------------------------------
@register(
    "d20_winsorize",
    oracle="""
    WITH bounds AS (
        SELECT lang,
               quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(d.n_chars), 4) AS avg_raw,
           ROUND(AVG(least(greatest(d.n_chars * 1.0, b.lo), b.hi)), 4)
               AS avg_winsorized,
           CAST(SUM(CASE WHEN d.n_chars < b.lo OR d.n_chars > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM documents d JOIN bounds b ON d.lang = b.lang
    GROUP BY d.lang
    """,
)
def d20_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("n_chars").cast("double"), F.col("lo")), F.col("hi")
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_raw"),
            F.round(F.avg(clipped), 4).alias("avg_winsorized"),
            F.sum(
                F.when(
                    (F.col("n_chars") < F.col("lo"))
                    | (F.col("n_chars") > F.col("hi")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_clipped"),
        )
    )


# --------------------------------------------------------------------------
# D21 — MERGE/upsert (SCD-style dimension refresh): a base dimension
# (customers with account balance) merged with a change feed (each
# customer's order activity): matched rows get updated facts, unmatched
# feed rows would insert, unmatched base rows persist. Expressed as a FULL
# OUTER join + coalesce — the engine-agnostic MERGE plan (Delta/Iceberg
# MERGE INTO lowers to exactly this shape: one keyed shuffle of each side).
# --------------------------------------------------------------------------
@register(
    "d21_merge_upsert",
    oracle="""
    WITH feed AS (
        SELECT o_custkey AS custkey,
               COUNT(*)  AS n_orders,
               CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT)
                   AS order_cents
        FROM orders GROUP BY o_custkey
    ), merged AS (
        SELECT COALESCE(c.c_custkey, f.custkey) AS custkey,
               CASE WHEN c.c_custkey IS NULL THEN 'insert'
                    WHEN f.custkey IS NULL THEN 'keep'
                    ELSE 'update' END AS action,
               COALESCE(f.n_orders, 0) AS n_orders,
               COALESCE(f.order_cents, 0) AS order_cents
        FROM customer c FULL OUTER JOIN feed f ON c.c_custkey = f.custkey
    )
    SELECT action,
           COUNT(*) AS n_rows,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders,
           CAST(SUM(order_cents) AS BIGINT) AS total_order_cents
    FROM merged
    GROUP BY action
    """,
)
def d21_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    feed = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice") * 100)
        .cast("bigint")
        .alias("order_cents"),
    )
    merged = cust.join(feed, cust.c_custkey == feed.custkey, "full_outer").select(
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("custkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("order_cents", F.lit(0)).alias("order_cents"),
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_orders").alias("total_orders"),
        F.sum("order_cents").alias("total_order_cents"),
    )


# --------------------------------------------------------------------------
# D23 — blocked edit-distance matching: near-identical part names within a
# blocking key (first token + length band), the classic entity-resolution
# shape for SHORT strings where shingle Jaccard is too coarse. Blocking
# turns the quadratic all-pairs into per-block equi-join candidates — the
# same inverted-index discipline as D2, keyed on the block instead of a
# shingle. Levenshtein runs only on candidates, JVM-side on both engines.
# --------------------------------------------------------------------------
@register(
    "d23_blocked_edit_distance",
    oracle="""
    WITH parts AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[1] AS block,
               length(p_name) AS len
        FROM part
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM parts a
    JOIN parts b
      ON a.block = b.block
     AND a.p_partkey < b.p_partkey
     AND abs(a.len - b.len) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def d23_blocked_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    parts = part.select(
        "p_partkey",
        "p_name",
        F.split("p_name", " ").getItem(0).alias("block"),
        F.length("p_name").alias("len"),
    )
    a = parts.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "block",
        F.col("len").alias("len_a"),
    )
    b = parts.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "block",
        F.col("len").alias("len_b"),
    )
    return (
        a.join(b, "block")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 2)
        )
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 3)
    )


# --------------------------------------------------------------------------
# D24 — quality-WEIGHTED deterministic sampling: keep each document with
# probability equal to its quality weight (type-token ratio, clipped to
# [0,1]), decided by comparing an md5-derived uniform against the weight.
# Unlike Bernoulli sample()/sampleBy() this is a pure function of the
# stable document key — reproducible across engines, runs, and cluster
# sizes (the D8 hash-split discipline extended to non-uniform rates), so
# the oracle reproduces the EXACT sampled set, not just rate bounds.
# --------------------------------------------------------------------------
@register(
    "d24_weighted_sample",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
           len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS weight,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) / 4294967296.0 AS u
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           ROUND(AVG(weight), 6) AS avg_weight
    FROM scored
    WHERE u < weight
    GROUP BY lang
    """,
)
def d24_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    weight = F.size(F.array_distinct(toks)) / F.size(toks)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(4294967296.0)
    kept = docs.select(
        "lang", "n_chars", weight.alias("weight"), u.alias("u")
    ).filter(F.col("u") < F.col("weight"))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.round(F.avg("weight"), 6).alias("avg_weight"),
    )


# --------------------------------------------------------------------------
# D25 — PII redaction (regex scrub: emails / IPv4 / phone numbers)
# --------------------------------------------------------------------------
# The synthetic corpus contains no PII (no digits or '@' at all), so the
# query first injects deterministic PII derived from doc_id — same trick as
# the multimodal fake-decode — and then runs the real redaction machinery:
# JVM-side regexp_count / regexp_replace, no Python in the hot path. The
# patterns are written in the common Java-regex/RE2 subset so the DuckDB
# oracle applies the *same* pattern text.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b555-\d{4}\b"


@register(
    "d25_pii_redaction",
    oracle=f"""
    WITH pii AS (
        SELECT lang,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.'
                    || CAST(doc_id % 200 + 1 AS VARCHAR) || '.'
                    || CAST(doc_id % 250 + 1 AS VARCHAR)
                    || '.7 call 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS text_pii
        FROM documents
    ), counted AS (
        SELECT lang,
               len(regexp_extract_all(text_pii, '{_PII_EMAIL}')) AS n_email,
               len(regexp_extract_all(text_pii, '{_PII_IPV4}')) AS n_ip,
               len(regexp_extract_all(text_pii, '{_PII_PHONE}')) AS n_phone,
               length(regexp_replace(regexp_replace(regexp_replace(
                   text_pii, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IPV4}', '<IP>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_len
        FROM pii
    )
    SELECT lang,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_ip) AS BIGINT) AS ips,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(redacted_len) AS BIGINT) AS redacted_chars
    FROM counted
    GROUP BY lang
    """,
)
def d25_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: count and redact emails, IPv4s, phones.

    Scale shape: pure scan-stage narrow transforms (regexp_count /
    regexp_replace are whole-stage-codegen'd JVM expressions), then one
    low-cardinality groupBy — the only shuffle carries 5 small columns.
    """
    docs = load_table(spark, sf_dir, "documents")
    text_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 200 + 1).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 250 + 1).cast("string"),
        F.lit(".7 call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text_pii"), F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    counted = docs.select("lang", text_pii.alias("text_pii")).select(
        "lang",
        F.regexp_count(F.col("text_pii"), F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(F.col("text_pii"), F.lit(_PII_IPV4)).alias("n_ip"),
        F.regexp_count(F.col("text_pii"), F.lit(_PII_PHONE)).alias("n_phone"),
        F.length(redacted).alias("redacted_len"),
    )
    return counted.groupBy("lang").agg(
        F.sum("n_email").alias("emails"),
        F.sum("n_ip").alias("ips"),
        F.sum("n_phone").alias("phones"),
        F.sum("redacted_len").alias("redacted_chars"),
    )


# --------------------------------------------------------------------------
# D26 — token-budget data mixing (quality-ordered selection per source)
# --------------------------------------------------------------------------
@register(
    "d26_token_budget_mix",
    oracle="""
    WITH scored AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS quality
        FROM documents
    ), ranked AS (
        SELECT *,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM scored
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(MAX(cum_tokens) AS BIGINT) AS budget_used,
           ROUND(MIN(quality), 6) AS worst_quality_kept
    FROM ranked
    WHERE cum_tokens <= 2500
    GROUP BY source
    """,
)
def d26_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixing: per source, keep the highest-quality documents
    until a fixed token budget is exhausted.

    This is the standard "data mixture under a token budget" primitive:
    score -> per-source descending-quality order -> running token sum ->
    cut at the budget. One shuffle, partitioned by source (the window and
    the final groupBy share the `source` partitioning, so the agg is
    shuffle-free after the sort). Budget is a constant here; at 100 TB the
    same plan runs with per-source budgets joined in from a small dim.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "source",
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        ranked.filter(F.col("cum_tokens") <= 2500)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("cum_tokens").alias("budget_used"),
            F.round(F.min("quality"), 6).alias("worst_quality_kept"),
        )
    )


# --------------------------------------------------------------------------
# D31 — Bloom-filter join prefilter: the runtime-filter pattern for very
# large probe×build joins at 100 TB. Instead of shuffling the whole probe
# side into a semi-join, the build side's keys are folded into an m-bit
# Bloom filter (k deterministic md5-derived hash positions per key — the
# same engine-portable md5 discipline as d8/d24); the probe side tests its
# k positions against the broadcast bit set and only survivors reach the
# real join. The bit set is tiny (<= m rows) and broadcast; both the build
# fold and the probe test are map-side expressions plus one broadcast
# equi-join — no large shuffle. Guarantees emitted as verdict columns:
# a Bloom filter can have false positives but NEVER false negatives, so
# n_missed must be 0 and the fp rate must sit under the sized bound.
# Spark's own engine-internal runtime filters do this JVM-side
# (spark.sql.optimizer.runtime.bloomFilter.enabled); this query is the
# explicit, engine-portable formulation with the guarantee oracle-checked.
# --------------------------------------------------------------------------
@register(
    "d31_bloom_prefilter",
    oracle="""
    WITH params AS (SELECT 8192 AS m, 3 AS k),
         build AS (SELECT DISTINCT o_custkey AS key FROM orders
                   WHERE o_orderpriority = '1-URGENT'),
         build_pos AS (
             SELECT DISTINCT
                    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || '#'
                                             || CAST(j AS VARCHAR)), 1, 8))
                         AS BIGINT) % (SELECT m FROM params) AS pos
             FROM build, UNNEST([0, 1, 2]) AS t(j)
         ),
         probe AS (
             SELECT c_custkey,
                    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#'
                                             || CAST(j AS VARCHAR)), 1, 8))
                         AS BIGINT) % (SELECT m FROM params) AS pos
             FROM customer, UNNEST([0, 1, 2]) AS t(j)
         ),
         pass AS (
             SELECT c_custkey
             FROM probe JOIN build_pos USING (pos)
             GROUP BY c_custkey
             HAVING COUNT(DISTINCT pos) = (SELECT k FROM params)
         ),
         exact AS (
             SELECT DISTINCT c_custkey FROM customer
             JOIN build ON key = c_custkey
         )
    SELECT (SELECT COUNT(*) FROM customer)                    AS n_probe,
           (SELECT COUNT(*) FROM exact)                       AS n_exact,
           (SELECT COUNT(*) FROM pass)                        AS n_bloom_pass,
           (SELECT COUNT(*) FROM exact
            WHERE c_custkey NOT IN (SELECT c_custkey FROM pass)) AS n_missed,
           (SELECT COUNT(*) FROM exact
            WHERE c_custkey NOT IN (SELECT c_custkey FROM pass)) = 0
                                                              AS no_false_negatives,
           ((SELECT COUNT(*) FROM pass) - (SELECT COUNT(*) FROM exact)) * 1.0
               / (SELECT COUNT(*) FROM customer) < 0.05       AS fp_rate_ok
    """,
)
def d31_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    m, k = 8192, 3
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def positions(key_col):
        """k md5-derived bit positions for one key (portable across engines)."""
        return F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("#", key_col.cast("string"), F.lit(str(j)))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % m
                )
                for j in range(k)
            ]
        )

    build = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("key")
    ).distinct()
    # The Bloom bit set: <= m distinct positions — tiny, broadcast to probes.
    bloom_bits = (
        build.select(F.explode(positions(F.col("key"))).alias("pos")).distinct()
    )
    probe = cust.select(
        "c_custkey", F.explode(positions(F.col("c_custkey"))).alias("pos")
    )
    passed = (
        probe.join(F.broadcast(bloom_bits), "pos")
        .groupBy("c_custkey")
        .agg(F.countDistinct("pos").alias("hits"))
        .filter(F.col("hits") == k)
        .select("c_custkey")
    )
    exact = cust.join(
        build, cust.c_custkey == build.key, "left_semi"
    ).select("c_custkey")
    # One DataFrame program: four 1-row aggregates crossJoined (each side is
    # a scalar — Spark broadcasts them), verdicts as column expressions. No
    # driver-side counts, so the executed plan carries the whole pipeline.
    n_probe = cust.agg(F.count(F.lit(1)).alias("n_probe"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_pass = passed.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    n_missed = (
        exact.join(passed, "c_custkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    return (
        n_probe.crossJoin(n_exact)
        .crossJoin(n_pass)
        .crossJoin(n_missed)
        .select(
            "n_probe",
            "n_exact",
            "n_bloom_pass",
            "n_missed",
            (F.col("n_missed") == 0).alias("no_false_negatives"),
            (
                (F.col("n_bloom_pass") - F.col("n_exact")) / F.col("n_probe")
                < 0.05
            ).alias("fp_rate_ok"),
        )
    )


# --------------------------------------------------------------------------
# D42 — ingestion anomaly detection: per-(event_type, day) volume z-scores
# against that type's own daily distribution. The data-QA gate a feed
# pipeline runs before training on a day's crawl: a |z| >= 1.5 day means a
# collector outage or a duplication storm. Two keyed aggs + a broadcast
# join of the tiny per-type stats table — no window, no driver state.
# --------------------------------------------------------------------------
@register(
    "d42_event_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), stats AS (
        SELECT event_type, AVG(cnt) AS mu, stddev_pop(cnt) AS sigma
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
           CAST(d.cnt AS BIGINT) AS cnt,
           ROUND((d.cnt - s.mu) / s.sigma, 3) AS z
    FROM daily d JOIN stats s USING (event_type)
    WHERE s.sigma > 0 AND ABS(ROUND((d.cnt - s.mu) / s.sigma, 3)) >= 1.5
    """,
)
def d42_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"), F.stddev_pop("cnt").alias("sigma")
    )
    z = F.round((F.col("cnt") - F.col("mu")) / F.col("sigma"), 3)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(z) >= 1.5))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cnt",
            z.alias("z"),
        )
    )


# --------------------------------------------------------------------------
# D43 — k-anonymity suppression audit over quasi-identifiers. The release
# gate for sharing derived tables: any (nation, segment, balance-band)
# cell with < k members is suppressed. One keyed agg + one re-agg on the
# released/suppressed status — the standard generalize-then-suppress
# lowering, all map-side combinable.
# --------------------------------------------------------------------------
@register(
    "d43_k_anonymity",
    oracle="""
    WITH cells AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS band,
               COUNT(*) AS cnt
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT CASE WHEN cnt >= 5 THEN 'released' ELSE 'suppressed' END AS status,
           CAST(COUNT(*) AS BIGINT)  AS n_cells,
           CAST(SUM(cnt) AS BIGINT)  AS n_rows
    FROM cells GROUP BY 1
    """,
)
def d43_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).alias("band"),
    ).agg(F.count("*").alias("cnt"))
    return (
        cells.withColumn(
            "status",
            F.when(F.col("cnt") >= 5, F.lit("released")).otherwise(
                F.lit("suppressed")
            ),
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_cells"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# D44 — corpus datacard: the one-pass per-source profile a dataset card
# reports (docs, tokens, dup rate, language spread, length quantiles).
# Single groupBy with mixed aggregates — count-distinct expands to the
# two-phase plan, exact median is percentile() (per-group sort of a
# bounded group, the only exact way); everything map-side combinable
# except the distinct expansions.
# --------------------------------------------------------------------------
@register(
    "d44_corpus_datacard",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                          AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_chars), 2)                            AS avg_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT)              AS n_langs,
           ROUND(1 - COUNT(DISTINCT text) * 1.0 / COUNT(*), 4) AS dup_rate,
           ROUND(quantile_cont(n_chars, 0.5), 1)             AS p50_chars
    FROM documents
    GROUP BY source
    """,
)
def d44_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.round(
            1 - F.countDistinct("text") / F.count("*"), 4
        ).alias("dup_rate"),
        F.round(F.expr("percentile(n_chars, 0.5D)"), 1).alias("p50_chars"),
    )


# --------------------------------------------------------------------------
# D46 — robust length-outlier gate: median/MAD per source (robust to the
# heavy tails that make mean/stddev gates useless on web text). Exact
# medians via percentile() over bounded per-source groups; the per-source
# (med, mad) table is tiny and broadcast back. Flag = |len - med| > 3·MAD.
# --------------------------------------------------------------------------
@register(
    "d46_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med
        FROM documents GROUP BY source
    ), dev AS (
        SELECT d.source, d.n_chars, m.med,
               ABS(d.n_chars - m.med) AS adev
        FROM documents d JOIN med m USING (source)
    ), mad AS (
        SELECT source, quantile_cont(adev, 0.5) AS mad FROM dev
        GROUP BY source
    )
    SELECT dev.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_outliers,
           ROUND(MAX(dev.med), 1)  AS med_chars,
           ROUND(MAX(mad.mad), 1)  AS mad_chars
    FROM dev JOIN mad USING (source)
    GROUP BY dev.source
    """,
)
def d46_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5D)").alias("med")
    )
    dev = docs.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("int"))
            .cast("bigint")
            .alias("n_outliers"),
            F.round(F.max("med"), 1).alias("med_chars"),
            F.round(F.max("mad"), 1).alias("mad_chars"),
        )
    )


# --------------------------------------------------------------------------
# D47 — content-defined chunking (CDC) dedup: the rsync/casync primitive
# for deduplicating binary/media payloads where document-level hashing
# misses shared sub-regions. A chunk boundary is a CONTENT condition
# (byte % 16 == 7, expected chunk ~16 bytes), so an insertion early in a
# payload re-aligns within one chunk instead of shifting every subsequent
# fixed-size block. Chunking is pure scan-stage JVM array expressions
# (split-to-chars -> ascii -> boundary filter -> substr slices); dedup is
# a count-distinct on the chunk text — the shuffle carries chunks, and at
# 100 TB you'd hash them first (sha2) so it carries 32-byte digests.
# --------------------------------------------------------------------------
@register(
    "d47_cdc_chunk_dedup",
    oracle="""
    WITH b AS (
        SELECT doc_id, source, text, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents
    ), bytes AS (
        SELECT doc_id, source, text, nb,
               list_transform(
                   range(1, nb + 1),
                   i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
                        * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)
               ) AS vals
        FROM b
    ), bounds AS (
        SELECT doc_id, source, text, nb,
               list_filter(range(1, nb + 1), i -> vals[i] % 16 = 7) AS bs
        FROM bytes
    ), ended AS (
        SELECT doc_id, source, text,
               CASE WHEN len(bs) = 0 OR bs[-1] != nb
                    THEN list_append(bs, nb) ELSE bs END AS ends
        FROM bounds
    ), chunked AS (
        SELECT doc_id, source,
               substr(text,
                      CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END,
                      en - (CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END)
                         + 1) AS chunk
        FROM (
            SELECT doc_id, source, text, ends,
                   unnest(ends) AS en,
                   generate_subscripts(ends, 1) AS j
            FROM ended
        )
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)              AS n_chunks,
           CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_distinct_chunks,
           ROUND(AVG(length(chunk)), 4)          AS avg_chunk_len,
           ROUND(1 - COUNT(DISTINCT chunk) * 1.0 / COUNT(*), 4)
                                                 AS chunk_dup_rate
    FROM chunked
    GROUP BY source
    """,
)
def d47_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Boundary positions in ONE pass with the (value, index) transform —
    # never element_at(expr, i) over an unmaterialized array, which
    # re-evaluates the producing expression per access (the O(n²) pitfall
    # _word_shingles documents).
    vals = F.transform(F.split("text", ""), lambda c: F.ascii(c))
    bs = F.array_compact(
        F.transform(vals, lambda v, i: F.when(v % 16 == 7, i + 1))
    )
    n = F.length("text")
    with_bs = docs.select(
        "doc_id", "source", "text", n.alias("n"), bs.alias("bs")
    )
    ends = F.when(
        (F.size("bs") == 0) | (F.element_at("bs", -1) != F.col("n")),
        F.concat("bs", F.array("n")),
    ).otherwise(F.col("bs"))
    with_ends = with_bs.select("doc_id", "source", "text", ends.alias("ends"))
    st = lambda j: F.when(  # noqa: E731
        j == 1, F.lit(1)
    ).otherwise(F.element_at(F.col("ends"), (j - 1).cast("int")) + 1)
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("ends")),
        lambda j: F.col("text").substr(
            st(j), F.element_at(F.col("ends"), j.cast("int")) - st(j) + 1
        ),
    )
    return (
        with_ends.select("source", F.explode(chunks).alias("chunk"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("chunk").cast("bigint").alias("n_distinct_chunks"),
            F.round(F.avg(F.length("chunk")), 4).alias("avg_chunk_len"),
            F.round(
                1 - F.countDistinct("chunk") / F.count("*"), 4
            ).alias("chunk_dup_rate"),
        )
    )


# --------------------------------------------------------------------------
# D48 — Efraimidis–Spirakis weighted reservoir sampling (exact-k weighted
# sample without replacement): rank by key = u^(1/w) DESC where u is the
# md5-uniform of the stable doc key — fully deterministic, so the oracle
# reproduces the EXACT sampled set (the d24 discipline upgraded from
# Bernoulli rates to exact-k A-Res). Per-lang top-10 via one partitioned
# window (WindowGroupLimit stops each partition at k); no RNG state, no
# driver participation, membership invariant to partitioning.
# --------------------------------------------------------------------------
@register(
    "d48_weighted_reservoir",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS w,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967296.0 AS u
        FROM documents
    ), keyed AS (
        SELECT doc_id, lang, w, pow(u, 1.0 / w) AS k,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY pow(u, 1.0 / w) DESC, doc_id
               ) AS rn
        FROM scored
    )
    SELECT lang, doc_id, ROUND(k, 6) AS es_key, ROUND(w, 6) AS weight
    FROM keyed WHERE rn <= 10
    """,
)
def d48_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    w_expr = F.size(F.array_distinct(toks)) / F.size(toks)
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        "lang",
        w_expr.alias("w"),
        F.pow(u, 1.0 / w_expr).alias("k"),
    )
    win = Window.partitionBy("lang").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 10)
        .select(
            "lang",
            "doc_id",
            F.round("k", 6).alias("es_key"),
            F.round("w", 6).alias("weight"),
        )
    )


# --------------------------------------------------------------------------
# D50 — deletion propagation (GDPR/right-to-be-forgotten) audit: given a
# deletion set of users, purge their events and PROVE the purge — the
# governance primitive a serving pipeline runs before republishing. The
# purge is one broadcast anti-join (deletion sets are small relative to
# the corpus); the leak check is a semi-join count pinned to zero. At
# 100 TB the same plan holds: the deletion set broadcasts, the fact table
# streams through one scan.
# --------------------------------------------------------------------------
@register(
    "d50_deletion_propagation",
    oracle="""
    WITH del AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    )
    SELECT CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS n_users_deleted,
           CAST(SUM(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT)                            AS n_events_purged,
           CAST(SUM(CASE WHEN d.user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)                            AS n_events_kept,
           TRUE                                       AS no_leak
    FROM events e LEFT JOIN del d USING (user_id)
    """,
)
def d50_deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    del_set = (
        ev.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    )
    purged = ev.join(F.broadcast(del_set), "user_id", "left_anti")
    # Leak check: a semi-join of the purged table against the deletion set
    # must be EMPTY — computed distributed, surfaced as a boolean.
    leak_count = purged.join(
        F.broadcast(del_set), "user_id", "left_semi"
    ).count()
    n_del = del_set.count()
    n_kept = purged.count()
    n_total = ev.count()
    return spark.createDataFrame(
        [(n_del, n_total - n_kept, n_kept, leak_count == 0)],
        "n_users_deleted bigint, n_events_purged bigint, "
        "n_events_kept bigint, no_leak boolean",
    )


def canonical_url(url):
    """Canonical form of a crawl URL, as a Column expression (d101/d104).

    lowercase host; strip trailing slashes and the fragment; drop
    utm_*/fbclid/gclid/ref_src tracking params and empty params; SORT
    the surviving query params (order is insertion noise, not
    identity). Query-less URLs canonicalize to ``host/path?`` — the
    same form as a bare ``?`` or an all-tracking query, which IS the
    same resource. Idempotent up to the scheme (parse_url needs one, so
    re-canonicalizing means re-prefixing ``https://``), and invariant
    to host casing / trailing slash / param order / tracking noise —
    all pinned by tests/test_properties.py.
    """
    c_host = F.lower(F.parse_url(url, F.lit("HOST")))
    c_path = F.regexp_replace(F.parse_url(url, F.lit("PATH")), "/+$", "")
    # parse_url returns NULL for a missing query; concat null-propagates,
    # so a query-less URL would otherwise canonicalize to NULL and every
    # such URL would collapse into ONE NULL dedup group.
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike("^(utm_[a-z]+|fbclid|gclid|ref_src)="),
        )
    )
    return F.concat(c_host, c_path, F.lit("?"), F.array_join(kept, "&"))


# --------------------------------------------------------------------------
# D101 — URL canonicalization + URL-level dedup: the cheapest dedup pass a
# web corpus gets (CCNet / web-crawl curation run it BEFORE any content
# hashing — two crawls of the same page differ only in tracking params
# and host casing, and URL dedup removes them without touching the body).
# Documents carry no URL column, so a crawl URL is derived
# deterministically per doc on BOTH sides — mixed-case hosts, trailing
# slashes, shuffled query-param order, utm_*/fbclid/gclid tracking
# params, and a fragment — and the Spark side must recover the canonical
# form through the real URL machinery: `parse_url` for host/path/query,
# lowercase host, strip trailing slashes, drop tracking params, SORT the
# survivors (param order is insertion noise, not identity). The oracle
# derives the canonical string closed-form; agreement proves every
# canonicalization step (a missed fragment, an unsorted param list, a
# kept utm_* all split groups and break the counts).
# Scale: one map stage to canonicalize + one groupBy on the canonical
# string — the shuffle payload is the canonical URL, never the body;
# at 100 TB this is the first funnel stage and runs at scan speed.
# --------------------------------------------------------------------------
@register(
    "d101_url_dedup",
    oracle="""
    WITH canon AS (
        SELECT doc_id, source,
               'www.example.com/articles/' || (doc_id % 40)
                   || '?id=' || (doc_id % 40) || '&lang=' || lang
                   AS canonical_url
        FROM documents
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT)               AS n_dups,
           CAST(MIN(doc_id) AS BIGINT)            AS first_doc_id,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM canon
    GROUP BY canonical_url
    """,
)
def d101_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    slot = F.col("doc_id") % 40
    # The crawl URL, with every nuisance a real log carries: host casing
    # flips by row, a trailing slash appears on every third path, the two
    # identity params swap order by row parity, tracking params and a
    # fragment ride along.
    host = F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.Example.COM")).otherwise(
        F.lit("www.example.com")
    )
    path = F.concat(
        F.lit("/articles/"),
        slot.cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    p_id = F.concat(F.lit("id="), slot.cast("string"))
    p_lang = F.concat(F.lit("lang="), F.col("lang"))
    p_utm = F.concat(F.lit("utm_source=feed"), (F.col("doc_id") % 5).cast("string"))
    ordered = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat_ws("&", p_id, p_utm, p_lang),
    ).otherwise(F.concat_ws("&", p_utm, p_lang, p_id))
    query = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(ordered, F.lit("&fbclid=x"), F.col("doc_id").cast("string")),
    ).otherwise(ordered)
    url = F.concat(
        F.lit("https://"), host, path, F.lit("?"), query,
        F.lit("#sec"), (F.col("doc_id") % 7).cast("string"),
    )
    # The canonicalizer under test: real URL parsing, not string surgery
    # on the builder above (the oracle's closed form is the referee).
    return (
        docs.select(
            "doc_id", "source", canonical_url(url).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").alias("first_doc_id"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# --------------------------------------------------------------------------
# D104 — GROUP-AWARE split (leakage-proof holdout): d8 hashes the DOC id,
# which puts two near-identical crawls of the same page on opposite sides
# of the train/test wall — the benchmark-inflation leak d27 measures
# after the fact. The fix is structural: hash the dedup GROUP key (here
# d101's canonical URL), so every member of a dup group lands in the
# same split BY CONSTRUCTION. The row assigns splits from the group
# hash, reports per-split volumes, and pins the no-straddle invariant
# distributed: the count of canonical groups seen in more than one
# split must be ZERO (computed, not assumed — a doc-keyed hash makes it
# nonzero on this corpus).
# Scale: one map for the key, one groupBy for the audit — the wall is
# as cheap as the leak is expensive; the d8 shape with a better key.
# --------------------------------------------------------------------------
@register(
    "d104_group_aware_split",
    oracle="""
    WITH canon AS (
        SELECT doc_id, n_chars,
               'www.example.com/articles/' || (doc_id % 40)
                   || '?id=' || (doc_id % 40) || '&lang=' || lang
                   AS grp
        FROM documents
    ), assigned AS (
        SELECT grp, n_chars,
               CASE
                 WHEN substr(md5(grp), 1, 1) < 'c' THEN 'train'
                 WHEN substr(md5(grp), 1, 1) < 'e' THEN 'val'
                 ELSE 'test'
               END AS split
        FROM canon
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT)            AS n_docs,
           CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
           CAST(SUM(n_chars) AS BIGINT)        AS total_chars,
           CAST(0 AS BIGINT)                   AS n_straddling_groups
    FROM assigned
    GROUP BY split
    """,
)
def d104_group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    slot = (F.col("doc_id") % 40).cast("string")
    grp = F.concat(
        F.lit("www.example.com/articles/"), slot,
        F.lit("?id="), slot, F.lit("&lang="), F.col("lang"),
    )
    nib = F.substring(F.md5(grp), 1, 1)
    split = (
        F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test")
    )
    assigned = docs.select(
        grp.alias("grp"), "n_chars", split.alias("split")
    )
    # One scan: both the audit and the report re-aggregate the SAME tiny
    # (grp, split) intermediate (<= #groups x 3 rows — caching it costs
    # nothing and avoids a second full documents scan + md5 build).
    grouped = (
        assigned.groupBy("grp", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .cache()
    )
    # The audit is computed, never assumed: groups spanning >1 split.
    straddle = (
        grouped.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    return grouped.groupBy("split").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("chars").cast("bigint").alias("total_chars"),
        F.lit(int(straddle)).cast("bigint").alias("n_straddling_groups"),
    )


# --------------------------------------------------------------------------
# D110 — DOMAIN-LEVEL corpus profile (the CCNet/RefinedWeb accounting
# stage after d101's URL dedup): roll crawl URLs up to the REGISTERED
# domain (last two host labels — the public-suffix list collapses to
# ".com"/".org" on this feed and says so; swap in a real PSL offline
# table at production) and report, per domain, the doc count, distinct
# subdomain count, distinct canonical pages (d101's canonicalizer —
# tracking noise must not split pages), URL-level dup rate, and the top
# subdomain (count desc, host asc tie-break). Per-domain dup rates are
# how crawl curation finds mirror-heavy domains to throttle.
# The feed derives hosts closed-form ({www,cdn,img} subdomain x source x
# {com,org} TLD + utm noise on every 4th URL); the Spark side must
# recover domains through real parse_url + label slicing, the oracle
# replays the derivation closed-form (the d101 referee pattern).
# Scale: host/domain extraction is a narrow map; the rollup shuffles
# (domain, host, canonical) triples — never bodies; distinct-counts are
# partial-aggregated; the top-subdomain pick is one bounded window over
# |domains x subdomains| rows (<= 3 per domain here, bounded by the
# subdomain fan-out in general).
# --------------------------------------------------------------------------
@register(
    "d110_domain_profile",
    oracle="""
    WITH feed AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'www' WHEN 1 THEN 'cdn'
                               ELSE 'img' END AS sub,
               source || CASE WHEN doc_id % 2 = 0
                              THEN '.com' ELSE '.org' END AS regdomain,
               doc_id % 25 AS page
        FROM documents
    ), urls AS (
        SELECT regdomain,
               sub || '.' || regdomain AS host,
               regdomain || '/p/' || page || '?' AS canonical
        FROM feed
    ), tops AS (
        SELECT regdomain, host,
               row_number() OVER (
                   PARTITION BY regdomain
                   ORDER BY COUNT(*) DESC, host
               ) AS rn,
               CAST(COUNT(*) AS BIGINT) AS n_host
        FROM urls GROUP BY regdomain, host
    ), prof AS (
        SELECT regdomain,
               CAST(COUNT(*) AS BIGINT)               AS n_docs,
               CAST(COUNT(DISTINCT host) AS BIGINT)   AS n_subdomains,
               CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_pages,
               ROUND(1.0 - COUNT(DISTINCT canonical) * 1.0 / COUNT(*), 4)
                                                      AS dup_rate
        FROM urls GROUP BY regdomain
    )
    SELECT p.regdomain, p.n_docs, p.n_subdomains, p.n_pages, p.dup_rate,
           t.host AS top_subdomain, t.n_host AS top_subdomain_docs
    FROM prof p JOIN tops t ON t.regdomain = p.regdomain AND t.rn = 1
    """,
)
def d110_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sub = (
        F.when(F.col("doc_id") % 3 == 0, "www")
        .when(F.col("doc_id") % 3 == 1, "cdn")
        .otherwise("img")
    )
    tld = F.when(F.col("doc_id") % 2 == 0, ".com").otherwise(".org")
    host = F.concat(sub, F.lit("."), F.col("source"), tld)
    url = F.concat(
        F.lit("https://"), host, F.lit("/p/"),
        (F.col("doc_id") % 25).cast("string"),
        # Tracking noise on every 4th URL: the canonical page count must
        # see through it (d101's canonicalizer is the machinery under
        # test here too).
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("?utm_source=s"),
                     (F.col("doc_id") % 5).cast("string")),
        ).otherwise(F.lit("")),
    )
    # Real machinery side: parse the host back OUT of the URL, take the
    # registered domain as the last two dot-labels, canonicalize the page.
    parsed_host = F.parse_url(F.col("url"), F.lit("HOST"))
    labels = F.split(parsed_host, "\\.")
    regdomain = F.concat_ws(
        ".", F.slice(labels, F.size(labels) - 1, 2)
    )
    urls = docs.select(url.alias("url")).select(
        "url",
        parsed_host.alias("host"),
        regdomain.alias("regdomain"),
        canonical_url(F.col("url")).alias("host_canonical"),
    )
    # Page identity is MIRROR-COLLAPSED: the same path on www/cdn/img is
    # one page (that IS the domain-level dup story), so the d101
    # canonical is rebased from the full host onto the registered
    # domain before the distinct-page count.
    urls = urls.withColumn(
        "canonical",
        F.concat(
            F.col("regdomain"),
            F.expr("substring(host_canonical, length(host) + 1)"),
        ),
    )
    prof = urls.groupBy("regdomain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("host").cast("bigint").alias("n_subdomains"),
        F.countDistinct("canonical").cast("bigint").alias("n_pages"),
        F.round(
            1.0 - F.countDistinct("canonical") / F.count(F.lit(1)), 4
        ).alias("dup_rate"),
    )
    per_host = urls.groupBy("regdomain", "host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_host")
    )
    w = Window.partitionBy("regdomain").orderBy(
        F.desc("n_host"), F.asc("host")
    )
    tops = (
        per_host.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "regdomain",
            F.col("host").alias("top_subdomain"),
            F.col("n_host").alias("top_subdomain_docs"),
        )
    )
    return prof.join(tops, "regdomain")
