"""Scalar function families (SURVEY.md §2h rows F1 string, F2 date/time,
F3 math, F5 JSON). F4/F6 (array/vector) live in plans/vectors.py.

Cross-engine quirks handled in the oracle SQL, never in Spark:
* DuckDB ``log`` is log10 — use ``ln`` to mirror Spark's ``F.log``.
* DuckDB ``regexp_replace`` replaces the first match unless the 'g' flag is
  given; Spark replaces all.
* DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday — oracle adds 1.
* DuckDB ``ceil``/``floor`` on DOUBLE return DOUBLE, Spark returns BIGINT —
  oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# F1 — string functions
# --------------------------------------------------------------------------
@register(
    "f1_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                                    AS name_lc,
           upper(c_mktsegment)                              AS seg_uc,
           substring(c_name, 1, 8)                          AS name_prefix,
           CAST(length(c_name) AS INTEGER)                  AS name_len,
           concat_ws('|', c_mktsegment, c_name)             AS tagged,
           regexp_replace(c_name, '0', '', 'g')             AS no_zeros,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS seg_dist,
           CAST(len(string_split(c_name, '#')) AS INTEGER)  AS n_parts
    FROM customer
    WHERE c_custkey < 500
    """,
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") < 500).select(
        "c_custkey",
        F.lower("c_name").alias("name_lc"),
        F.upper("c_mktsegment").alias("seg_uc"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.regexp_replace("c_name", "0", "").alias("no_zeros"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_dist"),
        F.size(F.split("c_name", "#")).alias("n_parts"),
    )


# --------------------------------------------------------------------------
# F2 — date/time functions
# --------------------------------------------------------------------------
@register(
    "f2_datetime_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)                         AS yr,
           CAST(quarter(o_orderdate) AS INTEGER)                      AS qtr,
           CAST(month(o_orderdate) AS INTEGER)                        AS mth,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)                AS dow,
           date_trunc('month', o_orderdate)                           AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)          AS due_date,
           COUNT(*)                                                   AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY ALL
    """,
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return (
        orders.filter(od >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(
            F.year(od).alias("yr"),
            F.quarter(od).alias("qtr"),
            F.month(od).alias("mth"),
            F.dayofweek(od).alias("dow"),
            F.date_trunc("month", od).alias("month_start"),
            F.datediff(od, F.lit("1995-01-01")).alias("days_since"),
            F.date_add(od, 30).cast("timestamp").alias("due_date"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# F3 — math functions
# --------------------------------------------------------------------------
@register(
    "f3_math_funcs",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice, 1)                          AS price_r1,
           abs(p_size - 25)                                 AS size_dev,
           CAST(ceil(p_retailprice) AS BIGINT)              AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT)             AS price_floor,
           ROUND(ln(p_retailprice), 4)                      AS price_ln,
           ROUND(exp(p_size / 100.0), 4)                    AS size_exp,
           ROUND(pow(p_size, 2), 1)                         AS size_sq,
           ROUND(sqrt(p_retailprice), 4)                    AS price_sqrt
    FROM part
    WHERE p_partkey < 1000
    """,
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") < 1000).select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.log("p_retailprice"), 4).alias("price_ln"),
        F.round(F.exp(F.col("p_size") / 100.0), 4).alias("size_exp"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
    )


# --------------------------------------------------------------------------
# F5 — JSON extraction (events.props is a JSON string like {"k": 87})
# --------------------------------------------------------------------------
@register(
    "f5_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*)                                         AS n,
           ROUND(AVG(CAST(props->>'$.k' AS INT)), 4)        AS avg_k,
           MAX(CAST(props->>'$.k' AS INT))                  AS max_k,
           MIN(CAST(props->>'$.k' AS INT))                  AS min_k
    FROM events
    GROUP BY event_type
    """,
)
def f5_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.min(k).alias("min_k"),
    )


# --------------------------------------------------------------------------
# F7 — map construction / concat / explode. The metrics map is built from
# aggregate columns (create_map + map_concat, all JVM expressions) and
# exploded back to long form; the oracle reconstructs the same long rows
# with a UNION ALL. Map columns never shuffle here — the explode is
# map-side over the 5-row aggregate.
# --------------------------------------------------------------------------
@register(
    "f7_map_funcs",
    oracle="""
    SELECT event_type, metric, val
    FROM (
        SELECT event_type, 'cnt' AS metric, CAST(COUNT(*) AS DOUBLE) AS val
        FROM events GROUP BY event_type
        UNION ALL
        SELECT event_type, 'sum_val', ROUND(SUM(value), 2)
        FROM events GROUP BY event_type
        UNION ALL
        SELECT event_type, 'avg_val', ROUND(AVG(value), 4)
        FROM events GROUP BY event_type
    ) long
    """,
)
def f7_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_val"),
        F.round(F.avg("value"), 4).alias("avg_val"),
    )
    with_map = agg.select(
        "event_type",
        F.map_concat(
            F.create_map(F.lit("cnt"), F.col("cnt")),
            F.create_map(
                F.lit("sum_val"), F.col("sum_val"),
                F.lit("avg_val"), F.col("avg_val"),
            ),
        ).alias("metrics"),
    )
    return with_map.select(
        "event_type", F.explode("metrics").alias("metric", "val")
    )


# --------------------------------------------------------------------------
# F7b — MAP higher-order functions (the map twin of F4's array HOF row):
# transform_keys / transform_values / map_filter / map_zip_with over the
# per-event-type metric maps. Each lambda is a pure per-entry JVM
# expression, so every stage stays inside whole-stage codegen; the single
# shuffle is the upstream event_type aggregate. The output is exploded to
# long form (stage, metric, val) so the oracle can replay each lambda as
# plain per-key SQL — no engine-specific map algebra in the comparison.
# --------------------------------------------------------------------------
@register(
    "f7b_map_hofs",
    oracle="""
    WITH agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE)  AS cnt,
               ROUND(SUM(value), 2)      AS sum_val,
               ROUND(AVG(value), 4)      AS avg_val
        FROM events GROUP BY event_type
    ), long AS (
        -- transform_keys: prefix every key with 'm_'
        SELECT event_type, 'keys' AS stage, 'm_cnt' AS metric, cnt AS val
        FROM agg
        UNION ALL
        SELECT event_type, 'keys', 'm_sum_val', sum_val FROM agg
        UNION ALL
        -- map_filter over transform_values(x10, 2dp): keep val > 100
        SELECT event_type, 'filter', metric, val
        FROM (
            SELECT event_type, 'cnt' AS metric, ROUND(cnt * 10, 2) AS val
            FROM agg
            UNION ALL
            SELECT event_type, 'sum_val', ROUND(sum_val * 10, 2) FROM agg
            UNION ALL
            SELECT event_type, 'avg_val', ROUND(avg_val * 10, 2) FROM agg
        ) scaled
        WHERE val > 100
        UNION ALL
        -- map_zip_with of the metric map and a constant weight map
        SELECT event_type, 'zip', 'cnt', ROUND(cnt * 1.0, 4) FROM agg
        UNION ALL
        SELECT event_type, 'zip', 'sum_val', ROUND(sum_val * 0.01, 4)
        FROM agg
    )
    SELECT event_type, stage, metric, val FROM long
    """,
)
def f7b_map_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_val"),
        F.round(F.avg("value"), 4).alias("avg_val"),
    )
    m_full = F.create_map(
        F.lit("cnt"), F.col("cnt"),
        F.lit("sum_val"), F.col("sum_val"),
        F.lit("avg_val"), F.col("avg_val"),
    )
    m_small = F.create_map(
        F.lit("cnt"), F.col("cnt"), F.lit("sum_val"), F.col("sum_val")
    )
    weights = F.create_map(
        F.lit("cnt"), F.lit(1.0), F.lit("sum_val"), F.lit(0.01)
    )
    keyed = F.transform_keys(m_small, lambda k, v: F.concat(F.lit("m_"), k))
    filtered = F.map_filter(
        F.transform_values(m_full, lambda k, v: F.round(v * 10, 2)),
        lambda k, v: v > 100,
    )
    zipped = F.map_zip_with(m_small, weights, lambda k, a, b: F.round(a * b, 4))

    def tagged(stage: str, m):
        return F.transform(
            F.map_entries(m),
            lambda e: F.struct(
                F.lit(stage).alias("stage"),
                e["key"].alias("metric"),
                e["value"].alias("val"),
            ),
        )

    # ONE explode over the concatenated entry structs: a union of three
    # explode branches would re-run the scan + aggregate per branch (the
    # physical plan showed 3x Scan/Exchange) — this keeps one scan and the
    # single event_type shuffle at any corpus size.
    rows = F.explode(
        F.concat(
            tagged("keys", keyed), tagged("filter", filtered), tagged("zip", zipped)
        )
    )
    return agg.select("event_type", rows.alias("r")).select(
        "event_type", "r.stage", "r.metric", "r.val"
    )


# --------------------------------------------------------------------------
# F8 — regex extraction / token-set functions over the documents corpus.
# regexp_extract_all / array_distinct / regexp_replace are all JVM
# expressions — the doc-level features compute inside the scan stage and
# only the per-source aggregate shuffles.
# --------------------------------------------------------------------------
@register(
    "f8_regex_token_funcs",
    oracle="""
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '[0-9]+')))
                AS BIGINT)                                         AS n_numbers,
           ROUND(AVG(len(list_distinct(string_split(lower(text), ' ')))), 4)
                                                                   AS avg_unique_tokens,
           CAST(SUM(length(regexp_replace(text, '[^a-z ]', '', 'g')))
                AS BIGINT)                                         AS clean_chars
    FROM documents
    GROUP BY source
    """,
)
def f8_regex_token_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).alias(
            "n_num"
        ),
        F.size(F.array_distinct(F.split(F.lower("text"), " "))).alias("n_uniq"),
        # Spark regexp_replace replaces all matches (DuckDB needs the 'g' flag).
        F.length(F.regexp_replace("text", "[^a-z ]", "")).alias("n_clean"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("n_num").alias("n_numbers"),
        F.round(F.avg("n_uniq"), 4).alias("avg_unique_tokens"),
        F.sum("n_clean").alias("clean_chars"),
    )


# --------------------------------------------------------------------------
# F9 — VARIANT semi-structured handling (Spark 4): parse_json once into a
# binary-encoded variant, then cheap typed path extraction — the modern
# replacement for repeated get_json_object string re-parsing when a column
# holds heterogeneous JSON. Extraction is JVM-side; the oracle reads the
# same paths with DuckDB's JSON extraction.
# --------------------------------------------------------------------------
@register(
    "f9_variant_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER))
                AS BIGINT)                                   AS sum_k,
           COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INTEGER))
                                                             AS n_distinct_k,
           MIN(CAST(json_extract(props, '$.k') AS INTEGER))  AS min_k
    FROM events
    GROUP BY event_type
    """,
)
def f9_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.min("k").alias("min_k"),
        )
    )


# --------------------------------------------------------------------------
# F2b — calendar function extras: last_day / dayofyear / weekofyear /
# quarter / make_date, all scan-stage expressions. weekofyear is ISO-8601
# in both engines; results cast to Spark's INT width.
# --------------------------------------------------------------------------
@register(
    "f2_date_extras",
    oracle="""
    SELECT CAST(quarter(o_orderdate) AS INTEGER)            AS q,
           COUNT(*)                                         AS n_orders,
           CAST(MIN(dayofyear(o_orderdate)) AS INTEGER)     AS first_doy,
           CAST(MAX(weekofyear(o_orderdate)) AS INTEGER)    AS last_week,
           CAST(MAX(last_day(CAST(o_orderdate AS DATE))) AS TIMESTAMP)
                                                            AS latest_month_end,
           CAST(MIN(make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1))
                AS TIMESTAMP)                               AS earliest_year_start
    FROM orders
    GROUP BY q
    """,
)
def f2_date_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.quarter("o_orderdate").alias("q"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.dayofyear("o_orderdate")).alias("first_doy"),
            F.max(F.weekofyear("o_orderdate")).alias("last_week"),
            F.max(F.last_day("o_orderdate")).cast("timestamp").alias(
                "latest_month_end"
            ),
            F.min(F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)))
            .cast("timestamp")
            .alias("earliest_year_start"),
        )
    )


# --------------------------------------------------------------------------
# F1b — string function extras: pad / translate / repeat / reverse (initcap
# is Spark-only — DuckDB has no twin, so it stays out of the oracle row).
# --------------------------------------------------------------------------
@register(
    "f1_string_extras",
    oracle="""
    SELECT c_mktsegment,
           MIN(lpad(CAST(c_custkey AS VARCHAR), 10, '0'))  AS min_padded_key,
           MAX(rpad(c_mktsegment, 12, '.'))                AS padded_seg,
           MIN(translate(c_name, '#', '-'))                AS translated,
           MAX(repeat(substr(c_mktsegment, 1, 2), 3))      AS repeated,
           MIN(reverse(c_mktsegment))                      AS reversed
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def f1_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.min(F.lpad(F.col("c_custkey").cast("string"), 10, "0")).alias(
            "min_padded_key"
        ),
        F.max(F.rpad("c_mktsegment", 12, ".")).alias("padded_seg"),
        F.min(F.translate("c_name", "#", "-")).alias("translated"),
        F.max(F.repeat(F.substring("c_mktsegment", 1, 2), 3)).alias("repeated"),
        F.min(F.reverse("c_mktsegment")).alias("reversed"),
    )


# --------------------------------------------------------------------------
# F4b — array predicate / structural HOFs: exists, forall, flatten,
# array_position — the remaining higher-order surface beyond
# transform/filter/aggregate/zip_with (plans/vectors.py f4_array_hofs).
# DuckDB twins are list_filter-based (no native exists/forall).
# --------------------------------------------------------------------------
@register(
    "f4_array_predicates",
    oracle="""
    SELECT label,
           CAST(SUM(CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                              v -> v > 0.3)) > 0
                         THEN 1 ELSE 0 END) AS BIGINT)        AS n_has_large,
           CAST(SUM(CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                              v -> NOT (v >= -0.5))) = 0
                         THEN 1 ELSE 0 END) AS BIGINT)        AS n_all_bounded,
           CAST(MAX(list_position(CAST(embedding AS DOUBLE[]),
                                  list_max(CAST(embedding AS DOUBLE[]))))
                AS INTEGER)                                   AS max_argmax_pos,
           CAST(SUM(len(flatten([CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[])])))
                AS BIGINT)                                    AS flat_len
    FROM embeddings
    GROUP BY label
    """,
)
def f4_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform("embedding", lambda v: v.cast("double"))
    return (
        emb.select(
            "label",
            F.exists(arr, lambda v: v > 0.3).alias("has_large"),
            F.forall(arr, lambda v: v >= -0.5).alias("all_bounded"),
            F.array_position(arr, F.array_max(arr)).cast("int").alias("argmax_pos"),
            F.size(F.flatten(F.array(arr, arr))).alias("flat_len"),
        )
        .groupBy("label")
        .agg(
            F.sum(F.when(F.col("has_large"), 1).otherwise(0)).alias("n_has_large"),
            F.sum(F.when(F.col("all_bounded"), 1).otherwise(0)).alias(
                "n_all_bounded"
            ),
            F.max("argmax_pos").alias("max_argmax_pos"),
            F.sum("flat_len").alias("flat_len"),
        )
    )


# --------------------------------------------------------------------------
# F10 — bitwise scalar + aggregate functions
# --------------------------------------------------------------------------
@register(
    "f10_bitwise_funcs",
    oracle="""
    SELECT o_orderpriority,
           CAST(bit_and(o_custkey) AS BIGINT) AS key_bit_and,
           CAST(bit_or(o_custkey) AS BIGINT) AS key_bit_or,
           CAST(bit_xor(o_custkey) AS BIGINT) AS key_bit_xor,
           CAST(SUM(bit_count(CAST(o_custkey AS BIGINT))) AS BIGINT)
               AS total_popcount,
           CAST(MAX(o_custkey & 255) AS BIGINT) AS max_low_byte,
           CAST(MAX((o_custkey << 2) | 3) AS BIGINT) AS max_shifted
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def f10_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar ops (&, |, <<, popcount) and the bit_and/or/xor
    aggregates — all JVM whole-stage-codegen expressions; the single
    shuffle is the low-cardinality groupBy with map-side partials."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_custkey")
    return orders.groupBy("o_orderpriority").agg(
        F.bit_and(key).alias("key_bit_and"),
        F.bit_or(key).alias("key_bit_or"),
        F.bit_xor(key).alias("key_bit_xor"),
        F.sum(F.bit_count(key.cast("long"))).alias("total_popcount"),
        F.max(key.bitwiseAND(F.lit(255))).alias("max_low_byte"),
        F.max(F.shiftleft(key, 2).bitwiseOR(F.lit(3))).alias("max_shifted"),
    )


# --------------------------------------------------------------------------
# F11 — cryptographic / hashing functions: content hashes (sha2/md5 — the
# dedup-fingerprint and cache-key primitives) plus an AES encrypt/decrypt
# round-trip (column-level encryption for PII columns at rest). Hash parity
# is oracle-checked byte-for-byte against DuckDB; the AES ciphertext is
# IV-randomized (GCM) so the verdict pins what IS deterministic: decrypting
# the ciphertext with the same key recovers the plaintext exactly. All
# JVM-side expressions — at 100 TB these run inside the scan stage.
# --------------------------------------------------------------------------
@register(
    "f11_crypto_funcs",
    oracle="""
    SELECT doc_id,
           sha256(text)  AS sha256_hex,
           md5(text)     AS md5_hex,
           TRUE          AS aes_roundtrip_ok
    FROM documents
    WHERE doc_id < 20
    """,
)
def f11_crypto_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    return docs.select(
        "doc_id",
        F.sha2("text", 256).alias("sha256_hex"),
        F.md5("text").alias("md5_hex"),
        (
            F.expr(
                "cast(aes_decrypt(aes_encrypt(text, '0123456789abcdef'),"
                " '0123456789abcdef') AS STRING)"
            )
            == F.col("text")
        ).alias("aes_roundtrip_ok"),
    )


# --------------------------------------------------------------------------
# F12 — Python UDTF (Spark 3.5+ user-defined TABLE function): one input row
# fans out to a variable number of output rows with their own schema — the
# API surface for Python tokenizers/parsers that genuinely need imperative
# logic. This one emits a document's word bigrams with positions via a
# LATERAL join; the DuckDB twin reproduces it with pure SQL, proving the
# Python path drops/duplicates nothing. Kept OFF the hot path by design:
# bigrams at corpus scale belong in JVM zip_with (d9) — a UDTF earns its
# place only when the per-row expansion logic can't be expressed as
# column functions.
# --------------------------------------------------------------------------
@register(
    "f12_udtf_bigrams",
    oracle="""
    SELECT doc_id, pos, bigram
    FROM (
        SELECT doc_id,
               CAST(i - 1 AS INT)            AS pos,
               arr[i] || ' ' || arr[i + 1]   AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS arr
              FROM documents WHERE doc_id < 30) d,
             UNNEST(generate_series(1, greatest(len(arr) - 1, 0))) AS t(i)
    ) b
    """,
)
def f12_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("f12_bigrams", Bigrams)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    docs.createOrReplaceTempView("f12_docs")
    return spark.sql(
        "SELECT doc_id, b.pos, b.bigram "
        "FROM f12_docs, LATERAL f12_bigrams(text) AS b"
    )


# --------------------------------------------------------------------------
# F13 — URL functions: parse_url host/path/query extraction plus
# url_encode/url_decode round-trip — the routing/grouping primitives for
# web-corpus pipelines (group by domain, strip tracking params). URLs are
# synthesized deterministically from (lang, doc_id) so the oracle can
# rebuild them; the DuckDB twin extracts the same components with regexps,
# proving Spark's parser agrees with the plain-string reading.
# --------------------------------------------------------------------------
@register(
    "f13_url_funcs",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || lang || '.example.com/docs/' || doc_id
                 || '?page=' || (doc_id % 7) || '&ref=r+d' AS url
        FROM documents WHERE doc_id < 25
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)', 1)        AS host,
           regexp_extract(url, 'https://[^/]+([^?]+)', 1)   AS path,
           regexp_extract(url, '\\?(.*)$', 1)               AS query,
           regexp_extract(url, 'page=([0-9]+)', 1)          AS page_param,
           'r+d'                                            AS ref_encoded,
           'r d'                                            AS ref_roundtrip
    FROM urls
    """,
)
def f13_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    url = F.concat(
        F.lit("https://"), F.col("lang"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?page="), F.col("doc_id") % 7,
        F.lit("&ref=r+d"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
        F.url_encode(F.lit("r d")).alias("ref_encoded"),
        F.url_decode(F.url_encode(F.lit("r d"))).alias("ref_roundtrip"),
    )


# --------------------------------------------------------------------------
# F14 — nested struct construction & access: the denormalized document
# shape (order header + array<struct> of its lines) that columnar formats
# store natively and pipelines pass between stages instead of re-joining.
# Spark side: struct() -> collect_list -> array_sort (lexicographic over
# ALL struct fields — this corpus has duplicate line numbers within an
# order, so the full-struct order is the deterministic one) -> element_at
# field access -> aggregate over the nested array. Oracle recomputes the
# same scalars with identically-ordered list aggs.
# All JVM expressions in one keyed agg; the nested array stays columnar
# (no shredding shuffle).
# --------------------------------------------------------------------------
@register(
    "f14_nested_structs",
    oracle="""
    SELECT l_orderkey,
           COUNT(*)                                          AS n_items,
           (list(l_partkey ORDER BY l_linenumber, l_partkey,
                 l_extendedprice))[1]                        AS first_part,
           (list(l_extendedprice ORDER BY l_linenumber, l_partkey,
                 l_extendedprice))[-1]                       AS last_price,
           ROUND(SUM(l_extendedprice), 2)                    AS total_price
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    GROUP BY l_orderkey
    """,
)
def f14_nested_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct("l_linenumber", "l_partkey", "l_extendedprice")
            )
        ).alias("items")
    )
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.element_at("items", 1)["l_partkey"].alias("first_part"),
        F.element_at("items", -1)["l_extendedprice"].alias("last_price"),
        F.round(
            F.aggregate(
                "items", F.lit(0.0), lambda acc, it: acc + it["l_extendedprice"]
            ),
            2,
        ).alias("total_price"),
    )


# --------------------------------------------------------------------------
# F15 — array SET operations: array_union / array_intersect / array_except
# over per-group collected sets (here: the part sets an order ships early
# vs late). The arrays are built with collect_set (one keyed agg), the set
# algebra is pure JVM expressions; the oracle recomputes the same set
# sizes relationally (DISTINCT + joins), proving the array-op semantics
# match their relational definitions — including the empty-side edges.
# --------------------------------------------------------------------------
@register(
    "f15_array_set_ops",
    oracle="""
    WITH tagged AS (
        SELECT DISTINCT l_orderkey, l_partkey,
               l_shipdate < TIMESTAMP '1997-01-01' AS early
        FROM lineitem WHERE l_orderkey % 50 = 0
    ), e AS (SELECT l_orderkey, l_partkey FROM tagged WHERE early),
       l AS (SELECT l_orderkey, l_partkey FROM tagged WHERE NOT early),
       keys AS (SELECT DISTINCT l_orderkey FROM tagged)
    SELECT k.l_orderkey,
           (SELECT COUNT(*) FROM (
               SELECT l_partkey FROM e WHERE e.l_orderkey = k.l_orderkey
               UNION
               SELECT l_partkey FROM l WHERE l.l_orderkey = k.l_orderkey) u)
                                                       AS n_union,
           (SELECT COUNT(*) FROM (
               SELECT l_partkey FROM e WHERE e.l_orderkey = k.l_orderkey
               INTERSECT
               SELECT l_partkey FROM l WHERE l.l_orderkey = k.l_orderkey) i)
                                                       AS n_intersect,
           (SELECT COUNT(*) FROM (
               SELECT l_partkey FROM e WHERE e.l_orderkey = k.l_orderkey
               EXCEPT
               SELECT l_partkey FROM l WHERE l.l_orderkey = k.l_orderkey) x)
                                                       AS n_early_only
    FROM keys k
    """,
)
def f15_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    early = F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set(F.when(early, F.col("l_partkey"))).alias("early_parts"),
        F.collect_set(F.when(~early, F.col("l_partkey"))).alias("late_parts"),
    )
    return sets.select(
        "l_orderkey",
        F.size(F.array_union("early_parts", "late_parts")).cast("long").alias(
            "n_union"
        ),
        F.size(F.array_intersect("early_parts", "late_parts"))
        .cast("long")
        .alias("n_intersect"),
        F.size(F.array_except("early_parts", "late_parts")).cast("long").alias(
            "n_early_only"
        ),
    )


# --------------------------------------------------------------------------
# F16 — string formatting/padding family: printf-style formatting plus the
# pad/repeat/translate/reverse group (report rendering + fixed-width key
# construction). All pure JVM expressions in the scan stage; the oracle
# uses DuckDB's printf (same %-syntax as Spark's format_string).
# --------------------------------------------------------------------------
@register(
    "f16_format_funcs",
    oracle="""
    SELECT c_custkey,
           printf('CUST-%06d', c_custkey)              AS padded_key,
           lpad(c_mktsegment, 12, '.')                 AS seg_lpad,
           rpad(c_mktsegment, 12, '.')                 AS seg_rpad,
           translate(c_mktsegment, 'AEIOU', 'aeiou')   AS seg_devowel,
           reverse(c_mktsegment)                       AS seg_rev,
           repeat('-', CAST(c_custkey % 5 + 1 AS INTEGER)) AS rule
    FROM customer
    WHERE c_custkey <= 40
    """,
)
def f16_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 40)
    return cust.select(
        "c_custkey",
        F.format_string("CUST-%06d", "c_custkey").alias("padded_key"),
        F.lpad("c_mktsegment", 12, ".").alias("seg_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_devowel"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 5 + 1).cast("int")).alias(
            "rule"
        ),
    )


# --------------------------------------------------------------------------
# F17 — binary encoding family: base64/hex round-trips over text payloads
# (the wire formats multimodal blobs and API payloads arrive in). The
# round-trip columns prove encode∘decode = identity on BOTH engines, and
# the encoded forms value-match cross-engine (same RFC 4648 / hex
# alphabets). Pure scan-stage JVM expressions.
# --------------------------------------------------------------------------
@register(
    "f17_encoding_funcs",
    oracle="""
    SELECT doc_id,
           base64(encode(substr(text, 1, 24)))            AS b64,
           hex(encode(substr(text, 1, 12)))               AS hx,
           decode(from_base64(base64(encode(substr(text, 1, 24)))))
               = substr(text, 1, 24)                      AS b64_roundtrip,
           decode(unhex(hex(encode(substr(text, 1, 12)))))
               = substr(text, 1, 12)                      AS hex_roundtrip
    FROM documents
    WHERE doc_id < 40
    """,
)
def f17_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    head24 = F.substring("text", 1, 24)
    head12 = F.substring("text", 1, 12)
    b64 = F.base64(F.encode(head24, "utf-8"))
    hx = F.hex(F.encode(head12, "utf-8"))
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        hx.alias("hx"),
        (F.decode(F.unbase64(b64), "utf-8") == head24).alias("b64_roundtrip"),
        (F.decode(F.unhex(hx), "utf-8") == head12).alias("hex_roundtrip"),
    )


# --------------------------------------------------------------------------
# F18 — collation-aware comparison (Spark 4 COLLATE): case-insensitive
# equality/grouping as a COLUMN PROPERTY instead of lower() calls scattered
# through every predicate — the engine-level fix for mixed-case feeds.
# Half the rows are re-cased (initcap) so naive grouping doubles the
# groups; grouping under UTF8_LCASE merges them. The oracle mirrors with
# lower() (UTF8_LCASE's definition for ASCII); the in-query verdict pins
# that collated grouping halves the group count.
# --------------------------------------------------------------------------
@register(
    "f18_collation",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                    ELSE upper(substr(c_mktsegment, 1, 1))
                         || lower(substr(c_mktsegment, 2))
               END AS seg
        FROM customer
    )
    SELECT lower(seg) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants,
           TRUE AS collation_merges_case
    FROM mixed
    GROUP BY lower(seg)
    """,
)
def f18_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    mixed = cust.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.col("c_mktsegment")
        )
        .otherwise(F.initcap(F.lower("c_mktsegment")))
        .alias("seg")
    )
    naive_groups = mixed.select("seg").distinct().count()
    collated = mixed.groupBy(
        F.expr("seg COLLATE UTF8_LCASE").alias("cseg")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("seg").alias("n_case_variants"),
    )
    coll_groups = collated.count()
    return collated.select(
        F.lower("cseg").alias("segment"),
        "n_customers",
        "n_case_variants",
        F.lit(coll_groups * 2 == naive_groups).alias("collation_merges_case"),
    )


# --------------------------------------------------------------------------
# F19 — native XML functions (Spark 4: to_xml / from_xml / xpath_*): the
# third semi-structured format alongside JSON (F5) and VARIANT (F9). Each
# order row is serialized to an XML fragment, parsed back with an explicit
# schema, and independently re-extracted via XPath; the output carries the
# PARSED values plus roundtrip booleans rather than the raw XML text, so
# the oracle pins semantics (values survive serialize->parse->extract)
# without coupling to Spark's XML pretty-printing. All three functions are
# JVM expressions inside the scan stage — no shuffle beyond the final sort.
# --------------------------------------------------------------------------
@register(
    "f19_xml_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority                                   AS parsed_priority,
           ROUND(o_totalprice, 2)                            AS parsed_price,
           o_orderpriority                                   AS xpath_priority,
           TRUE                                              AS roundtrip_ok,
           TRUE                                              AS xpath_ok
    FROM orders
    WHERE o_orderkey < 200
    """,
)
def f19_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    xml = F.expr(
        "to_xml(named_struct("
        "'o_orderkey', o_orderkey,"
        "'o_orderpriority', o_orderpriority,"
        "'o_totalprice', ROUND(o_totalprice, 2)))"
    )
    staged = orders.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey", "o_orderpriority",
        F.round("o_totalprice", 2).alias("price_r"),
        xml.alias("x"),
    )
    parsed = staged.select(
        "o_orderkey", "o_orderpriority", "price_r",
        F.expr(
            "from_xml(x, 'o_orderkey BIGINT, o_orderpriority STRING,"
            " o_totalprice DOUBLE')"
        ).alias("s"),
        F.expr("xpath_string(x, '/ROW/o_orderpriority')").alias("xp"),
        F.expr("CAST(xpath_string(x, '/ROW/o_orderkey') AS BIGINT)").alias("xk"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("s.o_orderpriority").alias("parsed_priority"),
        F.col("s.o_totalprice").alias("parsed_price"),
        F.col("xp").alias("xpath_priority"),
        (
            (F.col("s.o_orderkey") == F.col("o_orderkey"))
            & (F.col("s.o_orderpriority") == F.col("o_orderpriority"))
            & (F.abs(F.col("s.o_totalprice") - F.col("price_r")) < 1e-9)
        ).alias("roundtrip_ok"),
        ((F.col("xp") == F.col("o_orderpriority"))
         & (F.col("xk") == F.col("o_orderkey"))).alias("xpath_ok"),
    )


# --------------------------------------------------------------------------
# F20 — mapInArrow (raw Arrow RecordBatch transform): the last Python
# boundary shape after mapInPandas / applyInPandas / cogroup / stateful /
# grouped-agg (A24). Unlike the pandas variants there is NO conversion to
# pandas objects — batches stay as Arrow arrays end-to-end and the work is
# done by pyarrow.compute kernels (vectorized C++), which is the right
# boundary for byte/string-heavy transforms where pandas object columns
# would dominate the cost. Per-doc token/char counts are recomputed
# JVM-side by the oracle, so any batch truncation, column reorder, or
# row drop at the Arrow boundary fails the per-lang sums.
# --------------------------------------------------------------------------
@register(
    "f20_map_in_arrow",
    oracle="""
    SELECT lang,
           COUNT(*)                                         AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)   AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT)                AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def f20_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_stats(batches):
        for b in batches:
            toks = pc.list_value_length(pc.split_pattern(b.column("text"), " "))
            yield pa.RecordBatch.from_arrays(
                [b.column("lang"), toks, pc.utf8_length(b.column("text"))],
                names=["lang", "n_tokens", "n_chars"],
            )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    stats = docs.mapInArrow(
        batch_stats, "lang string, n_tokens int, n_chars int"
    )
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# F21 — polymorphic Python UDTF (Spark 4 `analyze()`): the output SCHEMA is
# computed at query-planning time from the call's constant arguments — the
# API for generic Python table functions (a parser whose column set depends
# on a format string, a splitter whose width is a parameter) that f12's
# fixed returnType cannot express. `analyze()` receives each argument's
# type and foldable value and returns the schema; `eval()` then fans rows
# out under that schema. Here: split each doc's text into its first k
# leading tokens as k REAL COLUMNS (tok0..tok{k-1}), k a literal the
# planner folds. The DuckDB twin uses split_part — proving the dynamic
# schema path computes ordinary deterministic values.
# --------------------------------------------------------------------------
@register(
    "f21_polymorphic_udtf",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS tok0,
           split_part(text, ' ', 2) AS tok1,
           split_part(text, ' ', 3) AS tok2
    FROM documents WHERE doc_id < 40
    """,
)
def f21_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            # k is a foldable literal: its VALUE is available at planning
            # time and determines the column count of every result row.
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"tok{j}", StringType())
                        for j in range(int(k.value))
                    ]
                )
            )

        def eval(self, text: str, k: int):
            toks = (text or "").split(" ")
            yield tuple(
                toks[j] if j < len(toks) else "" for j in range(k)
            )

    spark.udtf.register("f21_lead_tokens", LeadTokens)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    docs.createOrReplaceTempView("f21_docs")
    return spark.sql(
        "SELECT doc_id, t.tok0, t.tok1, t.tok2 "
        "FROM f21_docs, LATERAL f21_lead_tokens(text, 3) AS t"
    )


# --------------------------------------------------------------------------
# F22 — table-argument UDTF (Spark 4 `TABLE(...) PARTITION BY`): the last
# UDTF quadrant after f12 (fixed schema), f21 (polymorphic analyze()).
# The function consumes a WHOLE TABLE as its argument, and PARTITION BY
# lang makes Spark hash-exchange the input so ONE UDTF instance sees ALL
# rows of a language — per-group state lives in plain Python (__init__
# accumulators, terminate() emits the summary), the escape hatch for
# group logic no SQL aggregate expresses. The summary here IS expressible
# (deliberately: COUNT/SUM/COUNT DISTINCT/MAX), so the plain-SQL oracle
# pins the Python path exactly and the row joins the PORTABLE parity
# list; tests pin the hash-partition exchange in the plan and the
# applyInPandas twin's equality.
# Scale: one shuffle on the partition key — identical movement to the
# equivalent groupBy; per-instance state is O(1) scalars + the distinct-
# source set (bounded: 16 sources).
# --------------------------------------------------------------------------
@register(
    "f22_table_arg_udtf",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)              AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)          AS total_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MAX(n_chars) AS BIGINT)          AS longest_doc
    FROM documents GROUP BY lang
    """,
)
def f22_table_arg_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="lang string, n_docs bigint, total_chars bigint,"
        " n_sources bigint, longest_doc bigint"
    )
    class LangSummary:
        def __init__(self) -> None:
            self.lang = None
            self.n = 0
            self.chars = 0
            self.sources = set()
            self.longest = 0

        def eval(self, row):
            self.lang = row["lang"]
            self.n += 1
            self.chars += row["n_chars"]
            self.sources.add(row["source"])
            self.longest = max(self.longest, row["n_chars"])

        def terminate(self):
            # One instance per PARTITION BY group; an instance that saw no
            # rows (empty partition) emits nothing.
            if self.lang is not None:
                yield (
                    self.lang,
                    self.n,
                    self.chars,
                    len(self.sources),
                    self.longest,
                )

    spark.udtf.register("f22_lang_summary", LangSummary)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("f22_docs")
    return spark.sql(
        "SELECT * FROM f22_lang_summary(TABLE(f22_docs) PARTITION BY lang)"
    )


# --------------------------------------------------------------------------
# F23 — grouped applyInArrow (Spark 4): the last cell of the Python
# boundary matrix — pandas row (f13-era UDFs), pandas grouped
# (applyInPandas, t6/f22-twin), pandas grouped-agg (a24), raw Arrow map
# (f20 mapInArrow) — and now raw Arrow GROUPED: each l_returnflag group
# arrives as ONE pyarrow.Table and is reduced with pyarrow.compute
# kernels, no pandas materialization, no per-row Python. The summary is
# deliberately SQL-expressible so the plain GROUP BY oracle pins the
# Arrow path exactly (PORTABLE row).
# Scale: one hash exchange on the group key — identical movement to the
# equivalent groupBy; groups must fit an Arrow table each (3 flags here;
# for high-cardinality keys use mapInArrow + partial aggs instead).
# --------------------------------------------------------------------------
@register(
    "f23_apply_in_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)            AS n_rows,
           ROUND(SUM(l_quantity), 2)           AS sum_qty,
           ROUND(MAX(l_extendedprice), 2)      AS max_price,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def f23_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(table: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "n_rows": [table.num_rows],
                # Unrounded here: Python round() is half-to-even while the
                # DuckDB/Spark ROUND is half-away-from-zero, so rounding is
                # deferred to F.round on the Spark side (parity with the
                # oracle's ROUND regardless of midpoint values).
                "sum_qty": [pc.sum(table.column("l_quantity")).as_py()],
                "max_price": [pc.max(table.column("l_extendedprice")).as_py()],
                "n_orders": [
                    pc.count_distinct(table.column("l_orderkey")).as_py()
                ],
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity", "l_extendedprice"
    )
    out = li.groupBy("l_returnflag").applyInArrow(
        summarize,
        "l_returnflag string, n_rows bigint, sum_qty double,"
        " max_price double, n_orders bigint",
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("max_price", 2).alias("max_price"),
        "n_orders",
    )


# --------------------------------------------------------------------------
# F24 — the VARIANT type (Spark 4's semi-structured column): JSON-shaped
# order records round-trip through parse_json into variant storage and
# are read back with typed-path extraction. Exercised quadrants:
# variant_get with a nested object path ($.cust.key) and an array index
# ($.prices[1]); JSON-null vs absent semantics (is_variant_null over an
# explicit null field — ignoreNullFields=false keeps it in the JSON);
# try_variant_get's NULL-on-miscast contract (a 'pri' string never casts
# to bigint); and schema_of_variant introspection, pinned on the
# constant-shaped $.cust subobject (OBJECT<key: BIGINT, seg: VOID> —
# price values would infer per-row DECIMAL precision, deliberately
# excluded from the pin). The oracle reconstructs every aggregate from
# the base columns: a path-resolution or cast bug anywhere in the
# variant plumbing breaks the hash.
# Scale: variant extraction is whole-stage-codegen JVM work, no Python
# boundary; the shape is how 100 TB of heterogeneous event payloads stay
# queryable without a schema migration per producer change.
# --------------------------------------------------------------------------
@register(
    "f24_variant_type",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)                    AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT)             AS sum_id,
           CAST(SUM(o_custkey) AS BIGINT)              AS sum_cust_key,
           ROUND(SUM(o_totalprice * 2), 2)             AS sum_price2,
           TRUE                                        AS all_seg_null,
           CAST(COUNT(*) AS BIGINT)                    AS pri_cast_nulls,
           'OBJECT<key: BIGINT, seg: VOID>'            AS cust_schema
    FROM orders WHERE o_orderkey < 500
    """,
)
def f24_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 500
    )
    js = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_custkey").alias("key"),
                F.lit(None).cast("string").alias("seg"),
            ).alias("cust"),
            F.array(
                F.col("o_totalprice"), F.col("o_totalprice") * 2
            ).alias("prices"),
            F.col("o_orderpriority").alias("pri"),
        ),
        {"ignoreNullFields": "false"},
    )
    v = orders.select(F.parse_json(js).alias("v"))
    extracted = v.select(
        F.variant_get("v", "$.id", "bigint").alias("id_back"),
        F.variant_get("v", "$.cust.key", "bigint").alias("cust_key"),
        F.variant_get("v", "$.prices[1]", "double").alias("p2"),
        F.is_variant_null(
            F.variant_get("v", "$.cust.seg", "variant")
        ).alias("seg_is_null"),
        F.try_variant_get("v", "$.pri", "bigint").alias("pri_as_int"),
        F.schema_of_variant(
            F.variant_get("v", "$.cust", "variant")
        ).alias("cust_schema"),
    )
    return extracted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("id_back").cast("bigint").alias("sum_id"),
        F.sum("cust_key").cast("bigint").alias("sum_cust_key"),
        F.round(F.sum("p2"), 2).alias("sum_price2"),
        F.bool_and("seg_is_null").alias("all_seg_null"),
        F.sum(F.col("pri_as_int").isNull().cast("int"))
        .cast("bigint")
        .alias("pri_cast_nulls"),
        F.max("cust_schema").alias("cust_schema"),
    )


# --------------------------------------------------------------------------
# F25 — try_* error-safe arithmetic (the ANSI-mode escape hatches next to
# p9's try_cast): division by zero, bigint overflow, and out-of-bounds
# element access all yield NULL instead of failing the job — the
# dirty-feed contract where one bad row must not kill a 100 TB pass.
# The oracle models each NULL production explicitly (NULLIF guard for
# div0, CASE for the overflow frontier, bounds CASE for element_at), so
# the row certifies WHERE the NULLs appear, not just that nothing threw.
# All JVM-side whole-stage-codegen expressions; zero Python boundary.
# SCALE NOTE (measured): try_multiply's NULL-on-overflow is a caught JVM
# ArithmeticException — ~18 us PER OVERFLOWING ROW (11 s over 600k rows
# when every row overflows, vs 0.18 s when none do). try_* is a safety
# net for RARE bad rows, not an operator to put on an always-failing hot
# path; the probe below overflows on the l_linenumber = 7 slice only.
# --------------------------------------------------------------------------
@register(
    "f25_try_arithmetic",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice / NULLIF(l_linenumber % 2, 0)), 2)
               AS safe_div_sum,
           CAST(COUNT(*) FILTER (l_linenumber % 2 = 0) AS BIGINT)
               AS n_div0_null,
           CAST(COUNT(*) FILTER (l_linenumber = 7 AND l_orderkey > 1)
                AS BIGINT)
               AS n_overflow_null,
           CAST(COUNT(*) FILTER (l_linenumber < 3) AS BIGINT)
               AS n_oob_null
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def f25_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = F.lit(9223372036854775807).cast("bigint")  # bigint max
    probed = li.select(
        "l_returnflag",
        F.try_divide("l_extendedprice", F.col("l_linenumber") % 2).alias(
            "safe_div"
        ),
        # Overflow frontier on the RARE slice only (scale note above):
        # multiplier is bigint max for 7th line items, 2 otherwise, so
        # the probe overflows (-> NULL) exactly where linenumber = 7 and
        # orderkey > 1 (orderkey 1 * max = max, no overflow).
        F.try_multiply(
            F.col("l_orderkey").cast("bigint"),
            F.when(F.col("l_linenumber") == 7, big).otherwise(
                F.lit(2).cast("bigint")
            ),
        ).alias("mul_probe"),
        # sequence(1, n) has no 3rd element when n < 3 -> NULL
        F.try_element_at(
            F.sequence(F.lit(1), F.col("l_linenumber")), F.lit(3)
        ).alias("elem_probe"),
    )
    return probed.groupBy("l_returnflag").agg(
        F.round(F.sum("safe_div"), 2).alias("safe_div_sum"),
        F.sum(F.col("safe_div").isNull().cast("int"))
        .cast("bigint")
        .alias("n_div0_null"),
        F.sum(F.col("mul_probe").isNull().cast("int"))
        .cast("bigint")
        .alias("n_overflow_null"),
        F.sum(F.col("elem_probe").isNull().cast("int"))
        .cast("bigint")
        .alias("n_oob_null"),
    )


# --------------------------------------------------------------------------
# F26 — ANSI INTERVAL arithmetic: the typed day-time / year-month interval
# surface (Spark's INTERVAL literals + add_months + timestamp
# subtraction -> DayTimeIntervalType + EXTRACT over it). Month addition
# clamps at month end in BOTH engines (Jan 31 + 1 month = Feb 28), so
# add_months has an exact DuckDB twin (ts + INTERVAL n MONTH); day/hour/
# minute shifts and the day-component extraction of a timestamp
# difference are exact by construction. All outputs are timestamps or
# bigints — hash-stable across engines.
# Scale: pure whole-stage-codegen expressions over one scan; the group-by
# on the 3-value status column is a trivially bounded shuffle.
# --------------------------------------------------------------------------
@register(
    "f26_interval_arithmetic",
    oracle="""
    -- NOTE: no two interval constants here may compare equal under
    -- DuckDB's 1 month = 30 days normalization: its common-subexpression
    -- pass dedups "equal" constants, so INTERVAL 90 DAY next to
    -- INTERVAL 3 MONTH silently computes one of them twice (verified on
    -- DuckDB 1.0.0). 45 DAY / 3 MONTH / 36 HOUR / 15 MINUTE are all
    -- pairwise distinct.
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT)                           AS n_orders,
           MAX(o_orderdate + INTERVAL 45 DAY)                 AS latest_due,
           MIN(o_orderdate + INTERVAL 3 MONTH)                AS earliest_plus3m,
           MAX(o_orderdate + INTERVAL 36 HOUR)                AS latest_shift36h,
           MIN(o_orderdate - INTERVAL 15 MINUTE)              AS earliest_minus15m,
           CAST(MAX(date_part('day',
                    o_orderdate - date_trunc('year', o_orderdate)))
                AS BIGINT)                                    AS max_doy_offset
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def f26_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.max(F.expr("o_orderdate + INTERVAL '45' DAY")).alias("latest_due"),
        # Year-month interval: add_months clamps exactly like ts + INTERVAL
        # MONTH (returns DATE, midnight-aligned input -> cast back).
        F.min(F.expr("cast(add_months(o_orderdate, 3) as timestamp)")).alias(
            "earliest_plus3m"
        ),
        F.max(F.expr("o_orderdate + INTERVAL '36' HOUR")).alias(
            "latest_shift36h"
        ),
        F.min(F.expr("o_orderdate - INTERVAL '15' MINUTE")).alias(
            "earliest_minus15m"
        ),
        # ts - ts is a DayTimeIntervalType; EXTRACT(DAY ...) takes its
        # whole-day component (midnight-aligned, so exact).
        F.max(
            F.expr(
                "extract(DAY FROM (o_orderdate"
                " - date_trunc('year', o_orderdate)))"
            )
        )
        .cast("bigint")
        .alias("max_doy_offset"),
    )


# --------------------------------------------------------------------------
# F27 — timestamp parse/format round-trip: date_format -> to_timestamp
# with explicit patterns (Spark's JDK DateTimeFormatter tokens vs
# DuckDB's strftime/strptime % tokens — the translation every cross-
# engine port hits), epoch extraction, and a deliberately reordered
# dd/MM/yyyy pattern so a token-order bug cannot cancel out in the
# round-trip. UTC session == DuckDB's naive timestamps, so epochs are
# exact.
# Scale: whole-stage codegen string work over one scan; bounded group-by.
# --------------------------------------------------------------------------
@register(
    "f27_timestamp_parsing",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)                              AS n,
           MAX(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                        '%Y-%m-%d %H:%M:%S'))                    AS max_roundtrip,
           MAX(strptime(strftime(o_orderdate, '%d/%m/%Y'),
                        '%d/%m/%Y'))                             AS max_dmy_roundtrip,
           CAST(MIN(epoch(o_orderdate)) AS BIGINT)               AS min_epoch,
           MIN(strftime(o_orderdate, '%Y-%m-%d'))                AS min_iso_day
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def f27_timestamp_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max(
            F.to_timestamp(
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
                "yyyy-MM-dd HH:mm:ss",
            )
        ).alias("max_roundtrip"),
        F.max(
            F.to_timestamp(
                F.date_format("o_orderdate", "dd/MM/yyyy"), "dd/MM/yyyy"
            )
        ).alias("max_dmy_roundtrip"),
        F.min(F.unix_timestamp("o_orderdate")).cast("bigint").alias(
            "min_epoch"
        ),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "min_iso_day"
        ),
    )


# --------------------------------------------------------------------------
# F28 — VARIANT / semi-structured ingestion (Spark 4's open-variant type,
# the lakehouse answer to schemaless JSON columns): parse_json into a
# VARIANT column, path-extract typed values (variant_get), probe a
# sometimes-missing field with try_variant_get (NULL, never an error),
# and aggregate on the extracted fields. The JSON feed is derived
# closed-form from orders (money as integer cents — float-to-string
# formatting is engine-specific, integer text is not), with the "note"
# field present only on every 7th key so the missing-path arm is
# load-bearing. The DuckDB oracle replays the same paths through its
# JSON machinery (json_extract_string / CAST(json_extract ...)).
# Scale: parse_json + variant_get are per-row JVM expressions (no
# Python, no shuffle); at rest, variant shredding keeps path extraction
# columnar — this row pins the semantics the shredded reader must honor.
# --------------------------------------------------------------------------
@register(
    "f28_variant_semistructured",
    oracle="""
    WITH feed AS (
        SELECT '{"k":' || o_orderkey
               || ',"cust":{"id":' || o_custkey
               || ',"pri":"' || o_orderpriority || '"}'
               || ',"cents":' || CAST(ROUND(o_totalprice * 100) AS BIGINT)
               || ',"tags":["' || o_orderstatus || '","p'
               || (o_orderkey % 4) || '"]'
               || CASE WHEN o_orderkey % 7 = 0
                       THEN ',"note":"gift"' ELSE '' END
               || '}' AS j
        FROM orders
    )
    SELECT json_extract_string(j, '$.cust.pri')                AS pri,
           CAST(COUNT(*) AS BIGINT)                            AS n,
           CAST(SUM(CAST(json_extract(j, '$.cents') AS BIGINT))
                AS BIGINT)                                     AS sum_cents,
           CAST(SUM(CASE WHEN json_extract_string(j, '$.note')
                              IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT)                                     AS n_notes,
           CAST(COUNT(DISTINCT json_extract_string(j, '$.tags[1]'))
                AS BIGINT)                                     AS n_tag1,
           MIN(json_extract_string(j, '$.tags[0]'))            AS min_status
    FROM feed
    GROUP BY pri
    """,
)
def f28_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    j = F.concat(
        F.lit('{"k":'), F.col("o_orderkey").cast("string"),
        F.lit(',"cust":{"id":'), F.col("o_custkey").cast("string"),
        F.lit(',"pri":"'), F.col("o_orderpriority"), F.lit('"}'),
        F.lit(',"cents":'), cents.cast("string"),
        F.lit(',"tags":["'), F.col("o_orderstatus"), F.lit('","p'),
        (F.col("o_orderkey") % 4).cast("string"), F.lit('"]'),
        F.when(F.col("o_orderkey") % 7 == 0, ',"note":"gift"').otherwise(""),
        F.lit("}"),
    )
    v = orders.select(F.parse_json(j).alias("v"))
    ext = v.select(
        F.variant_get("v", "$.cust.pri", "string").alias("pri"),
        F.variant_get("v", "$.cents", "long").alias("cents"),
        F.try_variant_get("v", "$.note", "string").alias("note"),
        F.variant_get("v", "$.tags[1]", "string").alias("tag1"),
        F.variant_get("v", "$.tags[0]", "string").alias("status"),
    )
    return ext.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.sum(F.col("note").isNotNull().cast("int")).cast("bigint")
        .alias("n_notes"),
        F.countDistinct("tag1").cast("bigint").alias("n_tag1"),
        F.min("status").alias("min_status"),
    )


# --------------------------------------------------------------------------
# F29 — COLLATION semantics (Spark 4's collated string type): equality,
# grouping, and DISTINCT under UTF8_LCASE must be case-insensitive
# WITHOUT rewriting every expression through lower() — the engine-level
# answer to mixed-case categorical columns from heterogeneous producers.
# Feed: o_orderpriority upper-cased on even keys. The row pins (1)
# case-insensitive GROUP BY cardinality, (2) collated equality filter
# counts, (3) case-insensitive COUNT(DISTINCT). Group labels are
# re-normalized through lower() for output — the collated group's
# REPRESENTATIVE casing is explicitly unspecified by the engine, so
# emitting it raw would pin nondeterminism (and the oracle twin, which
# replays the semantics via lower(), could never match it).
# Scale: collation is a comparator property of the type — grouping
# shuffles exactly as before, no normalization map stage needed.
# --------------------------------------------------------------------------
@register(
    "f29_collation_semantics",
    oracle="""
    WITH feed AS (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                    ELSE o_orderpriority END AS pri
        FROM orders
    )
    SELECT lower(pri)                             AS pri_label,
           CAST(COUNT(*) AS BIGINT)               AS n,
           CAST(SUM(CASE WHEN lower(pri) = lower('1-URGENT')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_urgent,
           (SELECT CAST(COUNT(DISTINCT lower(pri)) AS BIGINT) FROM feed)
                                                  AS n_ci_distinct
    FROM feed
    GROUP BY lower(pri)
    """,
)
def f29_collation_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pri = F.when(
        F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority")
    ).otherwise(F.col("o_orderpriority"))
    feed = orders.select(pri.alias("pri")).select(
        F.collate("pri", "UTF8_LCASE").alias("pri_ci")
    )
    ci_distinct = feed.agg(
        F.countDistinct("pri_ci").cast("bigint").alias("n_ci_distinct")
    )
    grouped = feed.groupBy("pri_ci").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (F.col("pri_ci") == F.lit("1-urgent")).cast("int")
        ).cast("bigint").alias("n_eq_urgent"),
    )
    return grouped.crossJoin(F.broadcast(ci_distinct)).select(
        F.lower(F.col("pri_ci").cast("string")).alias("pri_label"),
        "n", "n_eq_urgent", "n_ci_distinct",
    )
