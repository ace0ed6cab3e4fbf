"""Text-analysis operators for the training-data pipeline (SURVEY.md §2k
family: quality scoring, language-ID, fingerprinting — the D5/D7 surface
beyond basic stats).

Everything is JVM column expressions over `documents`; the only
non-SQL-oracle rows are the ones built on xxhash64 (no DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import queries, register
from lime_on_spark_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Quality scoring: token/char ratios a filtering pipeline would gate on
# --------------------------------------------------------------------------
@register(
    "d5_quality_scores",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               lang,
               len(string_split(text, ' '))                   AS n_tokens,
               len(list_distinct(string_split(text, ' ')))    AS n_distinct_tokens,
               length(text)                                   AS n_chars
        FROM documents
    )
    SELECT lang,
           COUNT(*)                                           AS n_docs,
           ROUND(AVG(n_tokens), 4)                            AS avg_tokens,
           ROUND(AVG(n_distinct_tokens * 1.0 / n_tokens), 4)  AS avg_ttr,
           ROUND(AVG((n_chars - n_tokens + 1) * 1.0 / n_tokens), 4)
                                                              AS avg_word_len,
           CAST(SUM(CASE WHEN n_tokens BETWEEN 5 AND 1000
                          AND n_distinct_tokens * 1.0 / n_tokens > 0.2
                         THEN 1 ELSE 0 END) AS BIGINT)        AS n_quality_pass
    FROM scored
    GROUP BY lang
    """,
)
def d5_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio, length bounds, avg word length — the cheap quality
    gates every corpus-cleaning pipeline applies before training."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    scored = docs.select(
        "lang",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
    )
    ttr = F.col("n_distinct_tokens") / F.col("n_tokens")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg(ttr), 4).alias("avg_ttr"),
        F.round(
            F.avg((F.col("n_chars") - F.col("n_tokens") + 1) / F.col("n_tokens")), 4
        ).alias("avg_word_len"),
        F.sum(
            F.when(
                F.col("n_tokens").between(5, 1000) & (ttr > 0.2), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_quality_pass"),
    )


# --------------------------------------------------------------------------
# Language-ID: corpus-profile n-gram scoring (rows-only — argmax routing)
# --------------------------------------------------------------------------
@register(
    "d7_langid_routing",
    # Full SQL twin of the profile-score-argmax pipeline. The argmax is
    # float-sum-ordered on both engines; verified equal at sf0.001/0.01/0.1
    # — inter-language score gaps are orders of magnitude above float
    # summation noise, and ties break on (total DESC, p_lang) identically.
    oracle="""
    WITH tokens AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), counts AS (
        SELECT lang, token, COUNT(*) AS n FROM tokens GROUP BY lang, token
    ), profile AS (
        SELECT lang AS p_lang, token,
               ln(n + 1) - ln(SUM(n) OVER (PARTITION BY lang) + 1) AS score,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, token) AS rk
        FROM counts
    ), prof AS (SELECT p_lang, token, score FROM profile WHERE rk <= 50000),
    doc_scores AS (
        SELECT t.doc_id, t.lang, p.p_lang, SUM(p.score) AS total
        FROM tokens t JOIN prof p ON t.token = p.token
        GROUP BY t.doc_id, t.lang, p.p_lang
    ), routed AS (
        SELECT doc_id, lang, p_lang AS predicted_lang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY total DESC, p_lang) AS rn
        FROM doc_scores
    )
    SELECT lang, predicted_lang, COUNT(*) AS n_docs
    FROM routed WHERE rn = 1
    GROUP BY lang, predicted_lang
    """,
)
def d7_langid_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed language-ID: learn per-language token log-frequencies from
    the corpus, score each document by summing its tokens' scores, route to
    the argmax language.

    Shape at scale: profile build is one agg over (lang, token); scoring is
    explode → broadcast-join the profile → sum per doc. No Python in the
    loop. The broadcast is bounded by PROFILE_TOP_K tokens per language —
    a raw web-corpus vocabulary can exceed broadcast limits, so the profile
    keeps only each language's most frequent tokens (rank ties broken by
    token for determinism); rare tokens carry little language signal anyway.
    """
    PROFILE_TOP_K = 50_000  # per-language broadcast bound
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    counts = tokens.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    rk = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    profile = (
        counts.withColumn(
            "score",
            F.log(F.col("n") + 1)
            - F.log(F.sum("n").over(Window.partitionBy("lang")) + 1),
        )
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= PROFILE_TOP_K)
        .select(F.col("lang").alias("p_lang"), "token", "score")
    )
    doc_scores = (
        tokens.join(F.broadcast(profile), "token")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.sum("score").alias("total"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("total"), F.asc("p_lang"))
    routed = (
        doc_scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("p_lang").alias("predicted_lang"))
    )
    return routed.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --------------------------------------------------------------------------
# Document fingerprinting: order-sensitive rolling hash (rows-only: xxhash64)
# --------------------------------------------------------------------------
@register(
    "d1_fingerprint",
    # The fingerprint values are xxhash64-derived (not SQL-portable), but
    # their SEPARATION property is: distinct texts map 1:1 to distinct
    # token streams (splitting on the join char is invertible), so a
    # collision-free fingerprint has exactly COUNT(DISTINCT text) distinct
    # values — which DuckDB can count. A hash regression (collisions,
    # order-insensitivity) breaks n_distinct_fp and/or flips fp_injective.
    oracle="""
    SELECT COUNT(*)              AS n_docs,
           COUNT(DISTINCT text)  AS n_distinct_fp,
           TRUE                  AS fp_injective
    FROM documents
    """,
)
def d1_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the token stream — an order-sensitive
    fingerprint (unlike bag-of-shingles MinHash):
    fp = fold((31 * acc + h(t)) mod M), M = 2^31 - 1.

    The modulus keeps every intermediate below 2^36, so the fold is exact
    under ANSI arithmetic (no long overflow) while staying a pure JVM fold —
    deterministic across runs and partitionings."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.lit(2147483647)  # 2^31 - 1 (Mersenne prime)
    fp = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + F.pmod(F.xxhash64(t), m), m),
    )
    with_fp = docs.select("doc_id", "text", fp.alias("fingerprint"))
    return with_fp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_distinct_fp"),
        (
            F.countDistinct("fingerprint") == F.countDistinct("text")
        ).alias("fp_injective"),
    )


# --------------------------------------------------------------------------
# SimHash near-dup signatures (rows-only: xxhash64 bit tricks)
# --------------------------------------------------------------------------
@register("d2_simhash")
def d2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: for each bit b, sign(Σ_tokens ±1) where
    the ± comes from bit b of xxhash64(token). Near-dups share most bits, so
    grouping on a band of the signature buckets candidates without an O(n²)
    pass. Output: Hamming-band bucket sizes (the LSH-style candidate stats).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # bit b of the simhash: majority vote of bit b over token hashes
    bit = lambda b: (  # noqa: E731
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1),
        )
        > 0
    ).cast("long")
    simhash = None
    for b in range(16):  # 16-bit signature keeps the fold tree shallow
        term = bit(b) * F.lit(1 << b)
        simhash = term if simhash is None else simhash + term
    sigs = docs.select("doc_id", simhash.alias("simhash"))
    # band = top 8 bits: identical-band docs are near-dup candidates
    banded = sigs.withColumn("band", F.shiftright("simhash", 8))
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("simhash").alias("n_signatures"),
    )


# --------------------------------------------------------------------------
# Token counting: whitespace vs BPE-ish regex tokenization (SQL oracle)
# --------------------------------------------------------------------------
@register(
    "d5_token_counting",
    oracle=r"""
    SELECT lang,
           COUNT(*)                                           AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)  AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text,
                        '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT)
                                                              AS regex_tokens,
           CAST(SUM(length(text)) AS BIGINT)                  AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def d5_token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish regex token counts per language — the budget
    arithmetic (tokens-per-doc, chars-per-token) every training-data
    pipeline runs before packing. Both counts are JVM regexp expressions."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " "))
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws).alias("ws_tokens"),
        F.sum(bpe).alias("regex_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )


# --------------------------------------------------------------------------
# D2 — exact n-gram Jaccard near-dup pairs (SQL oracle)
# --------------------------------------------------------------------------
@register(
    "d2_ngram_jaccard",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ), sh AS (
        SELECT DISTINCT w1.doc_id,
               w1.word || ' ' || w2.word || ' ' || w3.word AS shingle
        FROM words w1
        JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    """,
)
def d2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity for near-dup pairs above 0.5.

    Shape at scale (operators/jaccard.py): shingle -> inverted-index
    self-join on xxhash64'd shingles (8-byte join keys, one materialization
    of the explode), with a stop-shingle document-frequency cutoff: hot
    shingles are dropped from candidate generation (they quadratically
    inflate the join) and their contribution to |A∩B| is restored from
    small per-doc hot-shingle arrays, so the reported Jaccard stays EXACT
    — see the module docstring for the hot-heavy-doc soundness argument.
    At web scale, additionally prepend the MinHash prefilter
    (d2_minhash_near_dup).
    """
    from lime_on_spark_spark.operators.jaccard import exact_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        )
    )
    sh = (
        docs.filter(F.size(w) >= 3)
        .select("doc_id", F.explode(shingles).alias("shingle"))
    )
    pairs = exact_jaccard_pairs(sh, threshold=0.5, df_cutoff=100)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# D9 — corpus n-gram (bigram) frequency table: the counting primitive under
# n-gram language models and contamination checks. Token pairing is a pure
# JVM zip_with over adjacent slices (no UDF); the single shuffle is the
# count aggregation, keyed by bigram — at 100 TB this is a straight
# map-side-combine word-count at bigram granularity.
# --------------------------------------------------------------------------
@register(
    "d9_bigram_counts",
    oracle="""
    SELECT bigram, COUNT(*) AS n
    FROM (
        SELECT arr[i] || ' ' || arr[i+1] AS bigram
        FROM (SELECT string_split(text, ' ') AS arr FROM documents) d,
             UNNEST(generate_series(1, greatest(len(arr)-1, 0))) AS t(i)
    ) pairs
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
)
def d9_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    n_pairs = F.greatest(F.size(arr) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(arr, 1, n_pairs),
        F.slice(arr, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


# --------------------------------------------------------------------------
# D10 — duplicate-CLUSTER formation: connected components over the near-dup
# pair graph (iterative min-label propagation). Pair detection (d2_*) gives
# edges; real dedup needs the transitive closure — A~B, B~C => {A,B,C} is
# one cluster with one survivor. The loop is O(graph diameter) rounds of
# keyed join + min-aggregate (the standard large-graph CC shape — each
# round is two shuffles on node id, no driver-side data); dup-graph
# diameters are tiny in practice (chains of near-identical docs), and
# localCheckpoint truncates the growing lineage each round. The oracle is
# DuckDB's recursive-CTE transitive closure over the identical edge set.
# --------------------------------------------------------------------------
@register(
    "d10_dup_clusters",
    oracle="""
    WITH RECURSIVE words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ), sh AS (
        SELECT DISTINCT w1.doc_id,
               w1.word || ' ' || w2.word || ' ' || w3.word AS shingle
        FROM words w1
        JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), dpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), edges AS (
        SELECT doc_a, doc_b
        FROM dpairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    ), sym AS (
        SELECT doc_a AS a, doc_b AS b FROM edges
        UNION ALL
        SELECT doc_b, doc_a FROM edges
    ), nodes AS (
        SELECT DISTINCT a AS node FROM sym
    ), reach AS (
        SELECT node, node AS r FROM nodes
        UNION
        SELECT s.b AS node, reach.r FROM reach JOIN sym s ON s.a = reach.node
    )
    SELECT node AS doc_id, MIN(r) AS component
    FROM reach
    GROUP BY node
    """,
)
def d10_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.connected_components import (
        connected_components,
    )
    from lime_on_spark_spark.plans.registry import queries

    pairs = queries()["d2_ngram_jaccard"](spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )


# --------------------------------------------------------------------------
# D13 — context-window chunking: split each document into overlapping
# token windows (size 40, stride 30 -> 25% overlap), the preprocessing
# step that turns raw documents into training-context rows. Start offsets
# come from F.sequence, windows from F.slice — all JVM expressions, so
# chunking happens inside the scan stage and only the exploded chunk rows
# ever exist; no UDF, no shuffle until whatever consumes the chunks.
# --------------------------------------------------------------------------
@register(
    "d13_chunk_documents",
    oracle="""
    SELECT doc_id,
           CAST((s - 1) / 30 AS BIGINT)                        AS chunk_id,
           len(list_slice(toks, s, s + 39))                    AS n_tokens,
           array_to_string(list_slice(toks, s, s + 39), ' ')   AS chunk_text
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
         UNNEST(generate_series(1, len(toks), 30)) AS t(s)
    """,
)
def d13_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    CHUNK, STRIDE = 40, 30
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(STRIDE))
    return (
        docs.select("doc_id", toks.alias("toks"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / STRIDE).cast("bigint").alias("chunk_id"),
            F.size(F.slice("toks", F.col("s"), F.lit(CHUNK))).alias("n_tokens"),
            F.concat_ws(" ", F.slice("toks", F.col("s"), F.lit(CHUNK))).alias(
                "chunk_text"
            ),
        )
    )


# --------------------------------------------------------------------------
# D14 — sequence packing: assign each context chunk to a training batch so
# batches respect a token budget (greedy in chunk order). Packing is
# DOCUMENT-LOCAL (window partitioned by doc_id) so the cumsum never needs
# a global order — the scale-safe form; cross-document packing would be a
# single-reducer sort at 100 TB. The greedy rule (batch = floor(tokens
# before this chunk / budget)) can overflow a batch by at most one chunk,
# the standard streaming-packing tradeoff.
# --------------------------------------------------------------------------
@register(
    "d14_pack_sequences",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               CAST((s - 1) / 30 AS BIGINT)     AS chunk_id,
               len(list_slice(toks, s, s + 39)) AS n_tokens
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
             UNNEST(generate_series(1, len(toks), 30)) AS t(s)
    ), packed AS (
        SELECT doc_id, chunk_id, n_tokens,
               CAST(floor(
                   (SUM(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) - n_tokens) / 128.0
               ) AS BIGINT) AS batch_id
        FROM chunks
    )
    SELECT doc_id, batch_id,
           COUNT(*)     AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
    FROM packed
    GROUP BY doc_id, batch_id
    """,
)
def d14_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    BUDGET = 128
    chunks = queries()["d13_chunk_documents"](spark, sf_dir).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = chunks.withColumn(
        "batch_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / BUDGET).cast(
            "bigint"
        ),
    )
    return packed.groupBy("doc_id", "batch_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("batch_tokens"),
    )
