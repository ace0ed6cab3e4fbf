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
    pairs = exact_jaccard_pairs(
        _word_shingles(docs), threshold=0.5, df_cutoff=100
    )
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
# D10b — connected components via large-star/small-star contraction on an
# ADVERSARIAL high-diameter graph: four disjoint chains of up to 256 nodes
# each, built deterministically from ranked doc_ids (group = doc_id % 4,
# consecutive ranks linked). Min-label propagation (d10's engine) needs
# O(diameter) ~ 250 rounds here; star contraction reaches the edge fixed
# point in O(log n) alternations (unit-pinned in tests/test_clustering.py).
# The oracle is DuckDB's recursive-CTE transitive closure over the same
# chain edges — fully independent of the contraction algebra.
# --------------------------------------------------------------------------
@register(
    "d10b_cc_star",
    oracle="""
    WITH RECURSIVE ranked AS (
        SELECT doc_id, doc_id % 4 AS g,
               ROW_NUMBER() OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
                   AS rk
        FROM documents
    ), chain AS (SELECT * FROM ranked WHERE rk <= 256),
    edges AS (
        SELECT * FROM (
            SELECT lag(doc_id) OVER (PARTITION BY g ORDER BY doc_id) AS a,
                   doc_id AS b
            FROM chain
        ) WHERE a IS NOT NULL
    ), sym AS (
        SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges
    ), nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach AS (
        SELECT node, node AS r FROM nodes
        UNION
        SELECT s.b AS node, reach.r FROM reach JOIN sym s ON s.a = reach.node
    ), comp AS (
        SELECT node, MIN(r) AS component FROM reach GROUP BY node
    )
    SELECT component, COUNT(*) AS n_nodes, MAX(node) AS max_node
    FROM comp
    GROUP BY component
    ORDER BY component
    """,
)
def d10b_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.connected_components import (
        connected_components_star,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 4).alias("g")
    )
    wg = Window.partitionBy("g").orderBy("doc_id")
    chain = (
        docs.withColumn("rk", F.row_number().over(wg))
        .filter(F.col("rk") <= 256)
        .withColumn("prev", F.lag("doc_id").over(wg))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("a"), F.col("doc_id").alias("b"))
    )
    comp = connected_components_star(chain, src="a", dst="b")
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.max("node").alias("max_node"),
        )
        .orderBy("component")
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


# --------------------------------------------------------------------------
# D15 — benchmark decontamination: drop training documents that share ANY
# word-3-gram with the benchmark set (here: doc_id % 50 == 0 stands in for
# the held-out benchmark). The canonical pre-training hygiene op: a single
# shingle-keyed LEFT SEMI join from train docs to benchmark shingles — the
# inverse of near-dup pair generation, same inverted-index shape, so it
# scales identically (shingle join keys, never document bodies).
# --------------------------------------------------------------------------
@register(
    "d15_decontaminate",
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
    ), bench_sh AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    ), contaminated AS (
        SELECT DISTINCT s.doc_id
        FROM sh s JOIN bench_sh b ON s.shingle = b.shingle
        WHERE s.doc_id % 50 != 0
    )
    SELECT d.lang,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean
    FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE d.doc_id % 50 != 0
    GROUP BY d.lang
    """,
)
def d15_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = _word_shingles(docs)
    bench_sh = sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    train_sh = sh.filter(F.col("doc_id") % 50 != 0)
    contaminated = (
        train_sh.join(bench_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(
                F.when(F.col("is_contam"), 1).otherwise(0)
            ).alias("n_contaminated"),
            F.sum(
                F.when(F.col("is_contam").isNull(), 1).otherwise(0)
            ).alias("n_clean"),
        )
    )


def _word_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) with per-doc-distinct word 3-grams (shared by
    d2_ngram_jaccard's candidate generation and the D15/D17 consumers).

    The token array is PROJECTED into a column before the transform that
    indexes it: `element_at(split(text), i)` inside a lambda re-evaluates
    the split per element access (O(tokens²) per doc — measured 10x slower
    at sf0.1); against a materialized array column each access is O(1).
    """
    tk = docs.select("doc_id", F.split("text", " ").alias("tk")).filter(
        F.size("tk") >= 3
    )
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("tk", i),
                F.element_at("tk", i + 1),
                F.element_at("tk", i + 2),
            ),
        )
    )
    return tk.select("doc_id", F.explode(shingles).alias("shingle"))


# --------------------------------------------------------------------------
# D16 — TF-IDF top terms per document: tf·ln(N/df) with deterministic
# (score DESC, token ASC) ranking, top 3 for a bounded probe set. The
# corpus-wide df table is the only extra shuffle; scoring is a shingle-free
# token join. At 100 TB the df table is vocabulary-sized — join, don't
# assume broadcast (same reasoning as d7's profile cap).
# --------------------------------------------------------------------------
@register(
    "d16_tfidf_top_terms",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM tokens GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               tf.tf * ln(n.n_docs * 1.0 / df.df) AS score
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, token, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token) AS rk
        FROM scored
    )
    SELECT doc_id, rk, token, ROUND(score, 6) AS tfidf
    FROM ranked
    WHERE rk <= 3 AND doc_id < 20
    """,
)
def d16_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar corpus size (metadata-sized action)
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 20))
        .select("doc_id", "rk", "token", F.round("score", 6).alias("tfidf"))
    )


# --------------------------------------------------------------------------
# D17 — triangle count over the near-dup graph: the density diagnostic for
# dup clusters (triangle-heavy components are true dup families; sparse
# chains are often transitive-threshold artifacts). One ordered edge list
# (a<b), two self-joins on the smaller endpoint — the standard distributed
# triangle enumeration; edges are the OUTPUT of pair generation, so the
# join input is small relative to the corpus.
# --------------------------------------------------------------------------
@register(
    "d17_dup_triangles",
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
    ), dpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b
        FROM dpairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    )
    SELECT COUNT(*) AS n_edges,
           (SELECT COUNT(*)
            FROM edges e1
            JOIN edges e2 ON e2.a = e1.b
            JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    FROM edges
    """,
)
def d17_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        queries()["d2_ngram_jaccard"](spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint(eager=True)  # tiny; reused by three join branches
    )
    e1 = edges.select(F.col("a"), F.col("b"))
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
    )
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    )


# --------------------------------------------------------------------------
# D18 — per-source token entropy + divergence from the corpus distribution:
# the distribution-shift diagnostic run before mixing sources. Shannon
# entropy from per-source term frequencies; KL(source ‖ corpus) over the
# source's support. Two aggs over (source, token) — map-side combinable.
# --------------------------------------------------------------------------
@register(
    "d18_source_entropy",
    oracle="""
    WITH tokens AS (
        SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), per_src AS (
        SELECT source, token, COUNT(*) AS n FROM tokens GROUP BY source, token
    ), corpus AS (
        SELECT token, CAST(SUM(n) AS DOUBLE) AS cn FROM per_src GROUP BY token
    ), corpus_tot AS (SELECT SUM(cn) AS ct FROM corpus),
    src_tot AS (
        SELECT source, CAST(SUM(n) AS DOUBLE) AS st FROM per_src GROUP BY source
    )
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT)                       AS n_terms,
           ROUND(-SUM((p.n / t.st) * ln(p.n / t.st)), 6)  AS entropy,
           ROUND(SUM((p.n / t.st)
                     * ln((p.n / t.st) / (c.cn / ct.ct))), 6) AS kl_from_corpus
    FROM per_src p
    JOIN src_tot t ON p.source = t.source
    JOIN corpus c ON p.token = c.token
    CROSS JOIN corpus_tot ct
    GROUP BY p.source
    """,
)
def d18_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    per_src = tokens.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    corpus = per_src.groupBy("token").agg(
        F.sum("n").cast("double").alias("cn")
    )
    corpus_tot = corpus.agg(F.sum("cn").alias("ct"))
    src_tot = per_src.groupBy("source").agg(
        F.sum("n").cast("double").alias("st")
    )
    p = F.col("n") / F.col("st")
    q = F.col("cn") / F.col("ct")
    return (
        per_src.join(src_tot, "source")
        .join(corpus, "token")
        .crossJoin(corpus_tot)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_from_corpus"),
        )
    )


# --------------------------------------------------------------------------
# D19 — repetition filter (Gopher-style quality gate): fraction of a doc's
# word-3-grams occupied by its single most frequent 3-gram. High ratios
# mark boilerplate/degenerate text. Per-doc agg over the exploded 3-gram
# stream (duplicates KEPT — repetition is the signal), then a corpus
# summary; everything stays in the scan+two-agg shape.
# --------------------------------------------------------------------------
@register(
    "d19_repetition_filter",
    oracle="""
    WITH words AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
        SELECT doc_id, lang,
               toks[s] || ' ' || toks[s+1] || ' ' || toks[s+2] AS gram
        FROM words, UNNEST(generate_series(1, len(toks) - 2)) AS t(s)
        WHERE len(toks) >= 3
    ), per_gram AS (
        SELECT doc_id, lang, gram, COUNT(*) AS n
        FROM grams GROUP BY doc_id, lang, gram
    ), per_doc AS (
        SELECT doc_id, lang,
               MAX(n) * 1.0 / SUM(n) AS top_gram_ratio
        FROM per_gram GROUP BY doc_id, lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(top_gram_ratio), 6) AS avg_top_gram_ratio,
           CAST(SUM(CASE WHEN top_gram_ratio > 0.18 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repetitive
    FROM per_doc
    GROUP BY lang
    """,
)
def d19_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Pre-project the token array (see _word_shingles: inline split inside
    # an indexing lambda is O(tokens²) per doc). Duplicates kept here.
    tk = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("tk")
    ).filter(F.size("tk") >= 3)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at("tk", i),
            F.element_at("tk", i + 1),
            F.element_at("tk", i + 2),
        ),
    )
    exploded = tk.select("doc_id", "lang", F.explode(grams).alias("gram"))
    per_gram = exploded.groupBy("doc_id", "lang", "gram").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_doc = per_gram.groupBy("doc_id", "lang").agg(
        (F.max("n") / F.sum("n")).alias("top_gram_ratio")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("top_gram_ratio"), 6).alias("avg_top_gram_ratio"),
        F.sum(
            F.when(F.col("top_gram_ratio") > 0.18, 1).otherwise(0)
        ).cast("bigint").alias("n_repetitive"),
    )


# --------------------------------------------------------------------------
# D2c — SimHash quality verdict: every TRUE near-dup pair (exact Jaccard
# >= 0.5, the d2 oracle set) must land within Hamming distance 7 on the
# 16-bit SimHash (observed max 5 across sf0.001/0.01/0.1; random pairs
# average 8). This is the property that makes SimHash banding usable as a
# candidate filter — and it is oracle-checkable: the pair COUNT comes from
# the exact-Jaccard SQL, the Hamming verdict from Spark, both deterministic.
# --------------------------------------------------------------------------
@register(
    "d2_simhash_consistency",
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
    ), dpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT COUNT(*) AS n_neardup_pairs, TRUE AS hamming_ok
    FROM dpairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    """,
)
def d2_simhash_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.split("text", " ").alias("tk"))
    bit = lambda b: (  # noqa: E731
        F.aggregate(
            F.col("tk"),
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1),
        )
        > 0
    ).cast("long")
    simhash = None
    for b in range(16):
        term = bit(b) * F.lit(1 << b)
        simhash = term if simhash is None else simhash + term
    sigs = tk.select("doc_id", simhash.alias("sh"))
    pairs = queries()["d2_ngram_jaccard"](spark, sf_dir).select("doc_a", "doc_b")
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_neardup_pairs"),
            (F.max(ham) <= 7).alias("hamming_ok"),
        )
    )


# --------------------------------------------------------------------------
# D22 — CROSS-document sequence packing (the production training-batch op;
# d14 is the document-local form). Chunks are routed to a fixed number of
# packing groups by hashed doc_id, and each group packs its chunks
# greedily (sequential first-fit in (doc_id, chunk_id) order) via
# applyInPandas — bin packing is inherently sequential, but only WITHIN a
# group: groups pack in parallel and nothing crosses the driver, so the
# shape scales by adding groups. Batch composition depends on the grouping
# only through the deterministic hash, so the op is reproducible; the
# driver-checkable contract is conservation + feasibility + efficiency:
# every chunk packed exactly once (SQL-checkable totals), no batch over
# budget, and batch count within the any-fit bound
# (<= ceil(2·total/budget) + n_groups; each group leaves at most one
# under-half-full batch).
# --------------------------------------------------------------------------
@register(
    "d22_pack_cross_doc",
    oracle="""
    WITH chunks AS (
        SELECT len(list_slice(toks, s, s + 39)) AS n_tokens
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
             UNNEST(generate_series(1, len(toks), 30)) AS t(s)
    )
    SELECT COUNT(*)                         AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT)    AS total_tokens,
           TRUE                             AS no_overflow,
           TRUE                             AS n_batches_ok
    FROM chunks
    """,
)
def d22_pack_cross_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    BUDGET, N_GROUPS = 128, 32
    chunks = queries()["d13_chunk_documents"](spark, sf_dir).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    grouped = chunks.withColumn(
        "grp", F.pmod(F.xxhash64("doc_id"), F.lit(N_GROUPS))
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "chunk_id"])
        batches = []
        cur_tokens, cur_chunks, batch_id = 0, 0, 0
        for n in pdf["n_tokens"]:
            if cur_tokens + n > BUDGET and cur_tokens > 0:
                batches.append((batch_id, cur_chunks, cur_tokens))
                batch_id += 1
                cur_tokens, cur_chunks = 0, 0
            cur_tokens += int(n)
            cur_chunks += 1
        if cur_chunks:
            batches.append((batch_id, cur_chunks, cur_tokens))
        grp = int(pdf["grp"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            [(grp, b, c, t) for b, c, t in batches],
            columns=["grp", "batch_id", "n_chunks", "batch_tokens"],
        )

    packed = grouped.groupBy("grp").applyInPandas(
        pack, schema="grp int, batch_id long, n_chunks long, batch_tokens long"
    )
    totals = packed.agg(
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("batch_tokens").alias("total_tokens"),
        F.max(F.col("batch_tokens") > BUDGET).alias("any_overflow"),
        F.count(F.lit(1)).alias("n_batches"),
    )
    bound = lambda total: (  # noqa: E731
        F.ceil(2 * total / F.lit(float(BUDGET))) + N_GROUPS
    )
    return totals.select(
        "n_chunks",
        "total_tokens",
        (~F.col("any_overflow")).alias("no_overflow"),
        (F.col("n_batches") <= bound(F.col("total_tokens"))).alias(
            "n_batches_ok"
        ),
    )


#: Shared oracle CTE: the exact word-3-gram Jaccard >= 0.5 near-dup edge
#: set (identical to d2_ngram_jaccard's pair computation).
_NEARDUP_EDGES_CTE = """
    words AS (
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
    )
"""


# --------------------------------------------------------------------------
# D27 — train/test split leakage audit: near-dup pairs that STRADDLE the
# hash split. Deduplicating before splitting is not enough if the split is
# assigned upstream (or data arrives pre-split): any Jaccard>=0.5 pair with
# one endpoint in train and the other in test leaks evaluation data into
# training. The audit classifies every near-dup edge by its endpoints'
# splits — the cross-split categories are the leaks. Composition of two
# already-scale-safe pieces (inverted-index Jaccard pairs + broadcastable
# md5 split assignment); the classify-and-count adds one map-side-combine
# aggregate over the PAIR table (tiny relative to the corpus).
# --------------------------------------------------------------------------
@register(
    "d27_split_leakage",
    oracle=f"""
    WITH {_NEARDUP_EDGES_CTE},
    assigned AS (
        SELECT doc_id,
               CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                 ELSE 'test'
               END AS split
        FROM documents
    ), classified AS (
        SELECT CASE WHEN sa.split <= sb.split
                    THEN sa.split || '|' || sb.split
                    ELSE sb.split || '|' || sa.split END AS category
        FROM edges
        JOIN assigned sa ON doc_a = sa.doc_id
        JOIN assigned sb ON doc_b = sb.doc_id
    )
    SELECT category,
           COUNT(*)                                 AS n_pairs,
           split_part(category, '|', 1)
             = split_part(category, '|', 2)         AS within_split
    FROM classified
    GROUP BY category
    """,
)
def d27_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.registry import queries

    pairs = queries()["d2_ngram_jaccard"](spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    assigned = docs.select(
        "doc_id",
        F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test").alias(
            "split"
        ),
    )
    a = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    cat = F.when(
        F.col("sa") <= F.col("sb"), F.concat_ws("|", "sa", "sb")
    ).otherwise(F.concat_ws("|", "sb", "sa"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(cat.alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "category",
            "n_pairs",
            (
                F.element_at(F.split("category", "\\|"), 1)
                == F.element_at(F.split("category", "\\|"), 2)
            ).alias("within_split"),
        )
    )


# --------------------------------------------------------------------------
# D28 — PageRank over the near-dup graph (3 power iterations, damping
# 0.85): centrality in the duplicate graph surfaces "template" documents —
# the hub a whole family of near-copies derives from — which is the right
# SURVIVOR choice for cluster dedup (keep the template, drop satellites).
# Each iteration is one hash join (edges × current ranks) + one
# map-side-combinable aggregate on dst — the canonical distributed-graph
# step; 3 fixed iterations keep it SQL-unrollable so DuckDB can mirror the
# exact computation CTE-by-CTE. Undirected graph: every edge contributes
# both directions; N is the node count of the GRAPH (docs with >= 1 edge).
# --------------------------------------------------------------------------
@register(
    "d28_pagerank",
    oracle=f"""
    WITH {_NEARDUP_EDGES_CTE},
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM edges
        UNION ALL
        SELECT doc_b, doc_a FROM edges
    ), deg AS (
        SELECT src, COUNT(*) AS g FROM sym GROUP BY src
    ), nn AS (
        SELECT COUNT(*) AS c FROM deg
    ), pr0 AS (
        SELECT src AS node, 1.0 / c AS pr FROM deg, nn
    ), pr1 AS (
        SELECT s.dst AS node, 0.15 / ANY_VALUE(nn.c) + 0.85 * SUM(p.pr / d.g) AS pr
        FROM sym s
        JOIN pr0 p ON s.src = p.node
        JOIN deg d ON s.src = d.src, nn
        GROUP BY s.dst
    ), pr2 AS (
        SELECT s.dst AS node, 0.15 / ANY_VALUE(nn.c) + 0.85 * SUM(p.pr / d.g) AS pr
        FROM sym s
        JOIN pr1 p ON s.src = p.node
        JOIN deg d ON s.src = d.src, nn
        GROUP BY s.dst
    ), pr3 AS (
        SELECT s.dst AS node, 0.15 / ANY_VALUE(nn.c) + 0.85 * SUM(p.pr / d.g) AS pr
        FROM sym s
        JOIN pr2 p ON s.src = p.node
        JOIN deg d ON s.src = d.src, nn
        GROUP BY s.dst
    )
    SELECT node AS doc_id, ROUND(pr, 6) AS pagerank
    FROM pr3
    """,
)
def d28_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.registry import queries

    edges = queries()["d2_ngram_jaccard"](spark, sf_dir).select("doc_a", "doc_b")
    # Symmetrize in ONE pass (explode, not union: each union branch would
    # re-run the whole Jaccard pipeline — measured 19 s vs 8 s at sf0.1),
    # then materialize once for the 1 (deg) + 3 (iteration) consumers.
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    sym = sym.localCheckpoint(eager=True)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("g"))
    n_nodes = deg.count()  # O(1) to the driver: the graph's node count
    ranks = deg.select("src", F.lit(1.0 / n_nodes).alias("pr"))
    contrib_src = sym.join(deg, "src")
    for _ in range(3):
        ranks = (
            contrib_src.join(ranks, "src")
            .groupBy("dst")
            .agg((0.15 / n_nodes + 0.85 * F.sum(F.col("pr") / F.col("g"))).alias("pr"))
            .withColumnRenamed("dst", "src")
        )
    return ranks.select(
        F.col("src").alias("doc_id"), F.round("pr", 6).alias("pagerank")
    )


# --------------------------------------------------------------------------
# D29 — text normalization: the canonicalization pass that runs BEFORE
# hashing/dedup in a training pipeline (a dedup keyed on raw bytes misses
# trivially-reformatted copies). lowercase → collapse runs of whitespace →
# strip non-alphanumerics → trim; pure regexp/scalar JVM expressions in the
# scan stage, zero shuffles before the final doc-level projection. Emits
# before/after lengths so the oracle pins both the transform and how much
# it removed.
# --------------------------------------------------------------------------
@register(
    "d29_text_normalize",
    oracle="""
    SELECT doc_id,
           length(text)                        AS raw_chars,
           length(norm)                        AS norm_chars,
           substr(norm, 1, 40)                 AS norm_prefix,
           md5(norm)                           AS norm_fingerprint
    FROM (
        SELECT doc_id, text,
               trim(regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                                   '[^a-z0-9 ]', '', 'g')) AS norm
        FROM documents
    ) n
    """,
)
def d29_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"\s+", " "), "[^a-z0-9 ]", ""
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("raw_chars"),
        F.length(norm).alias("norm_chars"),
        F.substring(norm, 1, 40).alias("norm_prefix"),
        F.md5(norm).alias("norm_fingerprint"),
    )


# --------------------------------------------------------------------------
# D30 — bigram-LM perplexity scoring: the model-free fluency filter an LLM
# data pipeline runs after the d5/d19 surface heuristics (gibberish and
# boilerplate both score as perplexity outliers). The LM is the corpus's
# own MLE bigram model — p(w2|w1) = c(w1 w2) / c(w1 ·) — so every observed
# bigram has positive probability and the score needs no external model.
# Plan shape: one explode to (doc, w1, w2), a map-side-combinable bigram
# count agg, a context re-agg over it (tiny), then two keyed equi-joins
# back to the pairs and a per-doc avg. Everything shuffles on bigram/word
# keys; at 100 TB the bigram table is large but keyed and combinable, and
# a df-cutoff on rare bigrams (the d10 stop-shingle discipline) would cap
# it; no driver state, no UDFs.
# --------------------------------------------------------------------------
@register(
    "d30_perplexity_score",
    oracle="""
    WITH pairs AS (
        SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) d,
             UNNEST(generate_series(1, greatest(len(arr)-1, 0))) AS t(i)
    ), bg AS (
        SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2
    ), ctx AS (
        SELECT w1, SUM(c) AS ctx_c FROM bg GROUP BY w1
    )
    SELECT doc_id,
           COUNT(*)                                          AS n_bigrams,
           ROUND(AVG(-LN(c * 1.0 / ctx_c)), 4)               AS avg_nll,
           ROUND(EXP(AVG(-LN(c * 1.0 / ctx_c))), 2)          AS perplexity
    FROM pairs
    JOIN bg  USING (w1, w2)
    JOIN ctx USING (w1)
    GROUP BY doc_id
    """,
)
def d30_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    n_pairs = F.greatest(F.size(arr) - 1, F.lit(0))
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, n_pairs).alias("w1"),
                F.slice(arr, 2, n_pairs).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # Context totals ride the VOCABULARY-BOUNDED bg table via a w1 window
    # (r16, guide §1.2 step 1 / §2.4): the separate ctx aggregate re-ran
    # bg's whole subtree — a third corpus explode per action — and cost a
    # second scoring join. A window here is skew-safe because its
    # partition is the distinct continuations of one w1 (vocabulary-
    # bounded), NOT the raw pair stream; the model build keeps its
    # map-side-combinable groupBy. Corpus explodes per action: 3 -> 2
    # (model build + scoring probe — the d115 two-pass shape).
    bgw = bg.withColumn(
        "ctx_c", F.sum("c").over(Window.partitionBy("w1"))
    )
    nll = -F.log(F.col("c") / F.col("ctx_c"))
    return (
        pairs.join(bgw, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
            F.round(F.exp(F.avg(nll)), 2).alias("perplexity"),
        )
    )


# --------------------------------------------------------------------------
# D33 — canonical-corpus rewrite: the END of the dedup pipeline. d2 finds
# near-dup pairs, d10 closes them into clusters; this operator finishes the
# job a training pipeline actually needs — pick ONE survivor per cluster
# (highest distinct-token quality, doc_id tie-break, the d1_keep_best
# survivorship rule applied to NEAR-dups) and emit the deduplicated corpus
# profile. Plan shape: the cluster assignment joins back to the corpus on
# doc_id; the survivor rank windows ONLY over clustered docs (never the
# unclustered bulk — no giant NULL-partition window, the a13 trap), then
# one per-lang agg. All shuffles are keyed on doc_id/component/lang.
# --------------------------------------------------------------------------
@register(
    "d33_canonical_corpus",
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
    ), cc AS (
        SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
    ), scored AS (
        SELECT d.doc_id, d.lang, d.n_chars, cc.component,
               len(list_distinct(string_split(d.text, ' '))) * 1.0
                   / len(string_split(d.text, ' ')) AS quality
        FROM documents d LEFT JOIN cc USING (doc_id)
    ), survivors AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (PARTITION BY component
                                      ORDER BY quality DESC, doc_id) AS rk
            FROM scored WHERE component IS NOT NULL
        ) r WHERE rk = 1
    ), kept AS (
        SELECT * FROM scored
        WHERE component IS NULL
           OR doc_id IN (SELECT doc_id FROM survivors)
    )
    SELECT s.lang,
           (SELECT COUNT(*) FROM kept k WHERE k.lang = s.lang)   AS n_kept,
           COUNT(*) - (SELECT COUNT(*) FROM kept k
                       WHERE k.lang = s.lang)                    AS n_removed,
           (SELECT CAST(COALESCE(SUM(k.n_chars), 0) AS BIGINT)
            FROM kept k WHERE k.lang = s.lang)                   AS kept_chars
    FROM scored s
    GROUP BY s.lang
    """,
)
def d33_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lime_on_spark_spark.plans.registry import queries

    clusters = queries()["d10_dup_clusters"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("quality"),
    ).join(clusters, "doc_id", "left")
    w = Window.partitionBy("component").orderBy(F.desc("quality"), F.asc("doc_id"))
    survivors = (
        scored.filter(F.col("component").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    kept = scored.filter(F.col("component").isNull()).unionByName(survivors)
    kept_agg = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    totals = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept_agg, "lang").select(
        "lang",
        "n_kept",
        (F.col("n_total") - F.col("n_kept")).alias("n_removed"),
        "kept_chars",
    )


# --------------------------------------------------------------------------
# D34 — soft decontamination: overlap FRACTION per training doc, not the
# binary any-shingle-hit of d15. Real pipelines tier on the fraction —
# a doc sharing one boilerplate 3-gram with a benchmark is fine; one
# sharing 40% of its shingles is leaked eval data. Plan shape: the d15
# shingle semi-join becomes an inner join + per-doc count, divided by the
# doc's own distinct-shingle count; both sides shuffle on the shingle key,
# then one keyed agg — the same scale discipline as d15 with one extra
# combinable count.
# --------------------------------------------------------------------------
@register(
    "d34_contamination_fraction",
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
    ), bench_sh AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    ), doc_tot AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM sh
        WHERE doc_id % 50 != 0 GROUP BY doc_id
    ), hits AS (
        SELECT s.doc_id, COUNT(*) AS n_hit
        FROM sh s JOIN bench_sh b ON s.shingle = b.shingle
        WHERE s.doc_id % 50 != 0
        GROUP BY s.doc_id
    ), frac AS (
        SELECT t.doc_id,
               COALESCE(h.n_hit, 0) * 1.0 / t.n_shingles AS overlap
        FROM doc_tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
    )
    SELECT CASE WHEN overlap = 0       THEN 'clean'
                WHEN overlap < 0.2     THEN 'low'
                WHEN overlap < 0.6     THEN 'high'
                ELSE 'leaked' END      AS tier,
           COUNT(*)                    AS n_docs,
           ROUND(AVG(overlap), 6)      AS avg_overlap
    FROM frac
    GROUP BY tier
    """,
)
def d34_contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = _word_shingles(docs)
    bench_sh = sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    train_sh = sh.filter(F.col("doc_id") % 50 != 0)
    doc_tot = train_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        train_sh.join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    frac = doc_tot.join(hits, "doc_id", "left").select(
        "doc_id",
        (F.coalesce("n_hit", F.lit(0)) / F.col("n_shingles")).alias("overlap"),
    )
    tier = (
        F.when(F.col("overlap") == 0, "clean")
        .when(F.col("overlap") < 0.2, "low")
        .when(F.col("overlap") < 0.6, "high")
        .otherwise("leaked")
    )
    return (
        frac.groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("overlap"), 6).alias("avg_overlap"),
        )
    )


# --------------------------------------------------------------------------
# D35 — vocabulary coverage / OOV rate: before committing to a tokenizer
# vocabulary, a training pipeline measures what fraction of each document
# falls outside the top-V terms (high OOV => the vocab or the corpus slice
# is wrong). Top-V selection is one combinable count agg + a deterministic
# top-V (count desc, term asc); the per-doc rate is a broadcast semi-join
# of tokens against the tiny vocab. Everything shuffles on the token key;
# the vocab (V rows) broadcasts.
# --------------------------------------------------------------------------
@register(
    "d35_oov_rate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w FROM (
            SELECT w, COUNT(*) AS n FROM toks GROUP BY w
            ORDER BY n DESC, w LIMIT 100
        ) v
    ), per_doc AS (
        SELECT t.doc_id, t.lang,
               COUNT(*) AS n_tok,
               SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM toks t LEFT JOIN vocab v ON t.w = v.w
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           COUNT(*)                                   AS n_docs,
           ROUND(AVG(n_oov * 1.0 / n_tok), 6)         AS avg_oov_rate,
           ROUND(MAX(n_oov * 1.0 / n_tok), 6)         AS max_oov_rate
    FROM per_doc
    GROUP BY lang
    """,
)
def d35_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(100)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    rate = F.col("n_oov") / F.col("n_tok")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(rate), 6).alias("avg_oov_rate"),
        F.round(F.max(rate), 6).alias("max_oov_rate"),
    )


# --------------------------------------------------------------------------
# D36 — two-stage dedup funnel: the production ORDER of dedup passes.
# Exact dedup first (a cheap hash-shuffle that typically removes the bulk),
# THEN the expensive near-dup machinery over the survivors only — never the
# reverse. Stage 2 here uses the deterministic pairwise rule "drop the
# larger doc_id of any >=0.5-Jaccard survivor pair" (the non-transitive
# complement of d33's full cluster treatment, cheap enough to stay
# recursion-free in both engines). Emits the funnel: input -> after-exact
# -> after-near counts, per stage removals.
# --------------------------------------------------------------------------
@register(
    "d36_dedup_funnel",
    oracle="""
    WITH survivors1 AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents GROUP BY md5(text)
    ), s1_docs AS (
        SELECT d.doc_id, d.text FROM documents d
        JOIN survivors1 s ON d.doc_id = s.doc_id
    ), words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM s1_docs
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
    ), near AS (
        SELECT DISTINCT doc_b
        FROM dpairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    )
    SELECT (SELECT COUNT(*) FROM documents)                   AS n_input,
           (SELECT COUNT(*) FROM survivors1)                  AS n_after_exact,
           (SELECT COUNT(*) FROM survivors1)
             - (SELECT COUNT(*) FROM near)                    AS n_after_near,
           (SELECT COUNT(*) FROM documents)
             - (SELECT COUNT(*) FROM survivors1)              AS removed_exact,
           (SELECT COUNT(*) FROM near)                        AS removed_near
    """,
)
def d36_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.jaccard import exact_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    survivors1 = docs.groupBy(F.md5("text").alias("_fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    s1_docs = docs.join(survivors1.select("doc_id"), "doc_id", "left_semi")
    pairs = exact_jaccard_pairs(_word_shingles(s1_docs), threshold=0.5)
    near_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    n_input = docs.agg(F.count(F.lit(1)).alias("n_input"))
    n_s1 = survivors1.agg(F.count(F.lit(1)).alias("n_after_exact"))
    n_near = near_b.agg(F.count(F.lit(1)).alias("removed_near"))
    return (
        n_input.crossJoin(n_s1)
        .crossJoin(n_near)
        .select(
            "n_input",
            "n_after_exact",
            (F.col("n_after_exact") - F.col("removed_near")).alias("n_after_near"),
            (F.col("n_input") - F.col("n_after_exact")).alias("removed_exact"),
            "removed_near",
        )
    )


# --------------------------------------------------------------------------
# D37 — INCREMENTAL dedup: today's delta against the standing corpus. A
# daily 100-TB ingest must not recompute all-pairs; only pairs touching a
# NEW doc can be new. The inverted index therefore joins delta-shingles
# against all-shingles (delta x all, never base x base — the quadratic
# bulk), normalizes each candidate to an unordered (lo, hi) pair, and
# restores exact Jaccard from intersection + sizes. Cost scales with
# |delta| x avg-posting-length, not |corpus|²: the property that makes
# daily dedup affordable. Delta membership is deterministic (doc_id % 10
# = 7 stands in for "arrived today").
# --------------------------------------------------------------------------
@register(
    "d37_incremental_dedup",
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
    ), cand AS (
        SELECT DISTINCT least(d.doc_id, o.doc_id)    AS doc_a,
                        greatest(d.doc_id, o.doc_id) AS doc_b,
                        d.shingle                    AS shingle
        FROM (SELECT * FROM sh WHERE doc_id % 10 = 7) d
        JOIN sh o ON d.shingle = o.shingle AND d.doc_id <> o.doc_id
    ), pairs AS (
        SELECT doc_a, doc_b, COUNT(*) AS inter FROM cand
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard,
           (doc_a % 10 = 7 AND doc_b % 10 = 7)           AS both_new
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    """,
)
def d37_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = _word_shingles(docs).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    delta = sh.filter(F.col("doc_id") % 10 == 7)
    cand = (
        delta.alias("d")
        .join(sh.alias("o"), "h")
        .filter(F.col("d.doc_id") != F.col("o.doc_id"))
        .select(
            F.least("d.doc_id", "o.doc_id").alias("doc_a"),
            F.greatest("d.doc_id", "o.doc_id").alias("doc_b"),
            "h",
        )
        .distinct()
    )
    pairs = cand.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 6).alias("jaccard"),
            ((F.col("doc_a") % 10 == 7) & (F.col("doc_b") % 10 == 7)).alias(
                "both_new"
            ),
        )
    )


# --------------------------------------------------------------------------
# D38 — inter-source duplication matrix: WHERE the near-dups come from.
# Dedup QA at corpus scale is not just "how many pairs" but which source
# pairs copy from each other (wire-service syndication, mirror domains) —
# that decides which source to down-weight or drop entirely. One join of
# the d2 exact-Jaccard pair set against the doc→source map on each
# endpoint, then a keyed count per unordered source pair. The pair set is
# already skew-capped (operators/jaccard.py); this adds two broadcast-able
# dimension joins and one agg.
# --------------------------------------------------------------------------
@register(
    "d38_source_dup_matrix",
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
    ), dpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), edges AS (
        SELECT doc_a, doc_b FROM dpairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
    )
    SELECT least(da.source, db.source)    AS source_a,
           greatest(da.source, db.source) AS source_b,
           COUNT(*)                       AS n_dup_pairs,
           CAST(SUM(CASE WHEN da.source = db.source THEN 1 ELSE 0 END)
                AS BIGINT)                AS n_within_source
    FROM edges
    JOIN documents da ON doc_a = da.doc_id
    JOIN documents db ON doc_b = db.doc_id
    GROUP BY source_a, source_b
    """,
)
def d38_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.registry import queries

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = queries()["d2_ngram_jaccard"](spark, sf_dir).select("doc_a", "doc_b")
    da = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
    )
    db = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
    )
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            F.sum((F.col("sa") == F.col("sb")).cast("int"))
            .cast("bigint")
            .alias("n_within_source"),
        )
    )


# --------------------------------------------------------------------------
# D41 — contamination SPAN detection (the exact-substring flavor of
# decontamination, cf. Lee et al. 2022 "Deduplicating Training Data"):
# d15/d34 ask WHETHER a train doc shares benchmark shingles; this asks HOW
# LONG the longest contiguous overlap is. A run of R consecutive matched
# 3-gram positions is a verbatim span of R+2 tokens — long spans mean
# copied passages, isolated hits mean idiom collisions. Lowering is
# gaps-and-islands: matched positions -> (pos - row_number) island key ->
# per-island length -> per-doc max. Scale: the window partitions by
# doc_id (bounded by doc length), everything else is the d15 semi-join
# skeleton on shingle keys.
# --------------------------------------------------------------------------
@register(
    "d41_contamination_spans",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ), shp AS (
        SELECT w1.doc_id, w1.pos,
               w1.word || ' ' || w2.word || ' ' || w3.word AS shingle
        FROM words w1
        JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
    ), bench AS (
        SELECT DISTINCT shingle FROM shp WHERE doc_id % 50 = 0
    ), matched AS (
        SELECT s.doc_id, s.pos
        FROM shp s JOIN bench b USING (shingle)
        WHERE s.doc_id % 50 != 0
    ), islands AS (
        SELECT doc_id,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM matched
    ), runs AS (
        SELECT doc_id, grp, COUNT(*) AS run FROM islands GROUP BY doc_id, grp
    ), per_doc AS (
        SELECT doc_id, MAX(run) AS max_run FROM runs GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT)                       AS n_docs_hit,
           CAST(SUM(CASE WHEN p.max_run >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_long_span,
           CAST(MAX(p.max_run) + 2 AS BIGINT)             AS max_span_tokens
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """,
)
def d41_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.split("text", " ").alias("tk")).filter(
        F.size("tk") >= 3
    )
    shp = tk.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("tk", i),
                    F.element_at("tk", i + 1),
                    F.element_at("tk", i + 2),
                ),
            )
        ).alias("pos0", "shingle"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "shingle")

    bench = (
        shp.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    )
    matched = (
        shp.filter(F.col("doc_id") % 50 != 0)
        .join(bench, "shingle", "left_semi")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        matched.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.count("*").alias("run"))
    )
    per_doc = runs.groupBy("doc_id").agg(F.max("run").alias("max_run"))
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_hit"),
            F.sum((F.col("max_run") >= 3).cast("int"))
            .cast("bigint")
            .alias("n_long_span"),
            (F.max("max_run") + 2).cast("bigint").alias("max_span_tokens"),
        )
    )


# --------------------------------------------------------------------------
# D45 — hand-rolled banded MinHash-LSH with an EXACT cross-engine oracle.
# The MLlib path (d2_minhash_near_dup) is rows-only because its hash family
# isn't SQL-reproducible; this implementation makes every stage exactly
# checkable: the j-th MinHash of a doc is the lexicographic MIN of
# md5(j || ':' || shingle) — md5 is identical in Spark and DuckDB, and the
# min of a uniform hex hash is a valid min-hash. 12 hashes in 4 bands of 3
# (s-curve threshold (1/4)^(1/3) ~ 0.63); docs sharing any band key become
# candidates via a band-key equi-join (never all-pairs), and only
# candidates get exact-Jaccard verification. This is the verbatim
# band-bucket-join architecture a 100 TB near-dup pass runs: signatures
# are one groupBy(doc_id) shuffle over shingles x 12, band keys another
# keyed agg, and the candidate join is an equi-join on (band, key).
# --------------------------------------------------------------------------
_D45_ORACLE_SQL = """
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
    ), sig AS (
        SELECT doc_id, j,
               MIN(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
        FROM sh CROSS JOIN (SELECT unnest(range(0, 12)) AS j) hashes
        GROUP BY doc_id, j
    ), bands AS (
        SELECT doc_id, j // 3 AS band,
               string_agg(mh, '|' ORDER BY j) AS bkey
        FROM sig GROUP BY doc_id, j // 3
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                    AND a.doc_id < b.doc_id
    ), sz AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT it.doc_a, it.doc_b,
           ROUND(it.i * 1.0 / (sa.n + sb.n - it.i), 4) AS jaccard
    FROM inter it
    JOIN sz sa ON it.doc_a = sa.doc_id
    JOIN sz sb ON it.doc_b = sb.doc_id
    WHERE it.i * 1.0 / (sa.n + sb.n - it.i) >= 0.6
"""


@register("d45_minhash_banded_exact", oracle=_D45_ORACLE_SQL)
def d45_minhash_banded_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = _word_shingles(docs)

    # All 12 minhashes as SIMULTANEOUS map-side-combinable min aggregates
    # over the (doc, shingle) rows — one shuffle of |shingles| rows with 12
    # hash columns, instead of exploding to |shingles| x 12 rows and
    # grouping on (doc_id, j) (measured ~2x at sf0.1). 4 band keys per
    # doc, unpivoted to (doc_id, band, bkey) rows.
    bands = minhash_band_keys(sh, n_hashes=12, rows_per_band=3)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", F.col("bkey")
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", F.col("bkey")
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(jac >= 0.6)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# D2-vs-D45 agreement verdict: the MLlib MinHashLSH arm (d2 — hash family
# not SQL-reproducible, so on its own it only has a rows-only artifact
# plus a brute-force recall gate) pinned against the hand-rolled
# SQL-exact banded twin (d45). Closes the last unpinned LSH arm: the two
# schemes use different hash families (MLlib's universal hashing over
# HashingTF bins vs md5 over raw shingles) and different band layouts
# (5 tables vs 4 bands x 3 rows), so agreement is evidence of CORRECTNESS
# of both, not shared bias. n_ref (d45 pairs at true Jaccard >= 0.7, the
# d2 similarity threshold) is SQL-exact via d45's own oracle CTEs;
# recall_ok / precision_ok gate at 0.9 (measured 1.0 / 1.0 at sf0.001,
# sf0.01 AND sf0.1 — the corpus's planted near-dups sit far enough above
# threshold that both schemes find exactly the same pairs).
# Scale: both sides are banded equi-joins on band keys (never all-pairs);
# the agreement join is |pairs| x |pairs| on (doc_a, doc_b) keys.
# --------------------------------------------------------------------------
@register(
    "d2_vs_d45_agreement",
    oracle=f"""
    WITH d45 AS ({_D45_ORACLE_SQL})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_ref,
           TRUE AS recall_ok, TRUE AS precision_ok
    FROM d45 WHERE jaccard >= 0.7
    """,
)
def d2_vs_d45_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.registry import queries

    qs = queries()
    d2 = (
        qs["d2_minhash_near_dup"](spark, sf_dir)
        .filter(F.col("jaccard_dist") <= 0.3)
        .select("doc_a", "doc_b", F.lit(True).alias("in_d2"))
    )
    d45 = qs["d45_minhash_banded_exact"](spark, sf_dir)
    # ONE full-outer join + ONE aggregation computes all four counts the
    # verdict needs (r16 optimization): the previous four sequential
    # .count() actions executed the d2 LSH lineage three times and d45
    # twice (persist notwithstanding, four driver round-trips). Flags:
    # a d45-side row carries its jaccard (is_ref when >= 0.7, the d2
    # similarity threshold); a d2-side row carries in_d2. Pair
    # multiplicity is preserved exactly (both sides emit distinct pairs),
    # so every count below equals its former standalone action.
    j = (
        d45.select("doc_a", "doc_b", (F.col("jaccard") >= 0.7).alias("is_ref"))
        .join(d2, ["doc_a", "doc_b"], "full_outer")
    )
    in_d45 = F.col("is_ref").isNotNull()
    counts = j.agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("n_ref"),
        F.count(F.when(F.col("in_d2"), 1)).alias("n_d2"),
        F.count(F.when(F.col("is_ref") & F.col("in_d2"), 1)).alias("n_rec"),
        # Precision vs d45's FULL >= 0.6 set: d2's threshold (0.7) is
        # strictly inside it, so every true d2 pair must appear there.
        F.count(F.when(F.col("in_d2") & in_d45, 1)).alias("n_prec"),
    )
    return counts.select(
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.when(
            F.col("n_ref") > 0, F.col("n_rec") / F.col("n_ref") >= 0.9
        ).otherwise(F.lit(False)).alias("recall_ok"),
        F.when(
            F.col("n_d2") > 0, F.col("n_prec") / F.col("n_d2") >= 0.9
        ).otherwise(F.lit(False)).alias("precision_ok"),
    )


_D49_FUNNEL_CTES = """
    WITH train AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 != 0
    ), quality AS (
        SELECT doc_id, text FROM train
        WHERE len(list_distinct(string_split(text, ' '))) * 1.0
              / len(string_split(text, ' ')) >= 0.35
          AND len(string_split(text, ' ')) >= 20
    ), exact AS (
        SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
        FROM quality GROUP BY text
    ), words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM exact
    ), sh AS (
        SELECT DISTINCT w1.doc_id,
               w1.word || ' ' || w2.word || ' ' || w3.word AS shingle
        FROM words w1
        JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
    ), sz AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), neardrop AS (
        SELECT DISTINCT b.doc_id
        FROM (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id) p
        JOIN sz sa ON p.da = sa.doc_id
        JOIN sz sb ON p.db = sb.doc_id
        JOIN exact b ON b.doc_id = p.db
        WHERE p.i * 1.0 / (sa.n + sb.n - p.i) >= 0.8
    ), neardup AS (
        SELECT e.doc_id, e.text FROM exact e
        LEFT JOIN neardrop nd ON e.doc_id = nd.doc_id
        WHERE nd.doc_id IS NULL
    ), bench_sh AS (
        SELECT DISTINCT w1.word || ' ' || w2.word || ' ' || w3.word AS shingle
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents WHERE doc_id % 50 = 0) w1
        JOIN (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents WHERE doc_id % 50 = 0) w2
          ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        JOIN (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents WHERE doc_id % 50 = 0) w3
          ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
    ), contaminated AS (
        SELECT DISTINCT s.doc_id FROM sh s
        JOIN bench_sh b ON s.shingle = b.shingle
        JOIN neardup n ON n.doc_id = s.doc_id
    ), clean AS (
        SELECT n.doc_id, n.text FROM neardup n
        LEFT JOIN contaminated c ON n.doc_id = c.doc_id
        WHERE c.doc_id IS NULL
    )
"""


# --------------------------------------------------------------------------
# D49 — the END-TO-END curation pipeline as one funnel query: quality gate
# -> exact dedup -> near-dup dedup -> decontamination -> packing, emitting
# the per-stage survivor counts a dataset report publishes. Each stage is
# the registry operator's exact rule (d5 quality metrics, d1 min-id
# survivorship, d2 exact 3-gram Jaccard with smaller-id-wins, d15
# benchmark shingle semi-join, d13 token chunking), so this is the
# composition proof: the operators pipeline into one DataFrame program
# with no driver round-trips between stages. Scale = the max of its
# stages (the near-dup self-join dominates; same skeleton as
# d2_ngram_jaccard — at web scale, prepend the d45 banded prefilter).
# --------------------------------------------------------------------------
def _curation_stages(spark: SparkSession, sf_dir: str) -> dict:
    """The d49 funnel's stage frames (train/quality/exact/neardup/clean),
    shared with d93's lakehouse composition so the two rows can never
    drift onto different curation rules. Stage outputs are cached (see
    the persistence note below); `clean` is the curated corpus."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")

    toks = F.split("text", " ")
    quality = train.filter(
        (F.size(F.array_distinct(toks)) / F.size(toks) >= 0.35)
        & (F.size(toks) >= 20)
    )
    # Stage outputs are consumed by BOTH the next stage and the funnel's
    # count row; without persistence every union branch re-executes the
    # entire upstream pipeline (measured 56 s -> ~8 s at sf0.001). A
    # production funnel checkpoints stage outputs to the lake for the same
    # reason; cache() is the single-session analogue.
    exact = quality.groupBy("text").agg(F.min("doc_id").alias("doc_id")).cache()

    sh = _word_shingles(exact).cache()
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("da"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("db"), "shingle")
    pairs = (
        sh_a.join(sh_b, "shingle")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    neardrop = (
        pairs.join(sz.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da")
        .join(sz.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db")
        .filter(jac >= 0.8)
        .select(F.col("db").alias("doc_id"))
        .distinct()
    )
    neardup = exact.join(neardrop, "doc_id", "left_anti").cache()

    bench_sh = _word_shingles(
        docs.filter(F.col("doc_id") % 50 == 0)
    ).select("shingle").distinct()
    contaminated = (
        sh.join(neardup.select("doc_id"), "doc_id", "left_semi")
        .join(bench_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = neardup.join(contaminated, "doc_id", "left_anti").cache()
    return {
        "train": train,
        "quality": quality,
        "exact": exact,
        "neardup": neardup,
        "clean": clean,
    }


@register(
    "d49_curation_funnel",
    oracle=_D49_FUNNEL_CTES + """
    SELECT stage, n FROM (
        SELECT ' 1_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM train
        UNION ALL
        SELECT ' 2_quality', CAST(COUNT(*) AS BIGINT) FROM quality
        UNION ALL
        SELECT ' 3_exact_dedup', CAST(COUNT(*) AS BIGINT) FROM exact
        UNION ALL
        SELECT ' 4_near_dedup', CAST(COUNT(*) AS BIGINT) FROM neardup
        UNION ALL
        SELECT ' 5_decontaminated', CAST(COUNT(*) AS BIGINT) FROM clean
        UNION ALL
        SELECT ' 6_chunks',
               CAST(SUM(CEIL(len(string_split(text, ' ')) / 128.0)) AS BIGINT)
        FROM clean
    ) f
    """,
)
def d49_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _curation_stages(spark, sf_dir)
    train, quality, exact = st["train"], st["quality"], st["exact"]
    neardup, clean = st["neardup"], st["clean"]

    def count_row(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"), F.count("*").cast("bigint").alias("n")
        )

    chunks = clean.agg(
        F.lit(" 6_chunks").alias("stage"),
        F.sum(F.ceil(F.size(F.split("text", " ")) / 128.0))
        .cast("bigint")
        .alias("n"),
    )
    return (
        count_row(" 1_input", train)
        .unionAll(count_row(" 2_quality", quality))
        .unionAll(count_row(" 3_exact_dedup", exact))
        .unionAll(count_row(" 4_near_dedup", neardup))
        .unionAll(count_row(" 5_decontaminated", clean))
        .unionAll(chunks)
    )


# --------------------------------------------------------------------------
# D51 — near-dup THRESHOLD SWEEP in one pass: the tuning tool behind every
# jaccard >= tau choice in this registry. The pair similarities are
# computed ONCE (the d2_ngram_jaccard inverted-index skeleton) and
# bucketed by floor(jaccard*10), so one job answers "how many pairs would
# each threshold keep" — instead of re-running the join per candidate
# threshold. Cumulative counts come from a bounded triangular join over
# the 10-row bucket histogram (the a21 discipline).
# --------------------------------------------------------------------------
@register(
    "d51_threshold_sweep",
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
    ), dpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), sims AS (
        SELECT LEAST(CAST(FLOOR(inter * 10.0 / (sa.n + sb.n - inter))
                          AS BIGINT), 9) AS bucket
        FROM dpairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.1
    ), hist AS (
        SELECT bucket, COUNT(*) AS n_pairs FROM sims GROUP BY bucket
    )
    SELECT h.bucket,
           ROUND(h.bucket / 10.0, 1)     AS tau_lo,
           CAST(h.n_pairs AS BIGINT)     AS n_pairs,
           CAST(SUM(h2.n_pairs) AS BIGINT) AS n_pairs_at_or_above
    FROM hist h JOIN hist h2 ON h2.bucket >= h.bucket
    GROUP BY h.bucket, h.n_pairs
    """,
)
def d51_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = _word_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    dpairs = (
        sh_a.join(sh_b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    sims = (
        dpairs.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(jac >= 0.1)
        .select(
            F.least(F.floor(jac * 10.0), F.lit(9)).cast("bigint").alias("bucket")
        )
    )
    hist = sims.groupBy("bucket").agg(F.count("*").alias("n_pairs"))
    h2 = hist.select(
        F.col("bucket").alias("b2"), F.col("n_pairs").alias("np2")
    )
    return (
        hist.join(F.broadcast(h2), F.col("b2") >= F.col("bucket"))
        .groupBy("bucket", "n_pairs")
        .agg(F.sum("np2").cast("bigint").alias("n_pairs_at_or_above"))
        .select(
            "bucket",
            F.round(F.col("bucket") / 10.0, 1).alias("tau_lo"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            "n_pairs_at_or_above",
        )
    )


# --------------------------------------------------------------------------
# D52 — dedup-weighted EFFECTIVE token count: raw token totals overstate a
# corpus when near-dup clusters exist; the effective count weights each
# doc by 1/|its dup cluster| (so a 5-way duplicated page contributes one
# page worth of tokens — the "epochs-equivalent" accounting data-mixing
# work uses). Clusters come from the d10 connected components; docs in no
# cluster weigh 1. Scale: the CC pass dominates (checkpointed iterative
# min-label); the weighting itself is one broadcast-size join + keyed agg.
# --------------------------------------------------------------------------
@register(
    "d52_effective_tokens",
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
        SELECT s.a AS node, re.r
        FROM sym s JOIN reach re ON s.b = re.node
    ), comp AS (
        SELECT node AS doc_id, MIN(r) AS component
        FROM reach GROUP BY node
    ), csize AS (
        SELECT component, COUNT(*) AS csz FROM comp GROUP BY component
    ), weighted AS (
        SELECT d.lang,
               len(string_split(d.text, ' ')) AS toks,
               CASE WHEN c.doc_id IS NULL THEN 1.0 ELSE 1.0 / s.csz END AS w,
               CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS clustered
        FROM documents d
        LEFT JOIN comp c USING (doc_id)
        LEFT JOIN csize s USING (component)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)          AS n_docs,
           CAST(SUM(clustered) AS BIGINT)    AS n_clustered,
           CAST(SUM(toks) AS BIGINT)         AS raw_tokens,
           ROUND(SUM(toks * w), 2)           AS effective_tokens
    FROM weighted
    GROUP BY lang
    """,
)
def d52_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.registry import queries

    docs = load_table(spark, sf_dir, "documents")
    comp = queries()["d10_dup_clusters"](spark, sf_dir)
    csize = comp.groupBy("component").agg(F.count("*").alias("csz"))
    weighted = (
        docs.join(comp, "doc_id", "left")
        .join(csize, "component", "left")
        .select(
            "lang",
            F.size(F.split("text", " ")).alias("toks"),
            F.when(F.col("component").isNull(), F.lit(1.0))
            .otherwise(1.0 / F.col("csz"))
            .alias("w"),
            F.when(F.col("component").isNull(), 0).otherwise(1).alias(
                "clustered"
            ),
        )
    )
    return weighted.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("clustered").cast("bigint").alias("n_clustered"),
        F.sum("toks").cast("bigint").alias("raw_tokens"),
        F.round(F.sum(F.col("toks") * F.col("w")), 2).alias("effective_tokens"),
    )


# --------------------------------------------------------------------------
# D53 — boilerplate detection: per-source modal leading token sequence
# (the CCNet-style "same header on every page from this crawl" signal). A
# 3-token prefix shared by a large fraction of a source's documents is
# boilerplate, not content; downstream cleaning strips it before dedup so
# near-dup similarity measures content, not chrome. Two keyed aggs + a
# per-source argmax window over the (source, prefix) counts — nothing
# touches full text beyond the first 3 tokens.
# --------------------------------------------------------------------------
@register(
    "d53_boilerplate_prefixes",
    oracle="""
    WITH pref AS (
        SELECT source,
               array_to_string(string_split(text, ' ')[1:3], ' ') AS prefix
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ), counts AS (
        SELECT source, prefix, COUNT(*) AS n
        FROM pref GROUP BY source, prefix
    ), tot AS (
        SELECT source, COUNT(*) AS n_docs FROM pref GROUP BY source
    ), ranked AS (
        SELECT c.source, c.prefix, c.n, t.n_docs,
               row_number() OVER (PARTITION BY c.source
                                  ORDER BY c.n DESC, c.prefix) AS rk
        FROM counts c JOIN tot t USING (source)
    )
    SELECT source,
           prefix                         AS modal_prefix,
           CAST(n AS BIGINT)              AS n_with_prefix,
           CAST(n_docs AS BIGINT)         AS n_docs,
           ROUND(n * 1.0 / n_docs, 4)     AS frac,
           n * 1.0 / n_docs >= 0.2        AS is_boilerplate
    FROM ranked WHERE rk = 1
    """,
)
def d53_boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    pref = docs.filter(F.size(tk) >= 3).select(
        "source",
        F.concat_ws(" ", F.slice(tk, 1, 3)).alias("prefix"),
    )
    counts = pref.groupBy("source", "prefix").agg(F.count("*").alias("n"))
    tot = pref.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("prefix"))
    return (
        counts.join(F.broadcast(tot), "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "source",
            F.col("prefix").alias("modal_prefix"),
            F.col("n").cast("bigint").alias("n_with_prefix"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(F.col("n") / F.col("n_docs"), 4).alias("frac"),
            (F.col("n") / F.col("n_docs") >= 0.2).alias("is_boilerplate"),
        )
    )


# --------------------------------------------------------------------------
# D54 — boilerplate-stripped dedup delta: apply d53's detection (strip the
# modal 3-token prefix from flagged sources) and re-measure exact-dup
# rates. The point of boilerplate removal in a dedup pipeline is exactly
# this delta — shared chrome either masks real duplicates (different
# pages, same header stripped away) or manufactures false ones; the
# before/after pair quantifies it per source.
# --------------------------------------------------------------------------
@register(
    "d54_boilerplate_dedup_delta",
    oracle="""
    WITH pref AS (
        SELECT doc_id, source, text,
               string_split(text, ' ') AS tk,
               array_to_string(string_split(text, ' ')[1:3], ' ') AS prefix
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ), counts AS (
        SELECT source, prefix, COUNT(*) AS n
        FROM pref GROUP BY source, prefix
    ), tot AS (
        SELECT source, COUNT(*) AS n_docs FROM pref GROUP BY source
    ), modal AS (
        SELECT source, prefix AS modal_prefix
        FROM (
            SELECT c.source, c.prefix, c.n, t.n_docs,
                   row_number() OVER (PARTITION BY c.source
                                      ORDER BY c.n DESC, c.prefix) AS rk
            FROM counts c JOIN tot t USING (source)
        ) WHERE rk = 1 AND n * 1.0 / n_docs >= 0.2
    ), cleaned AS (
        SELECT p.source,
               p.text,
               CASE WHEN m.modal_prefix IS NOT NULL
                         AND p.prefix = m.modal_prefix
                    THEN array_to_string(p.tk[4:], ' ')
                    ELSE p.text END AS text_clean
        FROM pref p LEFT JOIN modal m USING (source)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT)       AS dups_before,
           CAST(COUNT(*) - COUNT(DISTINCT text_clean) AS BIGINT) AS dups_after
    FROM cleaned
    GROUP BY source
    """,
)
def d54_boilerplate_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    pref = docs.filter(F.size(tk) >= 3).select(
        "source",
        "text",
        tk.alias("tk"),
        F.concat_ws(" ", F.slice(tk, 1, 3)).alias("prefix"),
    )
    counts = pref.groupBy("source", "prefix").agg(F.count("*").alias("n"))
    tot = pref.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("prefix"))
    modal = (
        counts.join(F.broadcast(tot), "source")
        .withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("n") / F.col("n_docs") >= 0.2))
        .select("source", F.col("prefix").alias("modal_prefix"))
    )
    cleaned = pref.join(F.broadcast(modal), "source", "left").select(
        "source",
        "text",
        F.when(
            F.col("modal_prefix").isNotNull()
            & (F.col("prefix") == F.col("modal_prefix")),
            F.concat_ws(" ", F.slice(F.col("tk"), 4, F.size("tk") - 3)),
        )
        .otherwise(F.col("text"))
        .alias("text_clean"),
    )
    return cleaned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct("text"))
        .cast("bigint")
        .alias("dups_before"),
        (F.count("*") - F.countDistinct("text_clean"))
        .cast("bigint")
        .alias("dups_after"),
    )


#: d84/d87 shared contract: 5-token shingles, 4-shingle winnow window —
#: candidate generation is exact for shared spans >= _SPAN_K + _SPAN_W - 1
#: = 8 tokens.
_SPAN_K, _SPAN_W = 5, 4


def winnow_fingerprints(sh: DataFrame, w: int = _SPAN_W) -> DataFrame:
    """Winnowed fingerprints (Schleimer et al. 2003) over (doc_id, pos,
    shingle) rows: min 32-bit-md5-prefix hash VALUE per w-shingle window
    (full windows only), distinct per doc.

    Value-only min is the tie-break contract: when a window's min hash
    value occurs at several positions, the FINGERPRINT is the value, so
    cross-doc equality survives ties and the fingerprint set is invariant
    to which position "wins" — pinned against a pure-Python mirror in
    tests/test_properties.py. Guarantee: two docs sharing a verbatim
    shingle run covering >= w consecutive windows share >= 1 fingerprint.
    """
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    wdef = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    return (
        sh.select("doc_id", "pos", h.alias("h"))
        .select(
            "doc_id",
            F.min("h").over(wdef).alias("fp"),
            F.count(F.lit(1)).over(wdef).alias("wn"),
        )
        .filter(F.col("wn") == w)
        .select("doc_id", "fp")
        .distinct()
    )


def minhash_band_keys(sh: DataFrame, n_hashes: int = 12,
                      rows_per_band: int = 3) -> DataFrame:
    """d45's banded-LSH keys over (doc_id, shingle) rows: n_hashes
    simultaneous map-side-combinable min-aggregates (hash_j(s) =
    md5("{j}:" || s)), then band key b = mh[rb], ..., mh[rb+r-1] joined
    with '|'. Returns (doc_id, band, bkey).

    Contracts pinned in tests/test_properties.py: the signature is a pure
    function of the shingle SET (order/multiplicity-invariant — min is
    idempotent and commutative), engine-portable (hashlib mirror = the
    DuckDB oracle's derivation), and identical sets share ALL band keys.
    """
    n_bands = n_hashes // rows_per_band
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))).alias(f"h{j}")
            for j in range(n_hashes)
        ],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{j}").alias(f"mh{j}") for j in range(n_hashes)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{rows_per_band * b + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(
        "doc_id", F.explode(band_structs).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"),
             F.col("bs.bkey").alias("bkey"))


def _cross_doc_span_runs(docs: DataFrame) -> DataFrame:
    """Shared d84/d87 machinery: winnowed-fingerprint candidate pairs ->
    candidates-only positional shingle join -> diagonal gaps-and-islands.

    Returns one row per maximal shared run: (da, db, pb0 = run start in
    doc b, span = run tokens), already filtered to the >= 8-token
    exactness contract.
    """
    k, w = _SPAN_K, _SPAN_W
    tk = docs.select("doc_id", F.split("text", " ").alias("tk")).filter(
        F.size("tk") >= k
    )
    sh = tk.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (k - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("tk", i + j) for j in range(k)],
                ),
            )
        ).alias("pos0", "shingle"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "shingle")
    # Four downstream consumers (fingerprints + both verify sides) read the
    # shingle expansion; persist computes it once. No explicit unpersist is
    # possible under the lazy-return contract — the ContextCleaner reclaims
    # the blocks once the returned plan is dereferenced, and bench.py
    # clears the cache between ops.
    sh = sh.persist()

    # Winnowed fingerprints: min 5-gram hash VALUE per 4-window (full
    # windows only). Value-only min — cross-doc equality survives ties, and
    # 32-bit collisions only widen the candidate set.
    fps = winnow_fingerprints(sh, w)
    cand = (
        fps.alias("x")
        .join(fps.alias("y"), "fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db")
        )
        .distinct()
    )

    # Exact verify on candidates only: positional shingle equi-join keyed
    # on (doc, shingle), then diagonal gaps-and-islands.
    a = cand.join(
        sh.select(F.col("doc_id").alias("da"), F.col("pos").alias("pa"), "shingle"),
        "da",
    )
    m = a.join(
        sh.select(F.col("doc_id").alias("db"), F.col("pos").alias("pb"), "shingle"),
        ["db", "shingle"],
    ).select("da", "db", "pa", "pb")
    iw = Window.partitionBy("da", "db", F.col("pa") - F.col("pb")).orderBy("pa")
    return (
        m.withColumn("grp", F.col("pa") - F.row_number().over(iw))
        .groupBy("da", "db", (F.col("pa") - F.col("pb")).alias("diag"), "grp")
        .agg(
            F.min("pb").alias("pb0"),
            (F.count(F.lit(1)) + (k - 1)).alias("span"),
        )
        .filter(F.col("span") >= k + w - 1)
        .select("da", "db", "pb0", "span")
    )



# --------------------------------------------------------------------------
# D84 — cross-document verbatim-span dedup (EXACTSUBSTR, Lee et al. 2022
# "Deduplicating Training Data Makes Language Models Better"): find the
# longest verbatim token span shared by PAIRS OF CORPUS DOCS — the
# within-corpus counterpart to d41's corpus-vs-benchmark spans.
#
# Never doc x doc. Candidate pairs come from winnowed fingerprints
# (Schleimer et al. 2003, the d64 machinery on token 5-grams): each doc
# keeps the min 5-gram hash of every 4-window; any shared run of
# >= 4 consecutive 5-grams (i.e. any span of >= 8 = w + k - 1 tokens)
# contains a full shared window in both docs, whose min hash VALUE is
# selected by both — so fingerprint-value equality finds EVERY pair with a
# span >= 8 tokens (hash collisions only add false candidates, which the
# exact positional verify below kills). Then, on candidates only:
# positional 5-gram equi-join on (doc, shingle), diagonal gaps-and-islands
# (group by pos_a - pos_b, runs over consecutive pos_a — d41's island
# trick lifted to two documents), longest run + 4 = span tokens.
#
# The DuckDB oracle is the NAIVE exhaustive self-join restricted to
# span >= 8 — deliberately a different algorithm, so the bucketed path is
# checked against ground truth rather than a replay of itself.
#
# Scale: fingerprints are ~1/w of shingles per doc (one keyed window, one
# distinct); the candidate join is an equi-join on fp value whose output is
# bounded by true duplicate clusters; the verify join is keyed on
# (doc, shingle). At 100 TB each stage is a keyed shuffle — the published
# suffix-array approach replaced by the winnow-bucket-verify pipeline that
# distributes.
# --------------------------------------------------------------------------
@register(
    "d84_cross_doc_spans",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ), sh AS (
        SELECT w1.doc_id, w1.pos,
               w1.word || ' ' || w2.word || ' ' || w3.word || ' ' ||
               w4.word || ' ' || w5.word AS shingle
        FROM words w1
        JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
        JOIN words w4 ON w1.doc_id = w4.doc_id AND w4.pos = w1.pos + 3
        JOIN words w5 ON w1.doc_id = w5.doc_id AND w5.pos = w1.pos + 4
    ), m AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), isl AS (
        SELECT da, db, pa - pb AS diag,
               pa - row_number() OVER (PARTITION BY da, db, pa - pb
                                       ORDER BY pa) AS grp
        FROM m
    ), runs AS (
        SELECT da, db, COUNT(*) + 4 AS span
        FROM isl GROUP BY da, db, diag, grp
    ), best AS (
        SELECT da, db, MAX(span) AS span FROM runs GROUP BY da, db
        HAVING MAX(span) >= 8
    ), totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST((SELECT COUNT(DISTINCT d) FROM (
                   SELECT da AS d FROM best UNION SELECT db FROM best
               )) AS BIGINT) AS n_affected_docs
        FROM best
    )
    SELECT da AS doc_a, db AS doc_b, CAST(span AS BIGINT) AS span_tokens,
           n_pairs, n_affected_docs
    FROM (SELECT *, row_number() OVER (ORDER BY span DESC, da, db) AS rk
          FROM best), totals
    WHERE rk <= 10
    """,
)
def d84_cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    runs = _cross_doc_span_runs(docs)
    # TWO consumers (the totals agg and the top-10 cut) sit over best;
    # persisting the bounded per-pair frame (one row per duplicate pair)
    # keeps the winnow-candidate-verify pipeline to ONE execution (r16 —
    # it ran once per branch before). ContextCleaner reclaims the blocks
    # on dereference; bench.py clears the cache between ops.
    best = runs.groupBy("da", "db").agg(F.max("span").alias("span")).persist()
    # Explode each pair to its two endpoints: row count = 2 * n_pairs and
    # the distinct endpoints are the affected docs — one agg, no collected
    # arrays (a collect_list of all pairs would not scale).
    totals = best.select(F.explode(F.array("da", "db")).alias("d")).agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_pairs"),
        F.countDistinct("d").cast("bigint").alias("n_affected_docs"),
    )
    top = best.orderBy(F.desc("span"), "da", "db").limit(10)
    return top.crossJoin(F.broadcast(totals)).select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.col("span").cast("bigint").alias("span_tokens"),
        "n_pairs",
        "n_affected_docs",
    )


# --------------------------------------------------------------------------
# D87 — verbatim-span REMOVAL (the Lee et al. 2022 EXACTSUBSTR follow-
# through d84 stops short of): d84 reports the longest shared span per
# pair; d87 actually deduplicates — for every pair the LATER doc (db, by
# doc_id order, so exactly one copy of each span survives corpus-wide)
# has ALL its shared runs cut out. A doc's runs from different partners
# can overlap, so per-doc removal is the size of the UNION of its
# [start, end] intervals, computed with the classic interval-merge
# (running-max-end window -> island when start > previous max — the t3
# gaps-and-islands trick lifted from timestamps to token positions).
# Output: top-10 most-trimmed docs + corpus totals.
#
# Candidate generation is the shared d84 machinery (winnowed
# fingerprints -> candidates-only positional verify, exact for runs
# >= 8 tokens); the oracle replays the NAIVE exhaustive self-join with
# the same interval merge — a different candidate algorithm that must
# land on the same removed-token counts.
#
# Scale: everything after the (bounded) candidate verify is keyed by
# doc_id — the interval-merge window partitions by doc and orders a
# handful of runs per doc. No stage is new relative to d84; at 100 TB
# the cost profile is d84's plus one keyed window over the run set.
# --------------------------------------------------------------------------
@register(
    "d87_span_removal",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ), sh AS (
        SELECT w1.doc_id, w1.pos,
               w1.word || ' ' || w2.word || ' ' || w3.word || ' ' ||
               w4.word || ' ' || w5.word AS shingle
        FROM words w1
        JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
        JOIN words w4 ON w1.doc_id = w4.doc_id AND w4.pos = w1.pos + 3
        JOIN words w5 ON w1.doc_id = w5.doc_id AND w5.pos = w1.pos + 4
    ), m AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), isl AS (
        SELECT da, db, pb, pa - pb AS diag,
               pa - row_number() OVER (PARTITION BY da, db, pa - pb
                                       ORDER BY pa) AS grp
        FROM m
    ), runs AS (
        SELECT db AS doc_id, MIN(pb) AS s,
               MIN(pb) + COUNT(*) + 3 AS e
        FROM isl GROUP BY da, db, diag, grp
        HAVING COUNT(*) + 4 >= 8
    ), ivl AS (
        SELECT DISTINCT doc_id, s, e FROM runs
    ), marked AS (
        SELECT doc_id, s, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max
        FROM ivl
    ), grouped AS (
        SELECT doc_id, s, e,
               SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY s, e) AS g
        FROM marked
    ), merged AS (
        SELECT doc_id, MAX(e) - MIN(s) + 1 AS seg_len
        FROM grouped GROUP BY doc_id, g
    ), per_doc AS (
        SELECT m.doc_id, SUM(m.seg_len) AS removed_tokens,
               len(string_split(d.text, ' ')) AS n_tokens
        FROM merged m JOIN documents d ON m.doc_id = d.doc_id
        GROUP BY m.doc_id, d.text
    ), totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_trimmed,
               CAST(SUM(removed_tokens) AS BIGINT) AS total_removed
        FROM per_doc
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(removed_tokens AS BIGINT) AS removed_tokens,
           CAST(n_tokens - removed_tokens AS BIGINT) AS kept_tokens,
           n_docs_trimmed, total_removed
    FROM (SELECT *, row_number() OVER (ORDER BY removed_tokens DESC,
                                       doc_id) AS rk
          FROM per_doc), totals
    WHERE rk <= 10
    """,
)
def d87_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    runs = _cross_doc_span_runs(docs)
    from lime_on_spark_spark.operators.intervals import merged_interval_lengths

    ivl = runs.select(
        F.col("db").alias("doc_id"),
        F.col("pb0").alias("s"),
        (F.col("pb0") + F.col("span") - 1).alias("e"),
    ).distinct()
    per_doc = merged_interval_lengths(ivl).withColumnRenamed(
        "covered", "removed_tokens"
    )
    sizes = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    # TWO consumers (totals + top-10) over the bounded per-doc frame —
    # persist so the winnow-candidate-verify pipeline and the interval
    # merge run once, not once per branch (the d84 r16 note).
    per_doc = per_doc.join(sizes, "doc_id").persist()
    totals = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_trimmed"),
        F.sum("removed_tokens").cast("bigint").alias("total_removed"),
    )
    top = per_doc.orderBy(F.desc("removed_tokens"), "doc_id").limit(10)
    return top.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("removed_tokens").cast("bigint").alias("removed_tokens"),
        (F.col("n_tokens") - F.col("removed_tokens"))
        .cast("bigint")
        .alias("kept_tokens"),
        "n_docs_trimmed",
        "total_removed",
    )


# --------------------------------------------------------------------------
# D85 — Unicode normalization (NFC + zero-width strip): the step d29's
# ASCII-oriented cleanup silently lacks for real multilingual data, where
# decomposed accents (e + U+0301 vs é) and zero-width characters make
# visually identical docs hash as distinct and defeat d1 exact dedup.
# Normalization runs as ONE Arrow-batched mapInPandas stage (pandas
# str.translate for the zero-width strip, unicodedata.normalize('NFC') per
# string — no per-row Python UDF, no shuffle); the per-lang before/after
# dedup profile (the d54 pattern) is a keyed agg. DuckDB's nfc_normalize
# is the oracle twin — both engines implement standard NFC, pinned
# equal on this corpus and on the planted non-NFC fixtures in
# tests/test_datapipe_qa.py (this corpus is pure ASCII, so here the row
# certifies normalization is a no-op: docs_changed = dedup_delta = 0).
# Scale: a linear scan stage; at 100 TB this is exactly where you want it —
# fused before the d1 hash, no extra pass.
# --------------------------------------------------------------------------
@register(
    "d85_unicode_normalize",
    oracle="""
    WITH norm AS (
        SELECT lang, text,
               nfc_normalize(replace(replace(replace(replace(text,
                   chr(8203), ''), chr(8204), ''), chr(8205), ''),
                   chr(65279), '')) AS text_norm
        FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN text_norm != text THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_changed,
           CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS dups_before,
           CAST(COUNT(*) - COUNT(DISTINCT text_norm) AS BIGINT) AS dups_after,
           CAST(COUNT(DISTINCT text) - COUNT(DISTINCT text_norm)
                AS BIGINT) AS dedup_delta
    FROM norm GROUP BY lang
    """,
)
def d85_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")

    def norm_batches(batches):
        import unicodedata

        import pandas as pd  # noqa: F401  (module-level under Arrow)

        zw = dict.fromkeys((0x200B, 0x200C, 0x200D, 0xFEFF))
        for pdf in batches:
            out = pdf.copy()
            out["text_norm"] = (
                out["text"]
                .str.translate(zw)
                .map(lambda t: unicodedata.normalize("NFC", t))
            )
            yield out

    normed = docs.mapInPandas(
        norm_batches, "lang string, text string, text_norm string"
    )
    return normed.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("text_norm") != F.col("text")).cast("int"))
        .cast("bigint")
        .alias("docs_changed"),
        (F.count(F.lit(1)) - F.countDistinct("text"))
        .cast("bigint")
        .alias("dups_before"),
        (F.count(F.lit(1)) - F.countDistinct("text_norm"))
        .cast("bigint")
        .alias("dups_after"),
        (F.countDistinct("text") - F.countDistinct("text_norm"))
        .cast("bigint")
        .alias("dedup_delta"),
    )


# --------------------------------------------------------------------------
# D89 — HTML/markup extraction (the trafilatura/jusText curation stage):
# real crawl feeds arrive as markup, not clean text. The extractor is ONE
# Arrow-batched mapInPandas stage: (1) drop <script>/<style>/<title>
# blocks, (2) split on block-level tags, (3) per block, link density =
# |anchor text| / |tag-stripped text| — blocks over 0.5 are boilerplate
# (nav bars, footers, link lists) and are dropped, (4) surviving blocks
# are tag-stripped, whitespace-collapsed, joined. The corpus is markup-
# free (the row certifies extraction is an exact no-op on it — the d85
# no-op discipline), so literal HTML fixture docs are UNIONED IN on both
# sides: the SAME Python list renders into the oracle's VALUES clause,
# and the oracle replays the whole pipeline as a DuckDB regexp_replace /
# string_split_regex chain (RE2 — no backreferences, so script/style/
# title are three separate replaces). Per-source deltas are therefore
# nonzero IN THE ROW at every SF, hash-pinned across two independent
# implementations.
# Scale: a linear scan stage, no shuffle before the final per-source agg
# — at 100 TB this fuses exactly where d85 does, before the d1 hash.
# --------------------------------------------------------------------------

#: (doc_id, source, html) fixture docs — single-line, apostrophe-free so
#: the same literals embed in the oracle SQL verbatim. Each exercises a
#: different boilerplate shape: nav+footer link bars, inline low-density
#: link, link-list <li> items, script/style/title stripping.
_D89_FIXTURES = [
    (
        -(3 * i + 1),
        "html_fixture",
        f'<html><head><title>Page {i}</title><style>body {{ color: red; }}'
        f'</style></head><body><div><a href="/">Home</a> <a href="/about">'
        f'About</a> <a href="/contact">Contact</a></div><p>spark engine doc '
        f'{i} discusses shuffle partitions and broadcast joins in depth</p>'
        f'<div>footer <a href="/terms">Terms</a> <a href="/privacy">Privacy'
        f'</a></div></body></html>',
    )
    for i in range(4)
] + [
    (
        -(3 * i + 2),
        "html_fixture",
        f'<html><body><p>the query optimizer for corpus {i} pushes filters '
        f'below joins and prunes columns at scan time see <a href="/docs">'
        f'documentation</a> for details on adaptive execution</p>'
        f'<script>var x = {i};</script></body></html>',
    )
    for i in range(4)
] + [
    (
        -(3 * i + 3),
        "html_fixture",
        f'<html><body><ul><li><a href="/a">Alpha</a></li><li><a href="/b">'
        f'Beta</a></li></ul><p>partition pruning round {i} works with '
        f'dynamic runtime filters</p></body></html>',
    )
    for i in range(4)
]

_D89_BLOCK_SPLIT = r"</?(?:html|head|body|div|p|ul|li|h1)[^>]*>"
_D89_VALUES = ",\n            ".join(
    f"({d}, '{s}', '{t}')" for d, s, t in _D89_FIXTURES
)

# CONTRACT: doc_id is unique within `documents` (and the fixture ids are
# negative, disjoint from the corpus). The oracle aggregates kept blocks by
# (doc_id, source) and left-joins back per document row, so a duplicate
# doc_id would double-count extracted_len on the oracle side only. The same
# uniqueness assumption orders d90's prefix sum. Pinned by
# tests/test_properties.py::test_documents_doc_id_unique.
_D89_ORACLE = f"""
    WITH fixtures(doc_id, source, text) AS (VALUES
            {_D89_VALUES}
    ), all_docs AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL SELECT doc_id, source, text FROM fixtures
    ), nos AS (
        SELECT doc_id, source, text,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '<script[^>]*>.*?</script>', '', 'g'),
                   '<style[^>]*>.*?</style>', '', 'g'),
                   '<title[^>]*>.*?</title>', '', 'g') AS clean
        FROM all_docs
    ), blocks AS (
        SELECT doc_id, source,
               unnest(string_split_regex(clean,
                   '{_D89_BLOCK_SPLIT}')) AS frag
        FROM nos
    ), scored AS (
        SELECT doc_id, source,
               trim(regexp_replace(regexp_replace(frag,
                   '<[^>]+>', ' ', 'g'), ' +', ' ', 'g')) AS btxt,
               COALESCE(array_to_string(regexp_extract_all(frag,
                   '<a[^>]*>([^<]*)</a>', 1), ''), '') AS ltxt
        FROM blocks
    ), kept AS (
        SELECT doc_id, source,
               SUM(length(btxt)) + COUNT(*) - 1 AS extracted_len
        FROM scored
        WHERE length(btxt) > 0 AND 2 * length(ltxt) <= length(btxt)
        GROUP BY doc_id, source
    ), per_doc AS (
        SELECT d.source,
               length(d.text) AS raw_len,
               regexp_matches(d.text, '<[a-zA-Z!/]') AS has_markup,
               COALESCE(k.extracted_len, 0) AS extracted_len
        FROM all_docs d LEFT JOIN kept k USING (doc_id, source)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN has_markup THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_markup,
           CAST(SUM(raw_len) AS BIGINT) AS chars_raw,
           CAST(SUM(extracted_len) AS BIGINT) AS chars_extracted,
           CAST(SUM(raw_len - extracted_len) AS BIGINT) AS chars_removed
    FROM per_doc GROUP BY source
"""


@register("d89_markup_extraction", oracle=_D89_ORACLE)
def d89_markup_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    fixtures = spark.createDataFrame(
        _D89_FIXTURES, "doc_id bigint, source string, text string"
    )
    all_docs = docs.unionByName(fixtures)

    def extract_batches(batches):
        import re

        import pandas as pd  # noqa: F401  (module-level under Arrow)

        strip_blocks = [
            re.compile(r"<script[^>]*>.*?</script>"),
            re.compile(r"<style[^>]*>.*?</style>"),
            re.compile(r"<title[^>]*>.*?</title>"),
        ]
        block_split = re.compile(_D89_BLOCK_SPLIT)
        tag = re.compile(r"<[^>]+>")
        anchor = re.compile(r"<a[^>]*>([^<]*)</a>")
        spaces = re.compile(r" +")

        def extracted_len(text: str) -> int:
            clean = text
            for pat in strip_blocks:
                clean = pat.sub("", clean)
            kept = []
            for frag in block_split.split(clean):
                # strip(" "), not strip(): DuckDB's trim() removes spaces
                # only, and this row is hash-pinned against that oracle —
                # bare strip() would diverge on a block edged by \n or \t.
                btxt = spaces.sub(" ", tag.sub(" ", frag)).strip(" ")
                if not btxt:
                    continue
                ltxt = "".join(anchor.findall(frag))
                if 2 * len(ltxt) <= len(btxt):
                    kept.append(btxt)
            return len(" ".join(kept))

        markup = re.compile(r"<[a-zA-Z!/]")
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "source": pdf["source"],
                    "raw_len": pdf["text"].str.len().astype("int64"),
                    "has_markup": pdf["text"].map(
                        lambda t: markup.search(t) is not None
                    ),
                    "extracted_len": pdf["text"].map(extracted_len).astype(
                        "int64"
                    ),
                }
            )

    per_doc = all_docs.mapInPandas(
        extract_batches,
        "source string, raw_len bigint, has_markup boolean,"
        " extracted_len bigint",
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("has_markup").cast("int")).cast("bigint").alias(
            "docs_with_markup"
        ),
        F.sum("raw_len").cast("bigint").alias("chars_raw"),
        F.sum("extracted_len").cast("bigint").alias("chars_extracted"),
        F.sum(F.col("raw_len") - F.col("extracted_len"))
        .cast("bigint")
        .alias("chars_removed"),
    )


# --------------------------------------------------------------------------
# D90 — GLOBAL concat packing (the GPT-style pretraining layout): the
# whole corpus is concatenated in doc_id order and chopped into fixed
# W-token training windows, docs crossing window boundaries — zero pad
# waste, the packing most LLM pipelines actually train on. d14 stays
# document-local precisely because a global cumsum via one window is a
# single-reducer sort at 100 TB; THIS row removes that funnel with the
# exact distributed prefix sum (operators/prefix_sum.py: range partition
# + per-partition windows + O(#partitions) driver offsets) — the same
# two-pass scan d86 uses, now carrying the packing layout. Per window:
# docs starting in it, their token mass, and how many docs straddle its
# right boundary. The DuckDB oracle is the plain global-window spelling
# (the scan's output is partitioning-invariant, the d86 contract).
# Scale: one range shuffle on doc_id + one keyed agg; no single-task
# stage anywhere.
# --------------------------------------------------------------------------
@register(
    "d90_global_concat_pack",
    oracle="""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), cum AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS cum_before
        FROM toks
    )
    SELECT CAST(floor(cum_before / 512) AS BIGINT) AS window_id,
           CAST(COUNT(*) AS BIGINT)                AS n_docs_started,
           CAST(SUM(n_tokens) AS BIGINT)           AS tokens_started,
           CAST(MIN(doc_id) AS BIGINT)             AS first_doc,
           CAST(MAX(doc_id) AS BIGINT)             AS last_doc,
           CAST(SUM(CASE WHEN floor(cum_before / 512)
                          != floor((cum_before + n_tokens - 1) / 512)
                     THEN 1 ELSE 0 END) AS BIGINT) AS boundary_crossers
    FROM cum GROUP BY window_id
    """,
)
def d90_global_concat_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.prefix_sum import ordered_prefix_sum

    W = 512
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    cum = ordered_prefix_sum(toks, "doc_id", ["n_tokens"]).withColumn(
        "cum_before", F.col("cum_n_tokens") - F.col("n_tokens")
    )
    win = F.floor(F.col("cum_before") / W)
    return (
        cum.withColumn("window_id", win.cast("bigint"))
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_started"),
            F.sum("n_tokens").cast("bigint").alias("tokens_started"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
            F.sum(
                (
                    F.floor(F.col("cum_before") / W)
                    != F.floor(
                        (F.col("cum_before") + F.col("n_tokens") - 1) / W
                    )
                ).cast("int")
            )
            .cast("bigint")
            .alias("boundary_crossers"),
        )
    )


# --------------------------------------------------------------------------
# D93 — curated-lakehouse flagship: the composition a real pipeline IS.
# The d49 funnel's survivors are written THROUGH the s12 manifest sink
# (range-partitioned by doc_id into 4 files, so the s16 writer zone maps
# are disjoint) and the analytics question is answered via the SKIPPING
# READER: a doc_id band predicate zone-prunes whole files on the read
# back (skipping_effective pinned TRUE — the connector stack serves the
# pipeline, not just itself). The full readback count re-proves write
# conservation; the band aggregate is SQL-exact (the oracle replays the
# funnel CTEs verbatim — shared _D49_FUNNEL_CTES, so the two rows can
# never drift onto different curation rules).
# Scale: curate once, land with stats, answer every later band query by
# reading the zone — the 100 TB shape this registry's connector rows
# exist for.
# --------------------------------------------------------------------------
@register(
    "d93_curated_lakehouse",
    oracle=_D49_FUNNEL_CTES + """
    , toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM clean
    ), thresh AS (
        SELECT CAST(FLOOR(MAX(doc_id) / 4.0) AS BIGINT) AS t FROM toks
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM toks)     AS n_curated,
           (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM toks) AS total_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM toks WHERE doc_id < (SELECT t FROM thresh)) AS band_docs,
           (SELECT CAST(SUM(n_tokens) AS BIGINT)
            FROM toks WHERE doc_id < (SELECT t FROM thresh)) AS band_tokens,
           CAST(4 AS BIGINT)                                AS files_total,
           TRUE                                             AS skipping_effective
    """,
)
def d93_curated_lakehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.plans.sources_sinks import (
        _register_manifest_classes,
        _scratch,
    )
    from lime_on_spark_spark.session import temp_conf

    _register_manifest_classes(spark)
    clean = _curation_stages(spark, sf_dir)["clean"]
    curated = clean.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"), "text"
    )
    path = _scratch(spark, "d93_lake")
    (
        # Range partitioning by doc_id -> 4 files with DISJOINT doc_id
        # zones in the manifest stats (the s16 layout rule: cluster the
        # column you band-filter on).
        curated.repartitionByRange(4, "doc_id")
        .write.format("json_manifest_sink")
        .option("path", path)
        # Zone stats only on the band-filter columns: min/max over `text`
        # would embed two full document bodies per file in every snapshot.
        .option("stats_columns", "doc_id,n_tokens")
        .mode("append")
        .save()
    )
    threshold = curated.agg(F.max("doc_id")).first()[0] // 4
    with temp_conf(spark, "spark.sql.python.filterPushdown.enabled", "true"):
        back = (
            spark.read.format("json_manifest_source")
            .option("path", path)
            .load()
        )
        # Write conservation: every curated row is readable back.
        n_curated = back.count()
        total_tokens = back.agg(F.sum("n_tokens")).first()[0]
        band = (
            back.filter(F.col("doc_id") < threshold)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("band_docs"),
                F.sum("n_tokens").cast("bigint").alias("band_tokens"),
                F.min("n_files_read").cast("bigint").alias("files_read"),
                F.min("n_files_total").cast("bigint").alias("files_total"),
            )
            .first()
        )
    return spark.createDataFrame(
        [
            (
                n_curated, total_tokens,
                band["band_docs"], band["band_tokens"],
                band["files_total"],
                bool(band["files_read"] < band["files_total"]),
            )
        ],
        "n_curated bigint, total_tokens bigint, band_docs bigint,"
        " band_tokens bigint, files_total bigint,"
        " skipping_effective boolean",
    )


# --------------------------------------------------------------------------
# D102 — interpolated KNESER-NEY bigram model: the smoothing that actually
# ships in n-gram LMs (KenLM / SRILM default) and the perplexity-filter
# upgrade over d30's add-k: absolute discounting (D = 0.75) frees mass
# from every observed bigram, and the freed mass backs off NOT to raw
# unigram frequency but to the CONTINUATION probability — how many
# distinct contexts a word follows (the "San Francisco" argument:
# "Francisco" is frequent but predictable from one context only, so its
# continuation weight is tiny). All four ingredients are keyed
# aggregates over one bigram extraction:
#   c(w1,w2);  c(w1) = Σ_w2 c(w1,w2);  N1+(w1·) = |{w2: c>0}|;
#   N1+(·w2) = |{w1: c>0}|;  T = total bigram types;
#   P_kn = max(c-D,0)/c(w1) + D·N1+(w1·)/c(w1) · N1+(·w2)/T.
# Scale: the model is three shuffles on token keys (bigram, w1, w2) —
# vocabulary-bounded, never corpus-bounded; the same shape as d9/d59.
# --------------------------------------------------------------------------
@register(
    "d102_kneser_ney",
    oracle="""
    WITH pairs AS (
        SELECT arr[i] AS w1, arr[i+1] AS w2
        FROM (SELECT string_split(text, ' ') AS arr FROM documents) d,
             UNNEST(generate_series(1, greatest(len(arr)-1, 0))) AS t(i)
    ), bi AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2
    ), ctx AS (
        SELECT w1, SUM(c12) AS c1, COUNT(*) AS fw FROM bi GROUP BY w1
    ), bw AS (
        SELECT w2, COUNT(*) AS nbw FROM bi GROUP BY w2
    ), tot AS (SELECT COUNT(*) AS t FROM bi)
    SELECT b.w1 || ' ' || b.w2                       AS bigram,
           CAST(b.c12 AS BIGINT)                     AS n,
           ROUND(GREATEST(b.c12 - 0.75, 0) / ctx.c1
                 + 0.75 * ctx.fw / ctx.c1 * (bw.nbw / tot.t), 6) AS p_kn
    FROM bi b
    JOIN ctx USING (w1)
    JOIN bw USING (w2)
    CROSS JOIN tot
    ORDER BY n DESC, bigram
    LIMIT 15
    """,
)
def d102_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    n_pairs = F.greatest(F.size(arr) - 1, F.lit(0))
    pair = F.zip_with(
        F.slice(arr, 1, n_pairs),
        F.slice(arr, 2, n_pairs),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = (
        docs.select(F.explode(pair).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("fw")
    )
    bw = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("nbw"))
    tot = bi.agg(F.count(F.lit(1)).alias("t"))
    # Same expression shape and association order as the oracle so the
    # IEEE double results agree past the 6-dp rounding boundary.
    p_kn = F.round(
        F.greatest(F.col("c12") - 0.75, F.lit(0.0)) / F.col("c1")
        + 0.75 * F.col("fw") / F.col("c1") * (F.col("nbw") / F.col("t")),
        6,
    )
    return (
        bi.join(ctx, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c12").cast("bigint").alias("n"),
            p_kn.alias("p_kn"),
        )
        .orderBy(F.desc("n"), "bigram")
        .limit(15)
    )


# --------------------------------------------------------------------------
# D103 — ROUGE-2 overlap scoring: the n-gram eval primitive
# (summarization / paraphrase-mining / eval-contamination triage all
# reduce to it). Candidate/reference pairs are adjacent docs (even
# doc_id d vs d+1 — deterministic on both sides); per pair the CLIPPED
# bigram intersection Σ_g min(c_cand, c_ref) yields precision (÷
# candidate bigrams), recall (÷ reference bigrams) and F1. Multiset
# clipping is the part naive overlap joins get wrong (a bigram repeated
# 5× in the candidate but once in the reference contributes 1, not 5) —
# the LEAST() on joined per-doc counts is exactly that clip.
# Scale: bigram-count frames are keyed by (doc, bigram); the pair join
# is an equi-join on (bigram, pairing key) — vocabulary-sized shuffles,
# never all-pairs; the d9/d102 family shape.
# --------------------------------------------------------------------------
@register(
    "d103_rouge_overlap",
    oracle="""
    WITH pairs AS (
        SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS arr
              FROM documents) d,
             UNNEST(generate_series(1, greatest(len(arr)-1, 0))) AS t(i)
    ), bc AS (
        SELECT doc_id, bigram, COUNT(*) AS c
        FROM pairs GROUP BY doc_id, bigram
    ), totals AS (
        SELECT doc_id, SUM(c) AS total FROM bc GROUP BY doc_id
    ), inter AS (
        SELECT cand.doc_id AS pair_id,
               SUM(LEAST(cand.c, ref.c)) AS n_inter
        FROM bc cand
        JOIN bc ref ON cand.bigram = ref.bigram
                   AND ref.doc_id = cand.doc_id + 1
        WHERE cand.doc_id % 2 = 0
        GROUP BY cand.doc_id
    )
    SELECT i.pair_id,
           CAST(i.n_inter AS BIGINT)                     AS n_inter,
           ROUND(i.n_inter / tc.total, 6)                AS p,
           ROUND(i.n_inter / tr.total, 6)                AS r,
           ROUND(CASE WHEN i.n_inter = 0 THEN 0.0
                 ELSE 2.0 * (i.n_inter / tc.total) * (i.n_inter / tr.total)
                      / (i.n_inter / tc.total + i.n_inter / tr.total)
                 END, 6)                                 AS f1
    FROM inter i
    JOIN totals tc ON tc.doc_id = i.pair_id
    JOIN totals tr ON tr.doc_id = i.pair_id + 1
    ORDER BY f1 DESC, pair_id
    LIMIT 10
    """,
)
def d103_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    n_pairs = F.greatest(F.size(arr) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(arr, 1, n_pairs),
        F.slice(arr, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bc = (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Per-doc totals ride the bc rows via a doc_id window (r16, guide
    # §1.2 step 1 / §2.4): a separate totals aggregate was consumed by
    # TWO projections (t_cand, t_ref), each re-running the corpus
    # tokenize+explode subtree — the executed plan scanned documents 3x
    # per action. Every bigram row of a doc carries the same total, so
    # min() through the intersection groupBy recovers it exactly and the
    # two join-backs disappear with the extra passes.
    bcw = bc.withColumn(
        "total", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    cand = bcw.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("pair_id"), "bigram",
        F.col("c").alias("c_cand"), F.col("total").alias("t_cand"),
    )
    # Only odd doc_ids can be references (pair_id = doc_id - 1 must be
    # even) — filtering BEFORE the join halves the shuffled ref side.
    ref = bcw.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("pair_id"), "bigram",
        F.col("c").alias("c_ref"), F.col("total").alias("t_ref"),
    )
    inter = (
        cand.join(ref, ["pair_id", "bigram"])
        .groupBy("pair_id")
        .agg(
            F.sum(F.least("c_cand", "c_ref")).alias("n_inter"),
            F.min("t_cand").alias("t_cand"),
            F.min("t_ref").alias("t_ref"),
        )
    )
    p = F.col("n_inter") / F.col("t_cand")
    r = F.col("n_inter") / F.col("t_ref")
    f1 = F.when(F.col("n_inter") == 0, F.lit(0.0)).otherwise(
        2.0 * p * r / (p + r)
    )
    return (
        inter
        .select(
            "pair_id",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.round(p, 6).alias("p"),
            F.round(r, 6).alias("r"),
            F.round(f1, 6).alias("f1"),
        )
        .orderBy(F.desc("f1"), "pair_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# D105 — PHRASE SEARCH over a positional index: BM25 (d-family) ranks by
# bag-of-words, but "exact phrase" queries need POSITIONS — the classic
# inverted-index shape where term postings carry (doc, position) and a
# two-term phrase match is the equi-join postings(t1) ⋈ postings(t2) ON
# (doc, pos2 = pos1 + 1). The query phrase is data-derived but
# deterministic on both sides (the corpus's most frequent bigram,
# lexicographic tie-break), and the postings are built ONLY for the two
# query terms — the filter-before-index-scan discipline that makes a
# phrase query cheap at 100 TB (posting lists for two terms, never the
# corpus). Per-doc occurrence counts and the doc-frequency summary are
# pinned against the oracle's independent full-bigram recount.
# Scale: two term-filtered posting scans + one (doc, pos) equi-join —
# cost ∝ the two posting lists; the corpus is touched once to build
# them and never joined against itself.
# --------------------------------------------------------------------------
@register(
    "d105_phrase_search",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ), bi AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c
        FROM words a JOIN words b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY a.w, b.w
    ), q AS (
        SELECT w1, w2 FROM bi ORDER BY c DESC, w1, w2 LIMIT 1
    ), matches AS (
        SELECT a.doc_id, COUNT(*) AS n
        FROM words a
        JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        CROSS JOIN q
        WHERE a.w = q.w1 AND b.w = q.w2
        GROUP BY a.doc_id
    )
    SELECT (SELECT w1 FROM q)                          AS term1,
           (SELECT w2 FROM q)                          AS term2,
           CAST(COUNT(*) AS BIGINT)                    AS n_docs,
           CAST(SUM(n) AS BIGINT)                      AS n_occurrences,
           CAST(MAX(n) AS BIGINT)                      AS max_per_doc
    FROM matches
    """,
)
def d105_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    # Deterministic query phrase: the most frequent bigram.
    arr = F.split("text", " ")
    n_pairs = F.greatest(F.size(arr) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(arr, 1, n_pairs),
        F.slice(arr, 2, n_pairs),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    top = (
        docs.select(F.explode(bigrams).alias("p"))
        .groupBy("p.w1", "p.w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w1", "w2")
        .first()
    )
    t1, t2 = top["w1"], top["w2"]
    # Postings for the two query terms ONLY — the pushdown that keeps a
    # phrase query posting-list-sized.
    p1 = words.filter(F.col("w") == t1).select("doc_id", "pos")
    p2 = words.filter(F.col("w") == t2).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    per_doc = (
        p1.join(p2, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_doc.agg(
        F.lit(t1).alias("term1"),
        F.lit(t2).alias("term2"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_occurrences"),
        F.max("n").cast("bigint").alias("max_per_doc"),
    )


# --------------------------------------------------------------------------
# D112 — OKAPI BM25 ranking (Robertson et al., TREC-3): the retrieval
# scorer that completes the search stack next to d16's TF-IDF and
# d105's phrase postings — BM25 is what production keyword search
# actually ranks with (tf saturation via k1, length normalization via
# b). Query = three planted terms with very different document
# frequencies ('dup' is rare -> high idf, so the idf term is
# load-bearing). Postings are built for the QUERY TERMS ONLY (the d105
# discipline — the corpus is never fully inverted for a 3-term query);
# df/idf/avgdl are 3-row/1-row broadcast scalars; top-20 by (rounded
# score desc, doc_id) is TakeOrderedAndProject. Scores are rounded to 6
# BEFORE the rank on both engines (the d3 frontier contract).
# Scale: one token explode filtered to query terms at scan stage, one
# (doc, term) count shuffle over matching postings only, broadcast
# scalars, top-k — no corpus self-join, no full inverted index.
# --------------------------------------------------------------------------
_D112_TERMS = ("spark", "vector", "dup")
_D112_K1, _D112_B = 1.2, 0.75


@register(
    "d112_bm25_ranking",
    oracle="""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM docs
    ), tf AS (
        SELECT doc_id, tok AS term, COUNT(*) AS tf, MIN(dl) AS dl
        FROM (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl
              FROM docs)
        WHERE tok IN ('spark', 'vector', 'dup')
        GROUP BY doc_id, tok
    ), idf AS (
        SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
        FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats
    ), scored AS (
        SELECT tf.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               ROUND(SUM(idf.idf * tf.tf * (1.2 + 1)
                         / (tf.tf + 1.2 * (1 - 0.75
                            + 0.75 * tf.dl / (SELECT avgdl FROM stats)))),
                     6) AS bm25
        FROM tf JOIN idf USING (term)
        GROUP BY tf.doc_id
    )
    SELECT doc_id, n_terms, bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def d112_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    k1, b = _D112_K1, _D112_B
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    # The postings table is the QUERY-TERM inverted index — bounded at
    # |docs| x |query terms| rows of (doc_id, term, tf, dl), tiny next to
    # the corpus it summarizes. It feeds BOTH the df/idf aggregate and the
    # scoring join; persisted so the tokenize+explode corpus pass runs
    # ONCE per action (r16, guide §1.2 step 1 — measured: the executed
    # plan re-ran the posting build under each consumer, 4 corpus scans
    # per action with ReusedExchange never firing). The ContextCleaner
    # reclaims the blocks on dereference (the prefix_sum.py note).
    tf = (
        docs.select(
            "doc_id", F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .filter(F.col("term").isin(*_D112_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
        .persist()
    )
    # avgdl rides the <= |terms|-row idf broadcast (same 1-row stats value
    # on every row) instead of a second broadcast of the stats subtree —
    # that second consumer re-scanned the corpus too.
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                1 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(
                F.sum(
                    F.col("idf") * F.col("tf") * (k1 + 1)
                    / (
                        F.col("tf")
                        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("bm25"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)


# --------------------------------------------------------------------------
# D114 — length-bucketed dynamic batching: group d13's context chunks
# into length bands (ceil(len/8)*8 — the bucketed-padding trick of
# fairseq/HF group_by_length) and form fixed-size batches of 32 inside
# each (band, shard); a batch pads every member to ITS OWN max, so the
# census prices exactly the accelerator waste dynamic padding leaves
# behind. The pad_frac per band is the number a batching config review
# reads — a wide band (or no banding) shows up as pad_frac blowing up.
# Banding quantizes chunk length (1..40) to 5 bands, so the batching
# window is partitioned (band x md5-shard of doc_id, 8 shards) — the m8
# discipline: no partition-less window at any scale, and per-worker
# batching is the production shape anyway.
# Scale: d13's chunker is scan-stage; one keyed window + two keyed aggs,
# all on (band, shard) — chunk text never shuffles (only ids + counts).
# --------------------------------------------------------------------------
@register(
    "d114_length_bucketed_batching",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               CAST((s - 1) / 30 AS BIGINT)     AS chunk_id,
               len(list_slice(toks, s, s + 39)) AS n_tokens
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
             UNNEST(generate_series(1, len(toks), 30)) AS t(s)
    ), banded AS (
        SELECT doc_id, chunk_id, n_tokens,
               CAST(CEIL(n_tokens / 8.0) * 8 AS BIGINT)   AS band,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8                        AS shard
        FROM chunks
    ), rn AS (
        SELECT band, shard, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY band, shard
                                  ORDER BY doc_id, chunk_id) AS r
        FROM banded
    ), per_batch AS (
        SELECT band, shard,
               CAST(FLOOR((r - 1) / 32.0) AS BIGINT) AS batch_id,
               COUNT(*)      AS bn,
               MAX(n_tokens) AS bmax,
               SUM(n_tokens) AS btoks
        FROM rn
        GROUP BY band, shard, CAST(FLOOR((r - 1) / 32.0) AS BIGINT)
    )
    SELECT band, shard,
           CAST(COUNT(*) AS BIGINT)       AS n_batches,
           CAST(SUM(bn) AS BIGINT)        AS n_chunks,
           CAST(SUM(btoks) AS BIGINT)     AS total_tokens,
           CAST(SUM(bn * bmax - btoks) AS BIGINT) AS pad_waste,
           ROUND(SUM(bn * bmax - btoks)
                 / CAST(SUM(bn * bmax) AS DOUBLE), 4) AS pad_frac
    FROM per_batch
    GROUP BY band, shard
    """,
)
def d114_length_bucketed_batching(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    BATCH = 32
    chunks = queries()["d13_chunk_documents"](spark, sf_dir).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    banded = chunks.select(
        "doc_id", "chunk_id", "n_tokens",
        (F.ceil(F.col("n_tokens") / 8.0) * 8).cast("bigint").alias("band"),
        (
            F.conv(
                F.substring(
                    F.md5(F.col("doc_id").cast("string")), 1, 8
                ),
                16, 10,
            ).cast("long")
            % 8
        ).alias("shard"),
    )
    w = Window.partitionBy("band", "shard").orderBy("doc_id", "chunk_id")
    per_batch = (
        banded.withColumn("r", F.row_number().over(w))
        .withColumn(
            "batch_id",
            F.floor((F.col("r") - 1) / float(BATCH)).cast("bigint"),
        )
        .groupBy("band", "shard", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.max("n_tokens").alias("bmax"),
            F.sum("n_tokens").alias("btoks"),
        )
    )
    pad = F.col("bn") * F.col("bmax") - F.col("btoks")
    return per_batch.groupBy("band", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batches"),
        F.sum("bn").cast("bigint").alias("n_chunks"),
        F.sum("btoks").cast("bigint").alias("total_tokens"),
        F.sum(pad).cast("bigint").alias("pad_waste"),
        F.round(
            F.sum(pad)
            / F.sum(F.col("bn") * F.col("bmax")).cast("double"),
            4,
        ).alias("pad_frac"),
    )


# --------------------------------------------------------------------------
# D119 — TextTiling semantic boundaries (Hearst 1997, CL 23(1)): the
# SEMANTIC counterpart to d13's fixed-window chunking — RAG/packing
# pipelines that split at topic shifts instead of every 40 tokens use
# exactly this block-comparison primitive. Per doc: non-overlapping
# 10-token blocks, adjacent-block cohesion = Jaccard of the block token
# SETS (an exact integer rational), and a gap is a boundary when its
# cohesion falls below the doc's own mean - 0.5 * stddev_pop cutoff
# (Hearst's depth-score criterion in its thresholded form).
# Determinism discipline: every per-doc statistic is a SEQUENTIAL fold
# over the gap-score array (F.aggregate here, list_reduce in the
# oracle) — both engines add identical doubles in identical array
# order, so the threshold is bit-identical and the boundary decision
# never hinges on aggregation order (the cross-engine drift that a
# groupBy mean would reintroduce).
# Scale: blocks, cohesions, threshold, and boundary counts are all
# scan-stage higher-order functions — ZERO shuffle before the
# |langs|-row census; docs shorter than two blocks carry no gap and are
# excluded on both sides.
# --------------------------------------------------------------------------
@register(
    "d119_texttiling_boundaries",
    oracle="""
    WITH scored AS (
        SELECT lang,
               list_transform(
                   generate_series(1, nb - 1),
                   k -> CAST(len(list_intersect(
                            list_distinct(list_slice(toks, (k-1)*10+1, k*10)),
                            list_distinct(list_slice(toks, k*10+1, k*10+10))
                        )) AS DOUBLE)
                        / (len(list_distinct(list_slice(toks, (k-1)*10+1, k*10)))
                           + len(list_distinct(list_slice(toks, k*10+1, k*10+10)))
                           - len(list_intersect(
                                 list_distinct(list_slice(toks, (k-1)*10+1, k*10)),
                                 list_distinct(list_slice(toks, k*10+1, k*10+10))
                             )))
               ) AS s
        FROM (SELECT lang, string_split(text, ' ') AS toks,
                     CAST(ceil(len(string_split(text, ' ')) / 10.0) AS INT)
                         AS nb
              FROM documents)
        WHERE nb >= 2
    ), stats AS (
        SELECT lang,
               len(s) AS n_gaps,
               list_reduce(s, (a, b) -> a + b) AS ssum,
               len(list_filter(
                   s,
                   x -> x < (list_reduce(s, (a, b) -> a + b) / len(s)
                             - 0.5 * sqrt(greatest(
                                   list_reduce(list_transform(s, v -> v * v),
                                               (a, b) -> a + b) / len(s)
                                   - (list_reduce(s, (a, b) -> a + b) / len(s))
                                     * (list_reduce(s, (a, b) -> a + b) / len(s)),
                                   0)))
               )) AS n_bounds
        FROM scored
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(SUM(n_gaps) AS BIGINT)     AS n_gaps,
           CAST(SUM(n_bounds) AS BIGINT)   AS n_boundaries,
           ROUND(SUM(ssum) / SUM(n_gaps), 4) AS avg_cohesion,
           ROUND(CAST(SUM(n_bounds) AS DOUBLE) / SUM(n_gaps), 4)
                                           AS boundary_rate
    FROM stats
    GROUP BY lang
    """,
)
def d119_texttiling_boundaries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    B = 10
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    nb = F.ceil(F.size(toks) / float(B)).cast("int")

    def block(k, off):
        # 1-based block k (+off) as a distinct token set.
        return F.array_distinct(
            F.slice(F.col("toks"), (k - 1 + off) * B + 1, B)
        )

    def jac(k):
        inter = F.size(F.array_intersect(block(k, 0), block(k, 1)))
        union = F.size(block(k, 0)) + F.size(block(k, 1)) - inter
        return inter.cast("double") / union

    scored = (
        docs.select("lang", toks.alias("toks"), nb.alias("nb"))
        .filter(F.col("nb") >= 2)
        .select(
            "lang",
            F.transform(
                F.sequence(F.lit(1), F.col("nb") - 1), jac
            ).alias("s"),
        )
    )
    ssum = F.aggregate("s", F.lit(0.0), lambda a, x: a + x)
    ssq = F.aggregate("s", F.lit(0.0), lambda a, x: a + x * x)
    n = F.size("s")
    mean = ssum / n
    thr = mean - 0.5 * F.sqrt(F.greatest(ssq / n - mean * mean, F.lit(0.0)))
    stats = scored.select(
        "lang",
        n.alias("n_gaps"),
        ssum.alias("ssum"),
        F.size(F.filter("s", lambda x: x < thr)).alias("n_bounds"),
    )
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_gaps").cast("bigint").alias("n_gaps"),
        F.sum("n_bounds").cast("bigint").alias("n_boundaries"),
        F.round(F.sum("ssum") / F.sum("n_gaps"), 4).alias("avg_cohesion"),
        F.round(
            F.sum("n_bounds").cast("double") / F.sum("n_gaps"), 4
        ).alias("boundary_rate"),
    )
