"""Multimodal pipeline rows (north-star family: opaque media columns).

The feature extractor runs through the stubbed decoder
(operators/multimodal.py): real codecs are absent, so the synthetic 'raw'
format decodes to the utf-8 byte stream of the text payload. That makes
the whole pipeline DIFFERENTIALLY checkable: DuckDB reconstructs the same
byte values by hex-expanding `encode(text)`, so every aggregate the
mapInPandas stages produce (byte counts, checksums, histogram features,
nearest-neighbor resize pixels, sampled-frame stats) has an exact SQL
oracle. A bug anywhere in the Arrow plumbing — batch shape, schema,
per-row decode, fan-out — breaks the value match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table

# DuckDB reconstruction of decode_blob('raw', ...): utf-8 byte values via
# hex expansion (strpos over the hex alphabet decodes each nibble pair).
_BYTES_CTE = """
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents
    ), bytes AS (
        SELECT doc_id, nb,
               list_transform(
                   range(1, nb + 1),
                   i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
                        * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)
               ) AS vals
        FROM b
    )
"""


@register(
    "m1_multimodal_features",
    oracle=_BYTES_CTE
    + """
    SELECT 'raw' AS fmt,
           COUNT(*) AS n_blobs,
           CAST(SUM(nb) AS BIGINT) AS total_bytes,
           CAST(SUM(list_sum(vals)) AS BIGINT) AS total_checksum,
           ROUND(AVG(len(list_filter(vals, v -> v % 8 = 0)) * 1.0 / nb), 6)
               AS avg_feat0
    FROM bytes
    """,
)
def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob-attach -> mapInPandas decode/extract -> aggregate features."""
    from lime_on_spark_spark.operators.multimodal import (
        attach_fake_blobs,
        extract_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_blobs(docs))
    return feats.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("checksum").alias("total_checksum"),
        F.round(F.avg(F.element_at("feat", 1)), 6).alias("avg_feat0"),
    )


@register(
    "m2_multimodal_embed_join",
    oracle=_BYTES_CTE
    + """
    SELECT e.label,
           COUNT(*) AS n,
           ROUND(AVG(y.nb), 4) AS avg_bytes,
           ROUND(AVG(len(list_filter(y.vals, v -> v % 8 = 0)) * 1.0 / y.nb),
                 6) AS avg_feat0
    FROM bytes y JOIN embeddings e ON y.doc_id = e.vec_id
    GROUP BY e.label
    """,
)
def m2_multimodal_embed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extracted media features joined with the embedding modality — the
    cross-modal enrichment join a training-data pipeline runs before
    packing examples."""
    from lime_on_spark_spark.operators.multimodal import (
        attach_fake_blobs,
        extract_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    feats = extract_features(attach_fake_blobs(docs))
    return (
        feats.join(emb, feats.doc_id == emb.vec_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.round(F.avg(F.element_at("feat", 1)), 6).alias("avg_feat0"),
        )
    )


@register(
    "m3_resize_and_frames",
    # Resize: 16 nearest-neighbor samples at idx (k*nb)//16 (clamped);
    # frames: 64-byte frames, every 4th sampled, last frame ragged.
    oracle=_BYTES_CTE
    + """
    , per_doc AS (
        SELECT doc_id, nb,
               list_sum(list_transform(
                   range(0, 16),
                   k -> vals[least((k * nb) // 16, nb - 1) + 1]
               )) AS px_checksum,
               len(range(0, (nb + 63) // 64, 4)) AS n_sampled_frames,
               list_sum(list_transform(
                   range(0, (nb + 63) // 64, 4),
                   fi -> least(64, nb - fi * 64)
               )) AS sampled_bytes
        FROM bytes
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(px_checksum) AS BIGINT) AS total_px_checksum,
           CAST(SUM(n_sampled_frames) AS BIGINT) AS total_frames,
           CAST(SUM(sampled_bytes) AS BIGINT) AS total_sampled_bytes
    FROM per_doc
    """,
)
def m3_resize_and_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample stubs over the blob column: two map-only
    Pandas stages joined on doc_id, then summarized."""
    from lime_on_spark_spark.operators.multimodal import (
        attach_fake_blobs,
        resize_images,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_fake_blobs(docs)
    resized = resize_images(blobs)
    frames = sample_frames(blobs)
    frame_stats = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled_frames"),
        F.sum("frame_bytes").alias("sampled_bytes"),
    )
    return (
        resized.join(frame_stats, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("px_checksum").alias("total_px_checksum"),
            F.sum("n_sampled_frames").alias("total_frames"),
            F.sum("sampled_bytes").alias("total_sampled_bytes"),
        )
    )


# --------------------------------------------------------------------------
# M4 — size-band skew repartitioning: the multimodal-specific scale
# problem. Media blobs are wildly non-uniform (a 4 KB thumbnail and a 4 GB
# video in the same column), so hash-partitioning by key gives decode
# stages straggler tasks. The fix is banding by payload size (log2 bands)
# and repartitioning so each band's blobs spread evenly; the decode stage
# then runs near-uniform tasks. Emits the band profile (count, bytes,
# bounds) plus the verdicts a planner needs: bands are size-monotone and
# every blob's band matches its size. All scan-stage expressions + one
# keyed agg; the repartition-by-band is asserted in the plan test.
# --------------------------------------------------------------------------
@register(
    "m4_size_band_repartition",
    oracle="""
    WITH blobs AS (
        SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
    ), banded AS (
        SELECT doc_id, nb,
               CAST(FLOOR(LOG2(GREATEST(nb, 1))) AS INTEGER) AS band
        FROM blobs
    )
    SELECT band,
           COUNT(*)                          AS n_blobs,
           CAST(SUM(nb) AS BIGINT)           AS band_bytes,
           CAST(MIN(nb) AS BIGINT)           AS min_bytes,
           CAST(MAX(nb) AS BIGINT)           AS max_bytes,
           BOOL_AND(nb >= POWER(2, band) AND nb < POWER(2, band + 1))
                                             AS band_matches_size
    FROM banded
    GROUP BY band
    """,
)
def m4_size_band_repartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lime_on_spark_spark.operators.multimodal import attach_fake_blobs

    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_fake_blobs(docs).select(
        "doc_id", F.octet_length("blob").alias("nb")
    )
    banded = blobs.select(
        "doc_id",
        "nb",
        F.floor(F.log2(F.greatest("nb", F.lit(1)))).cast("int").alias("band"),
    )
    # Spread each band across tasks: partition on (band, doc_id) so one hot
    # band cannot collapse into a single decode task.
    spread = banded.repartition(F.col("band"), F.col("doc_id"))
    return spread.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("nb").cast("bigint").alias("band_bytes"),
        F.min("nb").cast("bigint").alias("min_bytes"),
        F.max("nb").cast("bigint").alias("max_bytes"),
        F.bool_and(
            (F.col("nb") >= F.pow(F.lit(2.0), F.col("band")))
            & (F.col("nb") < F.pow(F.lit(2.0), F.col("band") + 1))
        ).alias("band_matches_size"),
    )


# --------------------------------------------------------------------------
# M5 — magic-byte modality router: the ingest-side dispatcher of a mixed
# media lake. Files arrive as opaque blobs with unreliable extensions; the
# router sniffs the leading bytes (JPEG FF D8 FF, PNG 89 50 4E 47, RIFF
# 52 49 46 46, else raw) and routes each blob to its decoder family. Here
# the corpus synthesizes a mixed-format lake deterministically (format by
# doc_id % 4, real magic prefixes prepended to the text payload), the
# router re-detects the format FROM THE BYTES ALONE, and the per-route
# verdict pins sniffed == generated for every blob. Sniff + route are
# scan-stage JVM expressions — at 100 TB this adds zero shuffles to
# ingestion, and the per-format groups feed the m4 size-band repartition.
# --------------------------------------------------------------------------
@register(
    "m5_magic_byte_router",
    oracle="""
    WITH gen AS (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                               WHEN 2 THEN 'riff' ELSE 'raw' END AS fmt,
               CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 8
                               WHEN 2 THEN 4 ELSE 0 END AS prefix_len,
               octet_length(encode(text)) AS payload_len
        FROM documents
    )
    SELECT fmt AS detected_fmt,
           CAST(COUNT(*) AS BIGINT) AS n_blobs,
           CAST(SUM(prefix_len + payload_len) AS BIGINT) AS total_bytes,
           TRUE AS all_routed_correctly
    FROM gen GROUP BY fmt
    """,
)
def m5_magic_byte_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix = (
        F.when(F.col("doc_id") % 4 == 0, F.unhex(F.lit("FFD8FF")))
        .when(F.col("doc_id") % 4 == 1, F.unhex(F.lit("89504E470D0A1A0A")))
        .when(F.col("doc_id") % 4 == 2, F.unhex(F.lit("52494646")))
        .otherwise(F.unhex(F.lit("")))
    )
    gen_fmt = (
        F.when(F.col("doc_id") % 4 == 0, "jpeg")
        .when(F.col("doc_id") % 4 == 1, "png")
        .when(F.col("doc_id") % 4 == 2, "riff")
        .otherwise("raw")
    )
    lake = docs.select(
        "doc_id",
        F.concat(prefix, F.encode("text", "utf-8")).alias("blob"),
        gen_fmt.alias("gen_fmt"),
    )
    head = F.hex(F.expr("substring(blob, 1, 8)"))
    detected = (
        F.when(head.startswith("FFD8FF"), "jpeg")
        .when(head.startswith("89504E47"), "png")
        .when(head.startswith("52494646"), "riff")
        .otherwise("raw")
    )
    routed = lake.select(
        "doc_id",
        "blob",
        "gen_fmt",
        detected.alias("detected_fmt"),
        F.length("blob").alias("n_bytes"),
    )
    return routed.groupBy("detected_fmt").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("n_bytes").alias("total_bytes"),
        (
            F.sum((F.col("detected_fmt") != F.col("gen_fmt")).cast("int")) == 0
        ).alias("all_routed_correctly"),
    )


# --------------------------------------------------------------------------
# M6 — audio-modality plumbing: PCM framing + the classic VAD features
# (per-frame energy, zero-crossing rate). The decode step is the honest
# stub (operators/multimodal.py:decode_blob — a real wav/mp3 codec is
# absent from this container and raises NotImplementedError; the 'raw'
# format deterministically yields the byte stream as unsigned 8-bit
# PCM). Everything AROUND the stub is the real audio pipeline and is
# differentially checked: samples center at 128, frames are W=32/hop=16
# sliding windows (tail dropped), energy is the integer sum of squared
# deviations per frame (exact in both engines — one float division at
# the very end), and ZCR counts sign flips across the whole clip. The
# oracle re-derives every number from hex-expanded bytes with 1-based
# list arithmetic — an off-by-one in the window indexing, a dropped
# tail frame, or a batch-boundary bug in mapInPandas breaks the hash.
# Scale: map-only over Arrow batches — blobs never shuffle; only the
# per-source feature aggregates do (the m1 contract).
# --------------------------------------------------------------------------
@register(
    "m6_audio_features",
    oracle=_BYTES_CTE
    + """
    , framed AS (
        -- nb < 32 handled by CASE, not GREATEST over a negative division:
        -- DuckDB's // truncates toward zero while Python's // floors, so
        -- (17-32)//16+1 is 1 in SQL but 0 in the implementation. Keeping
        -- the division non-negative makes the two semantics coincide.
        SELECT doc_id, nb, vals,
               CASE WHEN nb < 32 THEN 0
                    ELSE (nb - 32) // 16 + 1 END AS n_frames
        FROM bytes
    ), per_doc AS (
        SELECT doc_id, n_frames,
               CASE WHEN n_frames = 0 THEN 0 ELSE
                   list_sum(list_transform(range(0, n_frames), f ->
                       list_sum(list_transform(range(1, 33), i ->
                           (vals[f * 16 + i] - 128)
                           * (vals[f * 16 + i] - 128)))))
               END AS sq_energy,
               CASE WHEN nb < 2 THEN 0 ELSE
                   list_sum(list_transform(range(1, nb), i ->
                       CASE WHEN (vals[i] < 128) != (vals[i + 1] < 128)
                            THEN 1 ELSE 0 END))
               END AS zero_crossings
        FROM framed
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT)                    AS n_clips,
           CAST(SUM(CASE WHEN p.n_frames > 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                       AS framed_clips,
           CAST(SUM(p.n_frames) AS BIGINT)             AS total_frames,
           CAST(SUM(p.zero_crossings) AS BIGINT)       AS total_zcr,
           ROUND(SUM(p.sq_energy) * 1.0
                 / (SUM(p.n_frames) * 32), 6)          AS avg_frame_energy
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def m6_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from lime_on_spark_spark.operators.multimodal import (
        attach_fake_blobs,
        decode_blob,
    )

    W, HOP = 32, 16
    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_fake_blobs(docs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["blob"], pdf["meta"]
            ):
                pcm = decode_blob(meta["fmt"], blob).astype(np.int64)
                n = pcm.size
                n_frames = max(0, (n - W) // HOP + 1)
                s = pcm - 128
                sq = 0
                for f in range(n_frames):
                    w = s[f * HOP : f * HOP + W]
                    sq += int((w * w).sum())
                zc = (
                    int(((pcm[:-1] < 128) != (pcm[1:] < 128)).sum())
                    if n >= 2
                    else 0
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": n_frames,
                        "sq_energy": sq,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows)

    feats = blobs.mapInPandas(
        run,
        "doc_id bigint, n_frames bigint, sq_energy bigint,"
        " zero_crossings bigint",
    )
    return (
        feats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.sum((F.col("n_frames") > 0).cast("int"))
            .cast("bigint")
            .alias("framed_clips"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
            F.sum("zero_crossings").cast("bigint").alias("total_zcr"),
            F.round(
                F.sum("sq_energy") / (F.sum("n_frames") * W), 6
            ).alias("avg_frame_energy"),
        )
    )


# --------------------------------------------------------------------------
# M7 — perceptual-hash (dHash) image NEAR-DUP: the multimodal twin of the
# text dedup stack (d2/d45): re-encoded/re-compressed copies of an image
# hash to nearby dHashes, so image dedup is Hamming-ball search over a
# 56-bit gradient hash, not byte equality. Pipeline: blob -> Arrow-batch
# decode (stub codec, deterministic bytes) -> 8x8 grayscale strip -> dHash
# (row-wise brightness gradient: bit = [px[r,c+1] > px[r,c]], 8 rows x 7
# comparisons = 56 bits, bigint-safe) -> banded LSH self-join (4 bands x
# 14 bits; pigeonhole: Hamming distance <= 3 leaves at least one band
# intact, so candidates are COMPLETE for the <= 3 ball) -> exact verify
# via bit_count(xor). The oracle recomputes the hash from hex-expanded
# bytes and replays the same band join in SQL — an indexing slip, a bit
#-order flip, or a band boundary bug breaks the counts.
# Scale: hashes shuffle as 8-byte keys (never pixels); the band join is
# the d45 equi-join shape; verify touches candidates only.
# --------------------------------------------------------------------------
@register(
    "m7_image_phash_neardup",
    oracle=_BYTES_CTE
    + """
    , hashes AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 56), i ->
                   CASE WHEN COALESCE(vals[(i // 7) * 8 + (i % 7) + 2], 0)
                           > COALESCE(vals[(i // 7) * 8 + (i % 7) + 1], 0)
                        THEN CAST(1 AS BIGINT) << i ELSE 0 END
               )) AS BIGINT) AS h
        FROM bytes
    ), bands AS (
        SELECT doc_id, h, b, (h >> (b * 14)) & 16383 AS band_val
        FROM hashes, UNNEST(range(0, 4)) AS t(b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.h AS ha, b.h AS hb
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM hashes)          AS n_images,
           (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) FROM hashes) AS n_distinct,
           CAST(COUNT(*) FILTER (WHERE bit_count(xor(ha, hb)) <= 3)
                AS BIGINT)                                        AS n_near_pairs,
           CAST(COUNT(*) FILTER (WHERE ha = hb) AS BIGINT)        AS n_exact_pairs
    FROM cand
    """,
)
def m7_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from lime_on_spark_spark.operators.multimodal import (
        attach_fake_blobs,
        decode_blob,
    )

    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_fake_blobs(docs)

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_h = [], []
            for row in pdf.itertuples(index=False):
                px = decode_blob(row.meta["fmt"], row.blob)[:64]
                if px.shape[0] < 64:
                    px = np.pad(px, (0, 64 - px.shape[0]))
                grid = px.reshape(8, 8).astype(np.int64)
                bits = (grid[:, 1:] > grid[:, :-1]).astype(np.int64)  # 8x7
                h = int((bits.reshape(-1) << np.arange(56)).sum())
                out_ids.append(int(row.doc_id))
                out_h.append(h)
            yield pd.DataFrame({"doc_id": out_ids, "h": out_h})

    hashes = blobs.mapInPandas(dhash, "doc_id bigint, h bigint").cache()
    bands = hashes.select(
        "doc_id",
        "h",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("b"),
    ).withColumn(
        # shiftright() takes a literal count in this API; the per-row band
        # shift needs the SQL expression form.
        "band_val", F.expr("shiftright(h, b * 14) & 16383")
    )
    right = bands.select(
        F.col("doc_id").alias("db"), F.col("h").alias("hb"), "b", "band_val"
    )
    cand = (
        bands.alias("l")
        .join(right, ["b", "band_val"])
        .filter(F.col("doc_id") < F.col("db"))
        .select(
            F.col("doc_id").alias("da"), F.col("db"),
            F.col("h").alias("ha"), F.col("hb"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    stats = cand.agg(
        F.sum(F.when(dist <= 3, 1).otherwise(0)).cast("bigint").alias(
            "n_near_pairs"
        ),
        F.sum(F.when(F.col("ha") == F.col("hb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact_pairs"),
    )
    totals = hashes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.countDistinct("h").cast("bigint").alias("n_distinct"),
    )
    return totals.crossJoin(stats).select(
        "n_images", "n_distinct",
        F.coalesce("n_near_pairs", F.lit(0)).alias("n_near_pairs"),
        F.coalesce("n_exact_pairs", F.lit(0)).alias("n_exact_pairs"),
    )


# --------------------------------------------------------------------------
# M8 — INTERLEAVED multimodal sequence packing (the MMC4/OBELICS training
# prep stage): text documents and their image attachments pack into
# fixed-budget training sequences where an image costs a FIXED SLOT of
# visual tokens (64 here — the ViT-patch budget) plus 2 separators per
# document. Packing is SHARD-LOCAL (md5-bucket of doc_id, 8 shards):
# the cumsum window partitions by shard, so no global single-reducer
# sort exists at any scale — d14's document-local rule lifted to
# cross-document packing the scale-safe way (d67's sharding). Greedy
# rule (seq = floor(cost-before / budget)) overflows a sequence by at
# most one document, the standard streaming-packing tradeoff. Every
# fifth doc carries an image (deterministic stand-in for the crawl's
# <img> positions; the decode itself stays the honest m1 stub).
# Scale: one narrow map for costs, one keyed window per shard, one
# grouped census — shuffles carry (shard, doc_id, costs) triples only.
# --------------------------------------------------------------------------
@register(
    "m8_interleaved_packing",
    oracle="""
    WITH costed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8                         AS shard,
               len(string_split(text, ' '))                AS n_text,
               CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END  AS has_img
        FROM documents
    ), packed AS (
        SELECT shard, doc_id, n_text, has_img,
               n_text + has_img * 64 + 2 AS cost,
               CAST(floor(
                   (SUM(n_text + has_img * 64 + 2) OVER (
                        PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - (n_text + has_img * 64 + 2)) / 2048.0
               ) AS BIGINT) AS seq_id
        FROM costed
    )
    SELECT shard, seq_id,
           CAST(COUNT(*) AS BIGINT)       AS n_docs,
           CAST(SUM(n_text) AS BIGINT)    AS text_tokens,
           CAST(SUM(has_img) AS BIGINT)   AS n_images,
           CAST(SUM(cost) AS BIGINT)      AS seq_cost,
           ROUND(SUM(cost) / 2048.0, 4)   AS fill_rate
    FROM packed
    GROUP BY shard, seq_id
    """,
)
def m8_interleaved_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    IMG_SLOT, SEP, BUDGET = 64, 2, 2048
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 8
    )
    costed = docs.select(
        "doc_id",
        shard.alias("shard"),
        F.size(F.split("text", " ")).alias("n_text"),
        (F.col("doc_id") % 5 == 0).cast("int").alias("has_img"),
    ).withColumn(
        "cost", F.col("n_text") + F.col("has_img") * IMG_SLOT + SEP
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = costed.withColumn(
        "seq_id",
        F.floor((F.sum("cost").over(w) - F.col("cost")) / BUDGET).cast(
            "bigint"
        ),
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_text").cast("bigint").alias("text_tokens"),
        F.sum("has_img").cast("bigint").alias("n_images"),
        F.sum("cost").cast("bigint").alias("seq_cost"),
        F.round(F.sum("cost") / float(BUDGET), 4).alias("fill_rate"),
    )


# --------------------------------------------------------------------------
# M9 — TOKENIZER-AWARE interleaved packing (the r15 verdict's M8b ask):
# m8 costs a document by its whitespace token count; production packing
# costs by TOKENIZER units — here d13's context-window chunker supplies
# the unit (40-token windows, stride 30), so a document enters the packer
# as its chunk stream and sequences fill with chunks, not whole docs —
# the MMC4 recipe's actual granularity (an oversized doc must split
# across sequences instead of overflowing one). The image slot attaches
# to the doc's FIRST chunk (the <img> rides the context that contains
# it); costs, shard-local cumsum (md5-bucket x 8, d67's sharding) and
# the greedy rule are exactly m8's, so the two rows differ only in the
# cost unit — the referee comparison m10 quantifies.
# Scale: d13's chunker is a scan-stage explode (no shuffle); packing adds
# one keyed window per shard and one grouped census — shuffles carry
# (shard, doc_id, chunk_id, cost) quadruples only, never chunk text.
# --------------------------------------------------------------------------
@register(
    "m9_tokenized_packing",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               CAST((s - 1) / 30 AS BIGINT)     AS chunk_id,
               len(list_slice(toks, s, s + 39)) AS n_tokens
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
             UNNEST(generate_series(1, len(toks), 30)) AS t(s)
    ), costed AS (
        SELECT doc_id, chunk_id, n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8                         AS shard,
               CASE WHEN doc_id % 5 = 0 AND chunk_id = 0
                    THEN 1 ELSE 0 END                      AS has_img
        FROM chunks
    ), packed AS (
        SELECT shard, doc_id, chunk_id, n_tokens, has_img,
               n_tokens + has_img * 64 + 2 AS cost,
               CAST(floor(
                   (SUM(n_tokens + has_img * 64 + 2) OVER (
                        PARTITION BY shard ORDER BY doc_id, chunk_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - (n_tokens + has_img * 64 + 2)) / 2048.0
               ) AS BIGINT) AS seq_id
        FROM costed
    )
    SELECT shard, seq_id,
           CAST(COUNT(*) AS BIGINT)              AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)         AS text_tokens,
           CAST(SUM(has_img) AS BIGINT)          AS n_images,
           CAST(SUM(cost) AS BIGINT)             AS seq_cost,
           ROUND(SUM(cost) / 2048.0, 4)          AS fill_rate
    FROM packed
    GROUP BY shard, seq_id
    """,
)
def m9_tokenized_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _m9_packed(spark, sf_dir).groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("text_tokens"),
        F.sum("has_img").cast("bigint").alias("n_images"),
        F.sum("cost").cast("bigint").alias("seq_cost"),
        F.round(F.sum("cost") / 2048.0, 4).alias("fill_rate"),
    )


def _m9_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared m9/m10 packing plan: d13's chunk stream costed (image slot
    on chunk 0 of every 5th doc) and greedily packed shard-locally."""
    from pyspark.sql import Window

    from lime_on_spark_spark.plans.registry import queries

    IMG_SLOT, SEP, BUDGET = 64, 2, 2048
    chunks = queries()["d13_chunk_documents"](spark, sf_dir).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 8
    )
    costed = chunks.select(
        "doc_id", "chunk_id", "n_tokens",
        shard.alias("shard"),
        ((F.col("doc_id") % 5 == 0) & (F.col("chunk_id") == 0))
        .cast("int")
        .alias("has_img"),
    ).withColumn(
        "cost", F.col("n_tokens") + F.col("has_img") * IMG_SLOT + SEP
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return costed.withColumn(
        "seq_id",
        F.floor((F.sum("cost").over(w) - F.col("cost")) / BUDGET).cast(
            "bigint"
        ),
    )


# --------------------------------------------------------------------------
# M10 — packing-efficiency referee: greedy streaming packing (m8/m9's
# rule) against the information-theoretic floor. Per shard, no packer
# can use fewer than ceil(total_cost / budget) sequences, so
# lb / n_seqs_greedy is a true efficiency ratio (1.0 = optimal); the
# overflow census quantifies the at-most-one-chunk-per-sequence
# overshoot the greedy rule trades for a single pass. This is the QA
# row a production packer ships with — a fill-rate regression (chunk
# cost distribution drift, a budget misconfiguration) surfaces here
# before it wastes accelerator hours.
# Scale: one extra keyed agg over m9's census — everything stays on the
# (shard, seq_id) keys; no new wide stage.
# --------------------------------------------------------------------------
@register(
    "m10_packing_efficiency",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               CAST((s - 1) / 30 AS BIGINT)     AS chunk_id,
               len(list_slice(toks, s, s + 39)) AS n_tokens
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
             UNNEST(generate_series(1, len(toks), 30)) AS t(s)
    ), costed AS (
        SELECT doc_id, chunk_id, n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8                         AS shard,
               CASE WHEN doc_id % 5 = 0 AND chunk_id = 0
                    THEN 1 ELSE 0 END                      AS has_img
        FROM chunks
    ), packed AS (
        SELECT shard, doc_id, chunk_id,
               n_tokens + has_img * 64 + 2 AS cost,
               CAST(floor(
                   (SUM(n_tokens + has_img * 64 + 2) OVER (
                        PARTITION BY shard ORDER BY doc_id, chunk_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - (n_tokens + has_img * 64 + 2)) / 2048.0
               ) AS BIGINT) AS seq_id
        FROM costed
    ), seqs AS (
        SELECT shard, seq_id, SUM(cost) AS seq_cost
        FROM packed GROUP BY shard, seq_id
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT)                         AS n_seqs_greedy,
           CAST(CEIL(SUM(seq_cost) / 2048.0) AS BIGINT)     AS n_seqs_lb,
           ROUND(CEIL(SUM(seq_cost) / 2048.0)
                 / CAST(COUNT(*) AS DOUBLE), 4)             AS efficiency,
           CAST(SUM(GREATEST(seq_cost - 2048, 0)) AS BIGINT) AS overflow_tokens,
           ROUND(AVG(seq_cost) / 2048.0, 4)                 AS mean_fill
    FROM seqs
    GROUP BY shard
    """,
)
def m10_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    BUDGET = 2048
    seqs = (
        _m9_packed(spark, sf_dir)
        .groupBy("shard", "seq_id")
        .agg(F.sum("cost").alias("seq_cost"))
    )
    return seqs.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seqs_greedy"),
        F.ceil(F.sum("seq_cost") / float(BUDGET))
        .cast("bigint")
        .alias("n_seqs_lb"),
        F.round(
            F.ceil(F.sum("seq_cost") / float(BUDGET))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("efficiency"),
        F.sum(F.greatest(F.col("seq_cost") - BUDGET, F.lit(0)))
        .cast("bigint")
        .alias("overflow_tokens"),
        F.round(F.avg("seq_cost") / float(BUDGET), 4).alias("mean_fill"),
    )
