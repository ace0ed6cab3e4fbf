"""Multimodal pipeline rows (north-star family: opaque media columns).

Rows-only: the feature extractor runs through the stubbed decoder
(operators/multimodal.py) — the Spark-side plumbing (binary schema,
metadata struct, Arrow batch shape, map-only extraction) is real and what
these rows exercise; tests/test_multimodal.py pins the values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table


@register("m1_multimodal_features")
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


@register("m2_multimodal_embed_join")
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


@register("m3_resize_and_frames")
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
