"""Multimodal column plumbing (north-star family: image/audio/video as
opaque binary columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is stubbed
behind `decode_blob` (raises NotImplementedError for real formats, returns
a deterministic fake for the synthetic 'raw' format). Everything around the
stub is real and tested: the binary column schema, the metadata struct, the
Arrow batch shape through `mapInPandas`, and the partition-parallel feature
extraction.

Scale notes: blobs never pass through a shuffle — feature extraction is a
map-only stage (`mapInPandas`), so 100 TB of media streams through
executors in Arrow batches; only the small extracted features continue into
joins/aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the feature rows produced by extract_features.
FEATURE_SCHEMA = (
    "doc_id bigint, fmt string, n_bytes int, checksum bigint, "
    "feat array<double>"
)

_FEAT_DIM = 8


def attach_fake_blobs(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct to documents.

    Stands in for real media ingestion: the blob is the utf-8 text payload
    (deterministic), the metadata mirrors what an image/audio reader would
    carry (format tag, nominal dims, byte length).
    """
    blob = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("raw").alias("fmt"),
            (F.length("text") % 640).cast("int").alias("width"),
            (F.length("text") % 480).cast("int").alias("height"),
            F.length(blob).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_blob(fmt: str, payload: bytes) -> np.ndarray:
    """STUB decode: real codecs (jpeg/png/wav/mp4) are unavailable in this
    environment. The 'raw' format decodes deterministically so the pipeline
    around the stub is fully testable."""
    if fmt != "raw":
        raise NotImplementedError(
            f"decode for format {fmt!r} requires a codec library not present "
            "in this environment; only the synthetic 'raw' format is decodable"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(blobs: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Map-only feature extraction over Arrow batches (the multimodal
    workhorse): decode each blob, emit a fixed-dim feature vector.

    The fake feature is a deterministic byte-histogram projection — the
    structure (batched pandas in, fixed-schema frame out) is exactly what a
    real embed/resize/frame-sample stage uses.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"], pdf["meta"]):
                arr = decode_blob(meta["fmt"], blob)
                hist = np.bincount(arr % _FEAT_DIM, minlength=_FEAT_DIM).astype(
                    np.float64
                )
                total = hist.sum() or 1.0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "fmt": meta["fmt"],
                        "n_bytes": int(arr.size),
                        "checksum": int(arr.astype(np.int64).sum()),
                        "feat": (hist / total).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, out_h int, out_w int, n_px int, px_checksum bigint"
FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_bytes int, frame_checksum bigint"
)


def resize_images(blobs: DataFrame, out_h: int = 4, out_w: int = 4) -> DataFrame:
    """Map-only image resize over Arrow batches. The 'raw' format interprets
    the payload as a 1×N grayscale strip; resize = nearest-neighbor index
    sampling into an out_h×out_w grid — the real-codec path would decode to
    H×W×3 first (NotImplementedError via decode_blob for real formats)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"], pdf["meta"]):
                arr = decode_blob(meta["fmt"], blob)
                n = max(arr.size, 1)
                idx = (np.arange(out_h * out_w) * n) // (out_h * out_w)
                px = arr[np.minimum(idx, n - 1)] if arr.size else np.zeros(
                    out_h * out_w, dtype=np.uint8
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "out_h": out_h,
                        "out_w": out_w,
                        "n_px": int(px.size),
                        "px_checksum": int(px.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(blobs: DataFrame, frame_size: int = 64, every_k: int = 4) -> DataFrame:
    """Map-only frame sampling: treat the payload as consecutive fixed-size
    frames (a stand-in for video GOPs), emit every k-th frame's stats. One
    input row fans out to ceil(n_frames / k) output rows — the Arrow batch
    shape a real video sampler produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"], pdf["meta"]):
                arr = decode_blob(meta["fmt"], blob)
                n_frames = max((arr.size + frame_size - 1) // frame_size, 0)
                for fi in range(0, n_frames, every_k):
                    frame = arr[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": fi,
                            "frame_bytes": int(frame.size),
                            "frame_checksum": int(frame.astype(np.int64).sum()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_bytes", "frame_checksum"],
            )

    return blobs.mapInPandas(run, schema=FRAMES_SCHEMA)
