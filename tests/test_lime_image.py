"""Unit tests for L12 image-LIME (lime/image.py)."""

from __future__ import annotations

import numpy as np

from lime_on_spark_spark.lime.image import (
    N_SEGMENTS,
    PLANTED_B,
    block_means,
    expected_true_beta,
    explain_image,
)


def test_block_means_match_numpy(spark, sf_dir):
    import duckdb

    got = {
        int(r["instance_id"]): list(r["bm"])
        for r in block_means(spark, sf_dir, [1, 2]).collect()
    }
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE doc_id IN (1, 2)"
        ).fetchall()
    )
    for doc_id, text in texts.items():
        arr = np.frombuffer(text.encode(), dtype=np.uint8)
        n = arr.size
        for s in range(N_SEGMENTS):
            seg = arr[s * n // N_SEGMENTS : (s + 1) * n // N_SEGMENTS]
            assert abs(got[doc_id][s] - float(seg.mean())) < 1e-9


def test_surrogate_recovers_planted_scorer(spark, sf_dir):
    """With a tiny alpha the full-width weighted ridge on an exactly-linear
    black box recovers the planted coefficients and intercept."""
    bm = {
        int(r["instance_id"]): list(r["bm"])
        for r in block_means(spark, sf_dir, [1]).collect()
    }
    out = explain_image(spark, sf_dir, [1], num_samples=128, alpha=1e-4).collect()
    true_beta = expected_true_beta(bm[1])
    for r in out:
        assert abs(r["weight"] - true_beta[r["feature_idx"]]) < 0.02
        assert abs(r["intercept"] - PLANTED_B) < 0.05
        assert r["r2"] > 0.999


def test_explain_image_rerun_identical(spark, sf_dir):
    a = explain_image(spark, sf_dir, [1, 2], num_samples=32).collect()
    b = explain_image(spark, sf_dir, [1, 2], num_samples=32).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["instance_id"], r["feature_idx"], r["weight"]) for r in rows
    )
    assert key(a) == key(b)
