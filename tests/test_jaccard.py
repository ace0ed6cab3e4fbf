"""Unit tests for operators/jaccard.py — exact pairs, and the stop-shingle
DF cutoff being lossless (same output with and without the cutoff), with a
synthetic corpus engineered to exercise BOTH rescue paths:

* a hot shingle shared by many docs (pruned from candidate generation, its
  intersection contribution restored from the hot arrays), and
* a pair of hot-HEAVY near-dup docs whose overlap is hot shingles only
  (found via the hot-heavy guard, impossible via cold candidates).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_on_spark_spark.operators.jaccard import exact_jaccard_pairs


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6) for r in df.collect()
    }


@pytest.fixture(scope="module")
def shingle_sets(spark):
    rows = []

    def doc(doc_id, shingles):
        rows.extend((doc_id, s) for s in set(shingles))

    # Hot shingle "HOT" in every doc below (df = 8 > cutoff 3).
    # Docs 1/2: near-dups sharing HOT + 3 of 4 cold shingles (J = 4/6).
    doc(1, ["HOT", "a", "b", "c", "x1"])
    doc(2, ["HOT", "a", "b", "c", "x2"])
    # Docs 3/4: hot-HEAVY pair — overlap is the hot shingle only, plus one
    # private cold shingle each (J = 1/3 >= t=0.3; hot fraction 1/2 >=
    # t/(1+t) ≈ 0.23). Without the hot-heavy guard this pair is missed.
    doc(3, ["HOT", "y3"])
    doc(4, ["HOT", "y4"])
    # Docs 5..8: unrelated docs that make HOT actually hot, each dissimilar.
    for i in range(5, 9):
        doc(i, ["HOT", f"p{i}", f"q{i}", f"r{i}", f"s{i}", f"t{i}", f"u{i}"])
    return spark.createDataFrame(rows, "doc_id long, shingle string")


def test_cutoff_is_lossless(spark, shingle_sets):
    t = 0.3
    base = _pairs(exact_jaccard_pairs(shingle_sets, threshold=t, df_cutoff=None))
    cut = _pairs(exact_jaccard_pairs(shingle_sets, threshold=t, df_cutoff=3))
    assert base == cut
    assert (1, 2) in base and base[(1, 2)] == round(4 / 6, 6)
    # The hot-only-overlap pair survives via the hot-heavy guard.
    assert (3, 4) in cut and cut[(3, 4)] == round(1 / 3, 6)


def test_threshold_filters(spark, shingle_sets):
    strict = _pairs(
        exact_jaccard_pairs(shingle_sets, threshold=0.6, df_cutoff=3)
    )
    assert strict == {(1, 2): round(4 / 6, 6)}


def test_no_pairs_below_threshold_everywhere(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (2, "d")], "doc_id long, shingle string"
    )
    assert _pairs(exact_jaccard_pairs(df, threshold=0.5, df_cutoff=None)) == {}
    assert _pairs(exact_jaccard_pairs(df, threshold=0.5, df_cutoff=1)) == {}
