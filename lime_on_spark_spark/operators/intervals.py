"""Keyed interval-union merge: total covered length per key.

The d87 span-removal primitive, factored out because interval coverage
(union of possibly-overlapping [start, end] ranges) recurs in any
removal/redaction pipeline: duplicated-span cuts, PII span masking,
time-range occupancy. The classic two-window formulation:

* ``prev_max`` = running max of ``e`` over all EARLIER intervals
  (ordered by (s, e), frame up to -1 row);
* a new island starts where ``s > prev_max`` (strictly — intervals are
  CLOSED integer ranges, so ``s == prev_max + 1`` still abuts only when
  callers pre-extend; touching-at-a-point [1,3],[3,5] MERGES);
* islands are numbered by a running sum of the start flags, and each
  island contributes ``max(e) - min(s) + 1``.

Scale: both windows partition by the key and order a handful of
intervals per key — no global window, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merged_interval_lengths(
    ivl: DataFrame, key: str = "doc_id", s: str = "s", e: str = "e"
) -> DataFrame:
    """Return (key, covered) where covered = |union of the key's closed
    integer intervals [s, e]|. Input may contain duplicate or overlapping
    intervals; rows with e < s are invalid and must not be passed."""
    w_prev = (
        Window.partitionBy(key)
        .orderBy(s, e)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy(key).orderBy(s, e)
    return (
        ivl.withColumn("_prev_max", F.max(e).over(w_prev))
        .withColumn(
            "_new_seg",
            F.when(
                F.col("_prev_max").isNull() | (F.col(s) > F.col("_prev_max")),
                1,
            ).otherwise(0),
        )
        .withColumn("_g", F.sum("_new_seg").over(w_run))
        .groupBy(key, "_g")
        .agg((F.max(e) - F.min(s) + 1).alias("_seg_len"))
        .groupBy(key)
        .agg(F.sum("_seg_len").alias("covered"))
    )
