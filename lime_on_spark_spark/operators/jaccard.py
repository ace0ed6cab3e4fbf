"""Exact set-Jaccard similarity pairs via an inverted-index self-join.

The pair-generation primitive under exact near-dup detection
(plans/textpipe.py d2_ngram_jaccard) and duplicate-cluster formation
(d10_dup_clusters). Input is the exploded (doc_id, shingle) set-membership
table; output is every unordered pair with Jaccard >= `threshold`.

Scale design:

* **Hashed join keys.** Shingles are xxhash64'd to int64 before the
  self-join, so the largest shuffle in the pipeline moves 8-byte keys
  instead of arbitrary-length strings and the sort/compare inside the
  shuffle is a long compare. A 64-bit collision would need two distinct
  shingles of the SAME document pair to collide (~n²/2^64 for n distinct
  shingles — negligible and deterministic).
* **One materialization.** The shingle table feeds three consumers (sizes,
  join left, join right); `localCheckpoint` computes the explode once
  instead of three times.
* **Stop-shingle DF cutoff.** A shingle shared by millions of documents is
  a hot join key that quadratically inflates the candidate join while
  contributing almost nothing to a >= 0.5 pair. Candidate generation drops
  shingles with document frequency > `df_cutoff`; exact intersection
  counts are then restored from small per-doc hot-shingle arrays, so the
  reported Jaccard is still EXACT. Soundness of candidate pruning: if
  J(A,B) >= t and the pair shares no cold shingle, then A∩B is all-hot, so
  |A∩hot| >= |A∩B| >= t/(1+t)·(|A|+|B|) >= t/(1+t)·|A| (same for B) —
  both docs are "hot-heavy". Docs whose hot fraction reaches that bound
  keep ALL their shingles in candidate generation, so such pairs are still
  found via their shared hot shingles. Everything else must share a cold
  shingle and is found on the cold path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_jaccard_pairs(
    shingle_sets: DataFrame,
    threshold: float = 0.5,
    df_cutoff: int | None = None,
    doc_col: str = "doc_id",
    shingle_col: str = "shingle",
) -> DataFrame:
    """Return (doc_a, doc_b, jaccard) for every pair with exact set-Jaccard
    >= threshold. `shingle_sets` must hold DISTINCT (doc, shingle) rows."""
    sh = shingle_sets.select(
        F.col(doc_col).alias("doc_id"),
        F.xxhash64(F.col(shingle_col)).alias("h"),
    ).localCheckpoint(eager=True)

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    if df_cutoff is None:
        cand_a = sh
        inter = _pair_counts(sh, sh)
    else:
        # Hot shingles: document frequency above the cutoff. By design this
        # set is tiny (it exists to cap the join's key skew), so it
        # broadcasts.
        hot = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("dfreq"))
            .filter(F.col("dfreq") > df_cutoff)
            .select("h")
        )
        flagged = sh.join(
            F.broadcast(hot.withColumn("is_hot", F.lit(True))), "h", "left"
        ).select("doc_id", "h", F.coalesce("is_hot", F.lit(False)).alias("is_hot"))
        cold = flagged.filter(~F.col("is_hot")).select("doc_id", "h")

        # Hot-heavy docs (hot fraction >= t/(1+t)) keep all shingles for
        # candidate generation — the guard that makes pruning lossless.
        frac = threshold / (1.0 + threshold)
        hot_heavy = (
            flagged.groupBy("doc_id")
            .agg(
                F.sum(F.col("is_hot").cast("long")).alias("hn"),
                F.count(F.lit(1)).alias("n"),
            )
            .filter(F.col("hn") >= frac * F.col("n"))
            .select("doc_id")
        )
        heavy_sh = sh.join(hot_heavy, "doc_id")

        # Exact intersections: cold matches counted by the self-join; hot
        # matches restored from per-doc hot-shingle arrays (small by the
        # cutoff's purpose: only a few distinct shingles are ever hot).
        cold_counts = _pair_counts(cold, cold)
        heavy_pairs = (
            _pair_counts(heavy_sh, heavy_sh)
            .select("doc_a", "doc_b")
        )
        pair_keys = (
            cold_counts.select("doc_a", "doc_b")
            .unionByName(heavy_pairs)
            .distinct()
        )
        hot_arrays = (
            flagged.filter(F.col("is_hot"))
            .groupBy("doc_id")
            .agg(F.collect_set("h").alias("hots"))
        )
        inter = (
            pair_keys.join(
                cold_counts.withColumnRenamed("inter", "inter_cold"),
                ["doc_a", "doc_b"],
                "left",
            )
            .join(
                hot_arrays.select(
                    F.col("doc_id").alias("doc_a"), F.col("hots").alias("hots_a")
                ),
                "doc_a",
                "left",
            )
            .join(
                hot_arrays.select(
                    F.col("doc_id").alias("doc_b"), F.col("hots").alias("hots_b")
                ),
                "doc_b",
                "left",
            )
            .select(
                "doc_a",
                "doc_b",
                (
                    F.coalesce("inter_cold", F.lit(0))
                    # Explicit null guard: size(null array) is -1 under
                    # legacy conf — never rely on its null behavior.
                    + F.when(
                        F.col("hots_a").isNotNull() & F.col("hots_b").isNotNull(),
                        F.size(F.array_intersect("hots_a", "hots_b")),
                    ).otherwise(F.lit(0))
                ).alias("inter"),
            )
        )

    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def _pair_counts(left: DataFrame, right: DataFrame) -> DataFrame:
    a = left.select(F.col("doc_id").alias("doc_a"), "h")
    b = right.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
