"""Embedding clustering + semantic dedup (SURVEY.md §2l rows D39/D40).

D39 is a DataFrame-native Lloyd's k-means (`operators/kmeans.py`): driver-
held k×d centroids re-broadcast per iteration, JVM-expression distances,
map-side-combinable argmin, one-shuffle centroid updates. Every float is
rounded at the iteration boundary, so a DuckDB oracle can replay the WHOLE
training loop as an unrolled CTE chain and the two engines agree exactly.

D40 is SemDeDup (Abbas et al. 2023, arXiv:2303.09540) on those clusters:
semantic near-duplicates are detected by cosine similarity WITHIN each
k-means cluster only — the cluster structure bounds the pairwise cost
(O(Σ|cluster|²) ≪ O(n²)), which is the published method's entire point.
The keep-rule is the deterministic one: a vector is dropped iff a same-
cluster vector with a SMALLER vec_id is cosine-similar above the
threshold, so no connected-components pass is needed and the oracle is a
single self-join.

Scale notes: at 100 TB you raise k so cluster sizes stay bounded (SemDeDup
used k=11k on LAION); assignment stays broadcast-nested-loop, the within-
cluster join shuffles on cid (AQE skew-split handles hot clusters), and
nothing materializes on the driver but the k×d centroid table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.functions.vector import cosine
from lime_on_spark_spark.operators.kmeans import kmeans_oracle_ctes, lloyd_kmeans
from lime_on_spark_spark.plans.registry import register
from lime_on_spark_spark.sources.catalog import load_table

_KMEANS_CTES = kmeans_oracle_ctes(k=8, iters=3)

#: SemDeDup cosine threshold. This corpus's embeddings are near-orthogonal
#: random vectors, so few pairs clear it — the oracle recomputes the same
#: rule, so the (possibly small) drop count is still value-checked exactly.
_SEMDEDUP_TAU = 0.4


# --------------------------------------------------------------------------
# D39 — Lloyd's k-means: per-cluster size + inertia after 3 iterations
# --------------------------------------------------------------------------
@register(
    "d39_kmeans_lloyd",
    oracle=f"""
    WITH {_KMEANS_CTES}
    SELECT cid,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(SUM(dist), 2)      AS inertia
    FROM a3
    GROUP BY cid
    """,
)
def d39_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 Lloyd's k-means, 3 assignments / 2 centroid updates, over the
    embedding corpus; output = per-cluster member count and inertia. The
    oracle replays the full training loop as an unrolled CTE chain
    (a1 c1 a2 c2 a3), value-checking every iteration transitively."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = lloyd_kmeans(emb, k=8, iters=3)
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.round(F.sum("dist"), 2).alias("inertia"),
    )


# --------------------------------------------------------------------------
# D40 — SemDeDup: within-cluster cosine near-dup drop counts
# --------------------------------------------------------------------------
@register(
    "d40_semantic_dedup",
    oracle=f"""
    WITH {_KMEANS_CTES},
    dropped AS (
        SELECT DISTINCT y.vec_id
        FROM a3 x
        JOIN a3 y ON x.cid = y.cid AND x.vec_id < y.vec_id
        JOIN emb ex ON ex.vec_id = x.vec_id
        JOIN emb ey ON ey.vec_id = y.vec_id
        WHERE ROUND(list_cosine_similarity(ex.v, ey.v), 6) >= {_SEMDEDUP_TAU}
    )
    SELECT a3.cid,
           CAST(COUNT(*) AS BIGINT)        AS n_members,
           CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped
    FROM a3
    LEFT JOIN dropped d ON a3.vec_id = d.vec_id
    GROUP BY a3.cid
    """,
)
def d40_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the d39 clusters: drop any vector with a smaller-id
    same-cluster neighbor at rounded cosine >= tau. Pairwise work happens
    ONLY within clusters (shuffle on cid), never corpus x corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = lloyd_kmeans(emb, k=8, iters=3).select("vec_id", "cid")
    vecs = assigned.join(emb.select("vec_id", "embedding"), "vec_id")

    x = vecs.select(
        F.col("cid"),
        F.col("vec_id").alias("id_x"),
        F.col("embedding").alias("emb_x"),
    )
    y = vecs.select(
        F.col("cid"),
        F.col("vec_id").alias("id_y"),
        F.col("embedding").alias("emb_y"),
    )
    dropped = (
        x.join(y, "cid")
        .filter(F.col("id_x") < F.col("id_y"))
        .filter(
            F.round(cosine(F.col("emb_x"), F.col("emb_y")), 6) >= _SEMDEDUP_TAU
        )
        .select(F.col("id_y").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(
            dropped.withColumn("is_dropped", F.lit(1)), "vec_id", "left"
        )
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.count("is_dropped").alias("n_dropped"),
        )
    )


# --------------------------------------------------------------------------
# D55 — cluster purity: the standard external cluster-quality metric
# (max label fraction per cluster) over the d39 assignment, joined to the
# embeddings' labels. On this corpus labels are random, so purity ~ the
# modal-label base rate — the oracle checks the VALUE, not a quality bar,
# replaying the same training loop CTEs. Ties on the modal label break to
# the smallest label id on both engines.
# --------------------------------------------------------------------------
@register(
    "d55_cluster_purity",
    oracle=f"""
    WITH {_KMEANS_CTES},
    labeled AS (
        SELECT a3.cid, e.label
        FROM a3 JOIN embeddings e ON e.vec_id = a3.vec_id
    ), lab_counts AS (
        SELECT cid, label, COUNT(*) AS n
        FROM labeled GROUP BY cid, label
    ), modal AS (
        SELECT cid, label AS modal_label, n AS modal_n FROM (
            SELECT cid, label, n,
                   row_number() OVER (PARTITION BY cid
                                      ORDER BY n DESC, label) AS rk
            FROM lab_counts) WHERE rk = 1
    ), tot AS (
        SELECT cid, COUNT(*) AS sz FROM labeled GROUP BY cid
    )
    SELECT m.cid,
           CAST(t.sz AS BIGINT)        AS n_members,
           CAST(m.modal_label AS INT)  AS modal_label,
           ROUND(m.modal_n * 1.0 / t.sz, 4) AS purity
    FROM modal m JOIN tot t USING (cid)
    """,
)
def d55_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = lloyd_kmeans(emb, k=8, iters=3).select("vec_id", "cid")
    labeled = assigned.join(emb.select("vec_id", "label"), "vec_id")
    lab_counts = labeled.groupBy("cid", "label").agg(F.count("*").alias("n"))
    w = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
    modal = (
        lab_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cid",
            F.col("label").alias("modal_label"),
            F.col("n").alias("modal_n"),
        )
    )
    tot = labeled.groupBy("cid").agg(F.count("*").alias("sz"))
    return (
        modal.join(tot, "cid")
        .select(
            "cid",
            F.col("sz").cast("bigint").alias("n_members"),
            F.col("modal_label").cast("int").alias("modal_label"),
            F.round(F.col("modal_n") / F.col("sz"), 4).alias("purity"),
        )
    )
