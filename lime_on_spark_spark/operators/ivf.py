"""IVF (inverted-file) approximate nearest neighbor (north-star similarity
search: the cluster-probe scale path alongside LSH in plans/vectors.py).

Index = KMeans centroids over the embedding corpus; each vector is assigned
to its nearest centroid (one partition-friendly transform). A query probes
only the `n_probe` nearest centroid cells, so the scan cost drops from
O(corpus) to O(corpus * n_probe / n_cells) while the in-cell ranking stays
exact cosine.

Scale notes: the centroid table is tiny (k × d doubles) and driver-held;
cell assignment is distributed `model.transform`; the probe filter is a
partition-prunable `cluster IN (...)` predicate. At 100 TB you'd persist
the assigned corpus bucketed by cell id — the probe then touches only
matching buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.functions.vector import cosine
from lime_on_spark_spark.sources.catalog import load_table


#: Fitted indexes memoized per (applicationId, sf_dir, n_cells, seed) — the
#: lime/models.py discipline: an IVF index is built once and amortized over
#: every query against the same corpus (d4_ivf_knn, d63b_* share one fit).
#: applicationId (not id(spark)) keys the cache so a stopped session's
#: DataFrames are never resurrected in a new JVM.
_INDEX_CACHE: dict[tuple, tuple] = {}


def build_ivf_index(spark: SparkSession, sf_dir: str, n_cells: int = 16, seed: int = 42):
    """Fit KMeans cells and return (assigned_df, centroids ndarray)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    key = (spark.sparkContext.applicationId, sf_dir, n_cells, seed)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    # Evict entries from any other application before inserting: only one
    # app is live at a time in this codebase, so stale keys would otherwise
    # pin dead localCheckpoint'd DataFrame handles for the process lifetime.
    app_id = key[0]
    for stale in [k for k in _INDEX_CACHE if k[0] != app_id]:
        del _INDEX_CACHE[stale]
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.withColumn("features", array_to_vector("embedding"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    # localCheckpoint: the cached index must not re-run the fit lineage on
    # every consumer; k x d centroids + the assigned table are tiny
    # relative to any corpus where IVF matters.
    assigned = model.transform(vecs).drop("features").localCheckpoint(eager=True)
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    _INDEX_CACHE[key] = (assigned, centroids)
    return _INDEX_CACHE[key]


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    *,
    k: int = 10,
    n_probe: int = 4,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Probe the n_probe nearest cells, exact cosine top-k within them."""
    q = np.asarray(query_vec, dtype=np.float64)
    dists = np.linalg.norm(centroids - q, axis=1)
    probe_cells = [int(c) for c in np.argsort(dists)[:n_probe]]
    q_col = F.array(*[F.lit(float(v)) for v in q])
    candidates = assigned.filter(F.col("cell").isin(probe_cells))
    if exclude_ids:
        candidates = candidates.filter(~F.col("vec_id").isin(list(exclude_ids)))
    return (
        candidates.select(
            "vec_id",
            "label",
            "cell",
            F.round(cosine(F.col("embedding"), q_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
