"""Product quantization (Jégou et al. 2011) over embedding columns — the
memory-compression half of the ANN stack (IVF routes the search,
`operators/ivf.py`; PQ shrinks what each cell stores: 64 float32 = 256
bytes -> M=8 one-byte codes, 32x).

Architecture mirrors `operators/kmeans.py`'s distributed Lloyd loop,
generalized to M independent subspaces trained IN THE SAME JOBS:

* the corpus explodes once to (vec_id, m, subvector) — M rows per vector,
  subvector length d/M;
* centroids are DRIVER state keyed (m, cid) — M*K*(d/M) = K*d doubles,
  bounded by construction — re-broadcast each iteration;
* assignment is an EQUI-join on the subspace id m (broadcast hash, never a
  cross join) -> squared-L2 -> per-(vec_id, m) argmin via
  `min(struct(dist, cid))` (map-side combinable);
* the centroid update is one shuffle: the winning subvector rides the
  argmin struct (cid breaks every tie before sv is compared, and sv is
  group-constant), then posexplode -> avg per (m, cid, pos) — no join
  back to the subvector frame.

Determinism contract (the kmeans.py discipline): init = the K lowest-
vec_id subvectors per subspace, distances rounded to 6 dp before the
argmin with lowest-cid tie-break, centroid coordinates rounded to 6 dp per
iteration — two fits produce identical codes.

ADC (asymmetric distance computation): a query never gets encoded — its
exact distance to every centroid forms a (m, cid) -> dt lookup table
(M*K entries, built driver-side from the driver-held centroids), and the
approximate distance to ANY encoded vector is a SUM OF M TABLE LOOKUPS:
one equi-join of the codes frame against the broadcast table + one keyed
agg. At 100 TB the scan touches only the 8-byte codes — the full-precision
corpus is needed solely to rescore the shortlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lime_on_spark_spark.functions.vector import sq_l2


def _subvectors(emb: DataFrame, m_subspaces: int, sub: int) -> DataFrame:
    """(vec_id, m, sv): the corpus exploded to per-subspace rows."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    parts = [
        F.struct(
            F.lit(m).alias("m"), F.slice(v, m * sub + 1, sub).alias("sv")
        )
        for m in range(m_subspaces)
    ]
    return emb.select(
        "vec_id", F.explode(F.array(*parts)).alias("e")
    ).select("vec_id", "e.m", "e.sv")


def train_pq_variants(
    emb: DataFrame,
    *,
    dim: int,
    m_subspaces: int = 8,
    ks: tuple[int, ...] = (16,),
    iters: int = 3,
) -> tuple[DataFrame, dict[tuple[int, int, int], list[float]]]:
    """Train per-subspace codebooks for EVERY K in ``ks`` in the SAME jobs
    (centroids tagged by their variant, so the capacity-comparison
    training d91 needs costs one pass, not one per K).

    Returns ``(codes, centroids)``: codes = (kk, vec_id, m, cid, dist)
    with dist the rounded squared L2 to the winning centroid (the
    per-subspace quantization error), centroids = {(kk, m, cid): coords}
    driver state (bounded: sum(K)*dim doubles).
    """
    spark = emb.sparkSession
    sub = dim // m_subspaces
    # Every iteration's assignment AND update re-reads the exploded
    # subvector frame; persist so the scan+explode runs once, not once
    # per action. Stays cached for the returned codes' lineage too — the
    # ContextCleaner reclaims it on dereference (the prefix_sum.py note).
    # r17 (guide §2.4): persist PRE-PARTITIONED on vec_id — hash
    # partitioning on a subset of the grouping keys satisfies the
    # per-(kk, vec_id, m) argmin's clustering, so EVERY iteration's
    # assignment aggregation (and the returned codes frame, and the
    # codes-side of IVFADC's cell join) runs without its own corpus
    # shuffle: one upfront exchange replaces `iters` per-iteration ones.
    # Partition count stays conf-driven (spark.sql.shuffle.partitions /
    # AQE), never a local constant.
    svf = _subvectors(emb, m_subspaces, sub).repartition("vec_id").persist()

    # Init = the K lowest DISTINCT vec_ids, ranked 0..K-1 as cids — never
    # `vec_id < K`, which silently trains fewer (or zero) centroids on any
    # corpus whose ids are 1-based, offset, or non-contiguous after an
    # upstream filter. Driver state is O(K) ids.
    kmax = max(ks)
    # ONE top-(K*M) collect fetches both the K lowest distinct vec_ids AND
    # their subvectors (r16 optimization — previously a distinct+limit
    # job followed by a filter+collect job): every vec_id owns exactly
    # m_subspaces rows of svf by construction, so the K*M lowest-ordered
    # rows cover the K lowest ids; one spare id's rows guard the slice.
    # r17: the init TakeOrdered also materializes the persisted svf; with
    # AQE off it is one DAG job instead of one per exchange (the same
    # bounded-subplan rationale as the update collects below). The cached
    # layout is the repartition's static shuffle-partition count — conf-
    # driven, deterministic for a fixed config.
    from lime_on_spark_spark.session import temp_conf

    with temp_conf(spark, "spark.sql.adaptive.enabled", "false"):
        init = (
            svf.select("vec_id", "m", F.col("sv").alias("cvec"))
            .orderBy("vec_id", "m")
            .limit((kmax + 1) * m_subspaces)
            .collect()
        )
    low_ids = sorted({r["vec_id"] for r in init})[:kmax]
    rank = {vid: i for i, vid in enumerate(low_ids)}
    cent: dict[tuple[int, int, int], list[float]] = {
        (kk, int(r["m"]), rank[r["vec_id"]]): [float(x) for x in r["cvec"]]
        for r in init
        if r["vec_id"] in rank
        for kk in ks
        if rank[r["vec_id"]] < kk
    }

    codes: DataFrame | None = None
    for it in range(iters):
        cent_df = spark.createDataFrame(
            [(kk, m, c, v) for (kk, m, c), v in sorted(cent.items())],
            "kk int, m int, cid bigint, cvec array<double>",
        )
        joined = svf.join(F.broadcast(cent_df), "m")
        if it < iters - 1:
            # Update iteration: sv RIDES the argmin struct so the centroid
            # update needs no join back to svf (r16 — previously a shuffle
            # join of the corpus-scale codes frame against svf once per
            # iteration). The winner is unchanged: cid is unique within a
            # (kk, vec_id, m) group, so comparison never reaches sv; and
            # sv is group-constant, so the winning struct carries exactly
            # the group's subvector.
            agg = (
                joined.select(
                    "kk", "vec_id", "m", "cid", "sv",
                    F.round(sq_l2(F.col("sv"), F.col("cvec")), 6).alias(
                        "dist"
                    ),
                )
                .groupBy("kk", "vec_id", "m")
                .agg(F.min(F.struct("dist", "cid", "sv")).alias("x"))
            )
            upd = agg.select(
                "kk", "m",
                F.col("x.cid").alias("cid"),
                F.posexplode("x.sv").alias("pos", "val"),
            ).groupBy("kk", "m", "cid", "pos").agg(
                F.round(F.avg("val"), 6).alias("cv")
            )
            # r17: AQE adds one scheduler job per materialized exchange;
            # this subplan is bounded (sum(K)*dim rows post-aggregation)
            # and its only shuffle is the tiny update agg, so adaptive
            # re-planning buys nothing — run the collect as one DAG job
            # per iteration (VERDICT item 4). Values are unchanged: the
            # cached svf partitioning (not AQE) fixes the avg's input
            # layout, and the 6-dp round absorbs reduce-order noise.
            with temp_conf(spark, "spark.sql.adaptive.enabled", "false"):
                rows = upd.collect()
            nxt: dict[tuple[int, int, int], dict[int, float]] = {}
            for r in rows:
                nxt.setdefault(
                    (int(r["kk"]), int(r["m"]), int(r["cid"])), {}
                )[int(r["pos"])] = float(r["cv"])
            # Empty clusters drop out per (variant, subspace), deterministically.
            cent = {
                key: [dims[p] for p in sorted(dims)]
                for key, dims in sorted(nxt.items())
            }
        else:
            # Final iteration: the returned codes frame — plain
            # (dist, cid) argmin, no sv in the shuffle.
            scored = joined.select(
                "kk", "vec_id", "m", "cid",
                F.round(sq_l2(F.col("sv"), F.col("cvec")), 6).alias("dist"),
            )
            codes = (
                scored.groupBy("kk", "vec_id", "m")
                .agg(F.min(F.struct("dist", "cid")).alias("x"))
                .select(
                    "kk", "vec_id", "m",
                    F.col("x.cid").alias("cid"),
                    F.col("x.dist").alias("dist"),
                )
            )
    assert codes is not None
    return codes, cent


def train_pq(
    emb: DataFrame,
    *,
    dim: int,
    m_subspaces: int = 8,
    k: int = 16,
    iters: int = 3,
) -> tuple[DataFrame, dict[tuple[int, int], list[float]]]:
    """Single-K convenience wrapper around :func:`train_pq_variants`.

    Returns ``(codes, centroids)``: codes = (vec_id, m, cid, dist),
    centroids = {(m, cid): coords} driver state.
    """
    codes, cent = train_pq_variants(
        emb, dim=dim, m_subspaces=m_subspaces, ks=(k,), iters=iters
    )
    return (
        codes.drop("kk"),
        {(m, c): v for (_, m, c), v in cent.items()},
    )


def adc_distances(
    codes: DataFrame,
    cent: dict[tuple[int, int], list[float]],
    queries: list[tuple[int, list[float]]],
    *,
    m_subspaces: int,
    sub: int,
) -> DataFrame:
    """(qid, vec_id, approx): ADC distance of every query to every encoded
    vector — one broadcast equi-join on (m, cid) + one keyed sum, the scan
    touching only codes."""
    spark = codes.sparkSession
    table = [
        (
            qid,
            m,
            cid,
            round(
                sum(
                    (qv[m * sub + j] - cv[j]) ** 2 for j in range(len(cv))
                ),
                6,
            ),
        )
        for qid, qv in queries
        for (m, cid), cv in cent.items()
    ]
    dt = spark.createDataFrame(table, "qid bigint, m int, cid bigint, dt double")
    return (
        codes.join(F.broadcast(dt), ["m", "cid"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("dt").alias("approx"))
    )
