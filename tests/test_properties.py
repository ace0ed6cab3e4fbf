"""Property-based and invariant tests (SURVEY.md §5.3-5.4).

Spark-side algebraic invariants run on small generated frames (hypothesis
drives the data); LSH recall is bounded against brute force on the corpus.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pairs = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=0, max_size=30
)

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(a, b) for a, b in rows] or [(0, 0)], "k int, v int"
    ).limit(len(rows))


# --------------------------------------------------------------------------
# U1-U3 set-op algebra: |A ∪all B| = |A|+|B|; |A ∩all B| + |A \all B| = |A|
# --------------------------------------------------------------------------
@_SLOW
@given(a=pairs, b=pairs)
def test_setop_cardinalities(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.unionAll(db).count() == len(a) + len(b)
    n_intersect = da.intersectAll(db).count()
    n_except = da.exceptAll(db).count()
    assert n_intersect + n_except == len(a)


# --------------------------------------------------------------------------
# D1 dedup idempotence: dedup(dedup(X)) == dedup(X); survivors ⊆ input
# --------------------------------------------------------------------------
@_SLOW
@given(a=pairs)
def test_dedup_idempotent(spark, a):
    from pyspark.sql import functions as F

    df = _df(spark, a)
    once = df.groupBy("k").agg(F.min("v").alias("v"))
    twice = once.groupBy("k").agg(F.min("v").alias("v"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == len({k for k, _ in a})


# --------------------------------------------------------------------------
# W1 rank invariants: dense_rank <= rank <= row_number; rank gaps == tie sizes
# --------------------------------------------------------------------------
@_SLOW
@given(a=pairs)
def test_rank_invariants(spark, a):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = _df(spark, a)
    w = Window.partitionBy("k").orderBy("v")
    out = df.select(
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.row_number().over(w).alias("rn"),
    ).collect()
    for r in out:
        assert r["drk"] <= r["rk"] <= r["rn"]


# --------------------------------------------------------------------------
# P2/pushdown equivalence: filter-then-project == project-then-filter
# --------------------------------------------------------------------------
@_SLOW
@given(a=pairs, cut=st.integers(0, 3))
def test_filter_projection_commute(spark, a, cut):
    from pyspark.sql import functions as F

    df = _df(spark, a)
    lhs = df.filter(F.col("v") >= cut).select((F.col("k") * 2).alias("k2"))
    rhs = df.select((F.col("k") * 2).alias("k2"), "v").filter(
        F.col("v") >= cut
    ).select("k2")
    assert sorted(r["k2"] for r in lhs.collect()) == sorted(
        r["k2"] for r in rhs.collect()
    )


# --------------------------------------------------------------------------
# D2 LSH recall vs D3 brute force (SURVEY §5.3): near-identical documents
# planted next to corpus docs must be recovered by the banded MinHash join.
# --------------------------------------------------------------------------
def test_minhash_lsh_finds_planted_near_dups(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    # Plant exact duplicates under shifted ids: guaranteed Jaccard 1.0 pairs.
    n_planted = 20
    planted = (
        docs.filter(F.col("doc_id") < n_planted)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    from pyspark.ml.feature import HashingTF, MinHashLSH

    spiked = docs.unionByName(planted).select("doc_id", "text")
    shingled = spiked.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, greatest(size(split(text, ' ')) - 3, 0)),"
            " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    feats = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18
    ).transform(shingled)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=5, seed=42
    ).fit(feats)
    pairs_df = model.approxSimilarityJoin(feats, feats, 0.3, distCol="d")
    found = {
        (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
        for r in pairs_df.filter(
            F.col("datasetA.doc_id") + 1_000_000 == F.col("datasetB.doc_id")
        ).collect()
    }
    recall = len(found) / n_planted
    assert recall >= 0.95, f"LSH recall {recall} below bound; found {len(found)}"


# --------------------------------------------------------------------------
# D2 embedding near-dup: the corpus has no pairs above the threshold (max
# pairwise cosine ≈ 0.51 — verified via exact all-pairs), so the operator
# correctly returns empty there; planted duplicates must be found.
# --------------------------------------------------------------------------
def test_embedding_near_dup_finds_planted_pairs(spark, sf_dir):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_planted = 10
    planted = (
        emb.filter(F.col("vec_id") < n_planted)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    spiked = emb.unionByName(planted).select(
        "vec_id", array_to_vector("embedding").alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5,
        numHashTables=4, seed=42,
    )
    pairs = lsh.fit(spiked).approxSimilarityJoin(
        spiked, spiked, 0.3162, distCol="l2_dist"
    )
    found = pairs.filter(
        F.col("datasetA.vec_id") + 1_000_000 == F.col("datasetB.vec_id")
    ).count()
    assert found == n_planted  # exact duplicates always collide in LSH


# --------------------------------------------------------------------------
# J7 as-of join vs pandas merge_asof — independent implementation of the
# same semantics (latest click at-or-before each purchase, per user).
# --------------------------------------------------------------------------
def test_asof_join_matches_pandas_merge_asof(spark, sf_dir):
    import pandas as pd

    from lime_on_spark_spark.plans import registry
    from lime_on_spark_spark.sources.catalog import load_table

    ours = registry.queries()["j7_asof_join"](spark, sf_dir).toPandas()

    events = load_table(spark, sf_dir, "events").toPandas()
    purchases = (
        events[events.event_type == "purchase"]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    clicks = (
        events[events.event_type == "click"]
        .sort_values(["ts", "event_id"])  # ties: max event_id wins (= window order)
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        purchases,
        clicks[["user_id", "ts", "value"]].rename(
            columns={"ts": "last_click_ts", "value": "last_click_value"}
        ),
        left_on="ts",
        right_on="last_click_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    merged = ours.merge(
        expected[["event_id", "last_click_ts", "last_click_value"]],
        left_on="purchase_id",
        right_on="event_id",
        suffixes=("", "_exp"),
    )
    assert len(merged) == len(ours) == len(purchases)
    ts_match = (
        merged["last_click_ts"].isna() & merged["last_click_ts_exp"].isna()
    ) | (merged["last_click_ts"] == merged["last_click_ts_exp"])
    assert ts_match.all()
    val_match = (
        merged["last_click_value"].isna() & merged["last_click_value_exp"].isna()
    ) | ((merged["last_click_value"] - merged["last_click_value_exp"].round(2)).abs() < 1e-9)
    assert val_match.all()


# --------------------------------------------------------------------------
# Salting (skew mitigation): salted results must equal the plain ones, and
# the salted partial stage must spread a hot key over many partitions.
# --------------------------------------------------------------------------
def test_salted_sum_equals_plain_sum(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.salting import salted_sum
    from lime_on_spark_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("total"))
    salted = salted_sum(li, "l_returnflag", "l_quantity", n_salts=8)
    p = {r["l_returnflag"]: round(r["total"], 6) for r in plain.collect()}
    s = {r["l_returnflag"]: round(r["total"], 6) for r in salted.collect()}
    assert p == s


def test_salted_join_equals_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.salting import salted_join_small_build
    from lime_on_spark_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join_small_build(
            orders.withColumnRenamed("o_custkey", "custkey"),
            cust.withColumnRenamed("c_custkey", "custkey"),
            "custkey",
            n_salts=4,
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


# --------------------------------------------------------------------------
# D8b — stratified sampling: deterministic under a fixed seed, and each
# stratum's realized rate is within a binomial-tail bound of its target.
# --------------------------------------------------------------------------
def test_stratified_sample_deterministic_and_in_bounds(spark, sf_dir):
    import math

    from pyspark.sql import functions as F

    from lime_on_spark_spark.plans import registry
    from lime_on_spark_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    fractions = {lang: (0.2 if lang == "en" else 0.8) for lang in langs}

    def counts():
        return {
            r["lang"]: r["n"]
            for r in docs.sampleBy("lang", fractions, seed=42)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    a, b = counts(), counts()
    assert a == b, "same seed must produce the identical sample"

    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in totals.items():
        frac = fractions[lang]
        got = a.get(lang, 0)
        # 5-sigma binomial bound: Bernoulli sampling, not exact-count.
        tol = 5 * math.sqrt(n * frac * (1 - frac)) + 1
        assert abs(got - n * frac) <= tol, (lang, got, n, frac)

    # and the registry entry's in-query verdicts hold
    for r in registry.queries()["d8_stratified_sample"](spark, sf_dir).collect():
        assert r["rate_ok"] is True, dict(r.asDict())


# --------------------------------------------------------------------------
# Connected components vs an independent union-find on random graphs
# --------------------------------------------------------------------------
@_SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from lime_on_spark_spark.operators.connected_components import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "a int, b int")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_rounds=30).collect()
    }

    # independent reference: classic union-find with path compression
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want, (edges, got, want)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cdc_chunks_conserve_text(spark, texts):
    """CDC chunking invariant: concatenating a doc's chunks in order
    reproduces the original text exactly — no byte lost or duplicated,
    for arbitrary printable payloads (boundary-at-end, no-boundary, and
    adjacent-boundary cases all covered by generation)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    vals = F.transform(F.split("text", ""), lambda c: F.ascii(c))
    bs = F.array_compact(
        F.transform(vals, lambda v, i: F.when(v % 16 == 7, i + 1))
    )
    n = F.length("text")
    with_bs = df.select("doc_id", "text", n.alias("n"), bs.alias("bs"))
    ends = F.when(
        (F.size("bs") == 0) | (F.element_at("bs", -1) != F.col("n")),
        F.concat("bs", F.array("n")),
    ).otherwise(F.col("bs"))
    with_ends = with_bs.select("doc_id", "text", ends.alias("ends"))
    st_ = lambda j: F.when(j == 1, F.lit(1)).otherwise(  # noqa: E731
        F.element_at(F.col("ends"), (j - 1).cast("int")) + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("ends")),
        lambda j: F.col("text").substr(
            st_(j), F.element_at(F.col("ends"), j.cast("int")) - st_(j) + 1
        ),
    )
    got = {
        r["doc_id"]: r["joined"]
        for r in with_ends.select(
            "doc_id", F.array_join(chunks, "").alias("joined")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == t, (i, t, got[i])


def test_kmeans_assignment_is_nearest_centroid(spark, sf_dir):
    """Every vector's assigned cell must be the true argmin over the final
    centroid set (recomputed in NumPy from the assignment itself)."""
    import numpy as np

    from lime_on_spark_spark.operators.kmeans import lloyd_kmeans
    from lime_on_spark_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = lloyd_kmeans(emb, k=4, iters=2)
    rows = (
        assigned.join(emb, "vec_id")
        .select("vec_id", "cid", "embedding")
        .collect()
    )
    X = {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64) for r in rows}
    cid = {int(r["vec_id"]): int(r["cid"]) for r in rows}
    # Recompute the PENULTIMATE centroids (the ones the final assignment
    # used): centroid c = rounded mean of vectors assigned to c at iter 1.
    a1 = lloyd_kmeans(emb, k=4, iters=1)
    groups: dict[int, list] = {}
    for r in a1.collect():
        groups.setdefault(int(r["cid"]), []).append(X[int(r["vec_id"])])
    cents = {
        c: np.round(np.mean(np.stack(vs), axis=0), 6) for c, vs in groups.items()
    }
    for v, x in X.items():
        dists = {
            c: round(float(((x - m) ** 2).sum()), 6) for c, m in cents.items()
        }
        best = min(dists, key=lambda c: (dists[c], c))
        assert cid[v] == best, (v, cid[v], best, dists)


def test_merged_interval_lengths_matches_set_union(spark):
    """Property: for random keyed closed integer intervals (overlapping,
    nested, duplicated, touching), the windowed interval-union merge must
    equal the brute-force set union per key. Fixed seed; shapes chosen to
    hit every merge case (single, chains, containment, point intervals)."""
    import random

    from lime_on_spark_spark.operators.intervals import merged_interval_lengths

    rng = random.Random(42)
    rows = []
    expected = {}
    for key in range(20):
        n = rng.randint(1, 12)
        cover = set()
        for _ in range(n):
            s = rng.randint(0, 40)
            e = s + rng.randint(0, 10)
            rows.append((key, s, e))
            cover.update(range(s, e + 1))
        expected[key] = len(cover)
    got = {
        r["doc_id"]: r["covered"]
        for r in merged_interval_lengths(
            spark.createDataFrame(rows, "doc_id int, s int, e int")
        ).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# d89/d90 corpus contract: doc_id is unique in `documents`. The d89 oracle
# left-joins kept-block sums back per (doc_id, source) and d90's prefix sum
# orders by doc_id — a duplicate would silently desynchronize both pins.
# --------------------------------------------------------------------------
def test_documents_doc_id_unique(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.count() == docs.select("doc_id").distinct().count()


import pytest as _pytest


@_pytest.mark.parametrize("seed", [0xD11, 0xBEEF])
def test_manifest_dml_random_walk_matches_model(spark, tmp_path, seed):
    """Model-based check of the connector's DML surface: a seeded random
    walk of append / DELETE / MERGE / compact / vacuum / RESTORE /
    RENAME-cycle / aux-column DROP-lifecycle operations is applied BOTH
    to a json_manifest_sink directory and to a plain Python dict model
    {key: value}; after every operation the connector readback must
    equal the model exactly. Catches the
    interaction-bug class no single-operation test sees (a DELETE after a
    MERGE after a compaction crossing a vacuumed snapshot boundary, DV
    merging across mixed file generations, live-row accounting drift, a
    RESTORE landing on a partially-vacuumed target). The model keeps a
    per-version state history so RESTORE's expected content is the
    model's own snapshot — and the generic CDF check then pins that a
    restore's change feed is ordinary inserts/deletes."""
    import random

    from pyspark.sql import functions as F

    from lime_on_spark_spark.session import temp_conf
    from lime_on_spark_spark.sources.python_source import (
        JsonManifestSink,
        JsonManifestSource,
        _load_manifest,
        delete_where_manifest_path,
        drop_column_manifest_path,
        merge_into_manifest_path,
        rename_column_manifest_path,
        restore_manifest_path,
        vacuum_manifest_path,
    )

    for cls in (JsonManifestSink, JsonManifestSource):
        try:
            spark.dataSource.register(cls)
        except Exception:
            pass
    path = str(tmp_path / f"walk{seed}")
    rng = random.Random(seed)
    model: dict[int, int] = {}
    next_key = 0

    def spark_df(rows):
        return spark.createDataFrame(rows, "i bigint, v bigint")

    def do_append():
        nonlocal next_key
        k = rng.randint(3, 20)
        rows = [(next_key + j, rng.randint(0, 99)) for j in range(k)]
        next_key += k
        spark_df(rows).repartition(rng.randint(1, 3)).write.format(
            "json_manifest_sink"
        ).option("path", path).mode("append").save()
        model.update(dict(rows))

    def do_delete():
        lo = rng.randint(0, max(1, next_key))
        hi = lo + rng.randint(1, 15)
        delete_where_manifest_path(
            spark, path, [("i", "ge", lo), ("i", "lt", hi)]
        )
        for k in [k for k in model if lo <= k < hi]:
            del model[k]

    def do_merge():
        nonlocal next_key
        keys = rng.sample(range(next_key + 5), k=rng.randint(1, 8))
        rows = [(k, rng.randint(100, 199)) for k in sorted(set(keys))]
        merge_into_manifest_path(spark, path, spark_df(rows), "i")
        model.update(dict(rows))
        next_key = max(next_key, max(k for k, _ in rows) + 1)

    def do_compact():
        with temp_conf(
            spark, "spark.sql.python.filterPushdown.enabled", "true"
        ):
            live = (
                spark.read.format("json_manifest_source")
                .option("path", path)
                .load()
                .drop("n_files_read", "n_files_total")
            )
            (
                live.repartition(2)
                .write.format("json_manifest_sink")
                .option("path", path)
                .option("retain_history", "true")
                .mode("overwrite")
                .save()
            )

    def do_vacuum():
        vacuum_manifest_path(path, retain_versions=1)

    def _schema_names():
        return [d.split(" ", 1)[0] for d in _load_manifest(path)["schema"]]

    def do_rename_cycle():
        # v -> w -> v: two metadata-only versions, zero data change. Pins
        # that every later op (scan, DELETE, MERGE, CDF, compaction)
        # survives the mapping indirection mid-walk.
        rename_column_manifest_path(spark, path, "v", "w")
        history[_load_manifest(path)["version"]] = dict(model)
        rename_column_manifest_path(spark, path, "w", "v")

    def do_aux_lifecycle():
        # Additive schema evolution + DROP COLUMN: append rows carrying a
        # throwaway third column, then drop it. Each cycle buries another
        # tombstoned physical (aux, aux#N, ...) that later appends,
        # compactions, restores and change feeds must keep ignoring.
        nonlocal next_key
        k = rng.randint(2, 8)
        rows = [(next_key + j, rng.randint(0, 99)) for j in range(k)]
        next_key += k
        spark.createDataFrame(
            [(i, v, v * 7) for i, v in rows], "i bigint, v bigint, aux bigint"
        ).repartition(1).write.format("json_manifest_sink").option(
            "path", path
        ).mode("append").save()
        model.update(dict(rows))
        history[_load_manifest(path)["version"]] = dict(model)
        drop_column_manifest_path(spark, path, "aux")

    def do_gen_lifecycle():
        # GENERATED COLUMN (s36) toggle: declare g = i mod 7 on an append
        # (every later append/merge/compaction auto-generates it — the
        # model never sees it), or drop it if live. Stresses the rule
        # riding every publish path and the verification arm under
        # compaction's provided-value overwrite.
        nonlocal next_key
        names = _schema_names()
        if "g" in names:
            drop_column_manifest_path(spark, path, "g")
            return
        k = rng.randint(2, 8)
        rows = [(next_key + j, rng.randint(0, 99)) for j in range(k)]
        next_key += k
        spark_df(rows).repartition(1).write.format(
            "json_manifest_sink"
        ).option("path", path).option(
            "generated_columns", '{"g": ["i", "mod", 7]}'
        ).mode("append").save()
        model.update(dict(rows))

    def do_contended_append():
        # OCC under composition (s25 inside the walk): two writers plan
        # against the SAME snapshot at whatever schema/DV/mapping/
        # generated-column state the walk has reached. The winner lands;
        # the staler writer must be refused LOUDLY (before any spool
        # rename — no litter, no version bump) and must succeed on a
        # re-planned retry against the current snapshot. The staged s25
        # row pins this on a fresh table; here the same race is fuzzed
        # over every op composition the walk can produce.
        import os as _os

        nonlocal next_key
        base = _load_manifest(path)["version"]
        ka = rng.randint(2, 8)
        rows_a = [(next_key + j, rng.randint(0, 99)) for j in range(ka)]
        next_key += ka
        kb = rng.randint(2, 8)
        rows_b = [(next_key + j, rng.randint(0, 99)) for j in range(kb)]
        next_key += kb

        def append(rows, expected):
            (
                spark_df(rows)
                .repartition(1)
                .write.format("json_manifest_sink")
                .option("path", path)
                .option("expected_version", str(expected))
                .mode("append")
                .save()
            )

        append(rows_a, base)  # writer A wins the race
        model.update(dict(rows_a))
        v_after_a = _load_manifest(path)["version"]
        history[v_after_a] = dict(model)
        stale_accepted = False
        try:
            append(rows_b, base)  # writer B planned against base too
            stale_accepted = True
        except Exception as exc:  # noqa: BLE001 — Py4J wraps the error
            assert "concurrent commit conflict" in str(exc), exc
        assert not stale_accepted, (
            "stale expected_version commit was accepted"
        )
        after = _load_manifest(path)
        assert after["version"] == v_after_a, (
            "refused commit advanced the table version"
        )
        assert not any(
            n.startswith("_temp-") for n in _os.listdir(path)
        ), "conflict left spool litter behind"
        append(rows_b, after["version"])  # B re-plans and retries
        model.update(dict(rows_b))

    clone_seq = [0]

    def do_clone():
        # SHALLOW CLONE isolation (s31 inside the walk): a clone taken at
        # ANY reachable table state must read back exactly the model, and
        # a subsequent append to the SOURCE must not leak into it (clone
        # divergence is copy-on-write by construction). The clone is not
        # re-checked at walk end: a later source vacuum/compaction can
        # legitimately dangle its symlinks — the documented Delta
        # shallow-clone hazard, not an invariant violation.
        from lime_on_spark_spark.sources.python_source import (
            clone_manifest_path,
        )

        nonlocal next_key
        clone_seq[0] += 1
        dst = str(tmp_path / f"clone{seed}_{clone_seq[0]}")
        clone_manifest_path(spark, path, dst)
        snapshot = dict(model)

        def clone_state():
            with temp_conf(
                spark, "spark.sql.python.filterPushdown.enabled", "true"
            ):
                return {
                    r["i"]: r["v"]
                    for r in spark.read.format("json_manifest_source")
                    .option("path", dst)
                    .load()
                    .collect()
                }

        assert clone_state() == snapshot, "clone diverged from source"
        # Mutate the SOURCE; the clone must not see it.
        k = rng.randint(2, 6)
        rows = [(next_key + j, rng.randint(0, 99)) for j in range(k)]
        next_key += k
        spark_df(rows).repartition(1).write.format(
            "json_manifest_sink"
        ).option("path", path).mode("append").save()
        model.update(dict(rows))
        assert clone_state() == snapshot, (
            "source append leaked into the shallow clone"
        )

    #: version -> model snapshot at that version (RESTORE's expectation).
    history: dict[int, dict[int, int]] = {}

    def do_restore():
        cur = _load_manifest(path)["version"]
        target = rng.randint(1, cur)
        try:
            restore_manifest_path(spark, path, target)
        except FileNotFoundError:
            return  # vacuumed target: legal loud refusal, state unchanged
        model.clear()
        model.update(history[target])
        history[_load_manifest(path)["version"]] = dict(model)
        # The restore may land on a mid-DDL snapshot (schema (i, w) or
        # (i, v, aux)); re-normalize to the walk's (i, v) invariant the
        # way a real operator would — with the same DDL primitives.
        names = _schema_names()
        if "w" in names:
            rename_column_manifest_path(spark, path, "w", "v")
        if "aux" in names:
            drop_column_manifest_path(spark, path, "aux")

    from lime_on_spark_spark.sources.python_source import (
        changes_between_manifest_path,
    )

    do_append()  # the walk starts from a committed table
    history[_load_manifest(path)["version"]] = dict(model)
    ops = [
        do_append,
        do_delete,
        do_merge,
        do_compact,
        do_vacuum,
        do_restore,
        do_rename_cycle,
        do_aux_lifecycle,
        do_gen_lifecycle,
        do_contended_append,
        do_clone,
    ]
    # Every op runs at least once in every walk (a pure rng.choice walk
    # can silently never pick an op, testing nothing); a seeded random
    # mix tops the schedule up, shuffled together. r17: extras trimmed
    # 8 -> 3 per seed so the two-seed walk fits the driver's pytest time
    # cap — every op still runs >= once per seed and every per-step
    # assertion (model equality, net + per-commit CDF replay, row-id
    # uniqueness) is unchanged.
    schedule = list(ops) + [rng.choice(ops) for _ in range(3)]
    rng.shuffle(schedule)
    for step, op in enumerate(schedule):
        prev_model = dict(model)
        prev_version = _load_manifest(path)["version"]
        op()
        history[_load_manifest(path)["version"]] = dict(model)
        cur_version = _load_manifest(path)["version"]
        # CDF consistency: the change feed between any two adjacent walk
        # versions, applied to the previous state (deletes first, then
        # inserts — the merge-update and compaction-churn ordering), must
        # reproduce the new state exactly. Skipped across a vacuum (it
        # publishes no new version) and when history was just reclaimed.
        if op is not do_vacuum and cur_version > prev_version:
            try:
                feed = changes_between_manifest_path(
                    spark, path, prev_version, cur_version
                ).collect()
            except FileNotFoundError:
                feed = None  # prior vacuum reclaimed prev_version
            if feed is not None:
                applied = dict(prev_model)
                for r in feed:
                    if r["_change_type"] == "delete":
                        applied.pop(r["i"], None)
                for r in feed:
                    if r["_change_type"] == "insert":
                        applied[r["i"]] = r["v"]
                assert applied == model, (
                    f"CDF application diverged after step {step} "
                    f"(v{prev_version} -> v{cur_version}, {op.__name__})"
                )
                # Per-commit attribution (s38): replaying the SAME range
                # commit-by-commit in version order must also reproduce
                # the model — including the intermediate churn the net
                # feed cancels out.
                per = changes_between_manifest_path(
                    spark, path, prev_version, cur_version, per_commit=True
                ).collect()
                applied = dict(prev_model)
                for ver in sorted({r["_commit_version"] for r in per}):
                    batch = [r for r in per if r["_commit_version"] == ver]
                    for r in batch:
                        if r["_change_type"] == "delete":
                            applied.pop(r["i"], None)
                    for r in batch:
                        if r["_change_type"] == "insert":
                            applied[r["i"]] = r["v"]
                assert applied == model, (
                    f"per-commit CDF replay diverged after step {step} "
                    f"(v{prev_version} -> v{cur_version}, {op.__name__})"
                )
        with temp_conf(
            spark, "spark.sql.python.filterPushdown.enabled", "true"
        ):
            # Read WITH row ids: the data must match the model AND the
            # ids must stay a duplicate-free set below the table counter
            # through every op composition (s37's invariant — an id
            # overlap from a mis-carried counter would corrupt every
            # incremental consumer keyed on it).
            rows = (
                spark.read.format("json_manifest_source")
                .option("path", path)
                .option("with_row_ids", "true")
                .load()
                .collect()
            )
        got = {r["i"]: r["v"] for r in rows}
        rids = [r["_row_id"] for r in rows]
        assert len(rids) == len(set(rids)), (
            f"row-id collision after step {step} ({op.__name__})"
        )
        next_rid = _load_manifest(path).get("next_row_id")
        assert next_rid is not None and all(0 <= r < next_rid for r in rids), (
            f"row id outside [0, next_row_id) after step {step}"
        )
        assert got == model, f"divergence after step {step}"
        assert _load_manifest(path)["total_rows"] == len(model), (
            f"live-row accounting drift after step {step}"
        )

    # DESCRIBE HISTORY audit-log consistency (s35) over the whole walk:
    # the retained snapshots must be exactly the contiguous version range
    # [floor, current] (vacuum may have raised the floor, never punched a
    # hole), every entry must carry a stamped op, and every entry's
    # total_rows must equal the model snapshot the walk recorded for that
    # version — the audit trail and the data can never disagree.
    from lime_on_spark_spark.sources.python_source import (
        history_manifest_path,
    )

    hist = history_manifest_path(path)
    versions = [e["version"] for e in hist]
    cur = _load_manifest(path)["version"]
    assert versions == list(range(cur, versions[-1] - 1, -1)), (
        f"history has holes: {versions}"
    )
    known_ops = {
        "APPEND", "OVERWRITE", "DELETE", "MERGE",
        "RENAME COLUMN", "DROP COLUMN", "RESTORE", "CLONE",
    }
    for e in hist:
        assert e["op"] in known_ops, e
        if e["version"] in history:
            assert e["total_rows"] == len(history[e["version"]]), (
                f"audit/data disagreement at v{e['version']}: "
                f"{e['total_rows']} != {len(history[e['version']])}"
            )


@given(
    values=st.lists(
        st.one_of(st.integers(-10**9, 10**9), st.text(max_size=20)),
        min_size=0,
        max_size=200,
    ),
    probes=st.lists(
        st.one_of(st.integers(-10**9, 10**9), st.text(max_size=20)),
        min_size=1,
        max_size=50,
    ),
)
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives(values, probes):
    """The bloom's one soundness obligation: a value that was inserted is
    NEVER reported absent, for any mix of int/str values and any probe —
    false positives cost a file read, a false negative would silently
    drop rows. Exercises the exact writer-insert / reader-probe pair
    (_bloom_bit_positions) the connector shares."""
    from lime_on_spark_spark.sources.python_source import (
        _bloom_bit_positions,
    )

    m, k = 1024, 5
    bits = bytearray(m // 8)
    for v in values:
        for pos in _bloom_bit_positions("c", v, m, k):
            bits[pos // 8] |= 1 << (pos % 8)

    def contains(v) -> bool:
        return all(
            (bits[p // 8] >> (p % 8)) & 1
            for p in _bloom_bit_positions("c", v, m, k)
        )

    for v in values:
        assert contains(v), f"false negative for inserted value {v!r}"
    # Serialization discipline: int and str probes that share a str() form
    # must COLLIDE (a sound false positive) rather than diverge — a
    # writer/reader disagreement here would be a pruning false negative
    # for the twin. Asserted cross-type explicitly: `p in values` would
    # use Python ==, where 5 != "5", and never exercise the collision.
    for v in values:
        if isinstance(v, int):
            assert contains(str(v)), f"str twin of {v!r} must collide"
        else:
            try:  # '²'.isdigit() is True but int('²') raises — just try
                twin = int(v)
            except ValueError:
                continue
            if str(twin) == v:  # "05" has no int twin with its text form
                assert contains(twin), f"int twin of {v!r} must collide"


@given(
    n_rows=st.integers(1, 60),
    dv_a=st.sets(st.integers(0, 59)),
    dv_extra=st.sets(st.integers(0, 59)),
    data=st.data(),
)
@settings(max_examples=100, deadline=None)
def test_cdf_task_plan_model(n_rows, dv_a, dv_extra, data, tmp_path_factory):
    """Pure-metadata model check of _cdf_tasks: for a synthetic pair of
    manifests (shared files with growing DVs, added files, removed
    files), the planned (mode, positions, change_type) tasks must imply
    exactly the model's row-level delta — without reading any data."""
    import json as j
    import os

    from lime_on_spark_spark.sources.python_source import _cdf_tasks

    tmp = tmp_path_factory.mktemp("cdfplan")
    path = str(tmp)
    dv_a = {p for p in dv_a if p < n_rows}
    dv_b = dv_a | {p for p in dv_extra if p < n_rows}
    removed_file = data.draw(st.booleans())
    added_file = data.draw(st.booleans())

    def dv_sidecar(name, positions):
        dv_name = f"dv-{name}"
        with open(os.path.join(path, dv_name), "w") as fh:
            j.dump({"file": name, "positions": sorted(positions)}, fh)
        return dv_name

    schema = ["i bigint"]
    shared = {"name": "shared.json", "n_rows": n_rows}
    old_files = [dict(shared)]
    new_files = [dict(shared)]
    if dv_a:
        old_files[0]["dv"] = dv_sidecar("a-shared.json", dv_a)
    if dv_b:
        new_files[0]["dv"] = dv_sidecar("b-shared.json", dv_b)
    if removed_file:
        gone = {"name": "gone.json", "n_rows": 10}
        if data.draw(st.booleans()):
            gone["dv"] = dv_sidecar("gone.json", {1, 3})
        old_files.append(gone)
    if added_file:
        new_files.append({"name": "new.json", "n_rows": 7})
    for v, files in ((1, old_files), (2, new_files)):
        with open(os.path.join(path, f"_MANIFEST-v{v}.json"), "w") as fh:
            j.dump({"files": files, "schema": schema, "version": v}, fh)

    tasks, new_manifest = _cdf_tasks(path, 1, 2)
    by_file = {(t[0], t[3]): t for t in tasks}

    # Model: shared file contributes include-deletes for dv_b - dv_a.
    newly = dv_b - dv_a
    if newly:
        t = by_file[("shared.json", "delete")]
        assert t[1] == "include" and set(t[2]) == newly
    else:
        assert ("shared.json", "delete") not in by_file
    # Removed file: exclude-delete of its live rows at v1 — the exclusion
    # set must be EXACTLY its v1 deletion vector (an empty set here would
    # resurrect already-deleted rows as churn deletes).
    if removed_file:
        t = by_file[("gone.json", "delete")]
        assert t[1] == "exclude"
        expected_dv = {1, 3} if any(
            f["name"] == "gone.json" and f.get("dv") for f in old_files
        ) else set()
        assert set(t[2]) == expected_dv
    # Added file: exclude-insert against its v2 DV (none here).
    if added_file:
        t = by_file[("new.json", "insert")]
        assert t[1] == "exclude" and set(t[2]) == set()
    expected_n = (
        (1 if newly else 0) + (1 if removed_file else 0)
        + (1 if added_file else 0)
    )
    assert len(tasks) == expected_n


@given(
    values=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=300,
    ),
    n_groups=st.integers(1, 8),
)
@settings(max_examples=100, deadline=None)
def test_a27_digest_rank_error_bound(values, n_groups):
    """Property: however the values are split into 'nation' groups, the
    merged a27 digest's p50/p90 estimates stay within the structural
    error bound — the widest merged cluster's value span plus one
    original chunk span (equal-weight clustering bounds RANK error by
    ~total/K; translating to VALUE error is bounded by the spans of the
    clusters the target rank can fall in). Catches regressions where the
    merge re-chunking drops or double-counts weight, whatever the split."""
    import numpy as np
    import pandas as pd

    from lime_on_spark_spark.plans.aggregates import (
        _a27_digest,
        _a27_merge_quantiles,
    )

    # Deterministic round-robin split into groups (the property must hold
    # for ANY split; round-robin over a sorted copy maximizes group
    # overlap, the merge's hard case).
    groups: list[list[float]] = [[] for _ in range(n_groups)]
    for i, v in enumerate(sorted(values)):
        groups[i % n_groups].append(v)
    digests = [
        _a27_digest(
            pd.DataFrame({"n_regionkey": [0] * len(g), "c_acctbal": g})
        )
        for g in groups
        if g
    ]
    merged_in = pd.concat(digests, ignore_index=True)
    est = _a27_merge_quantiles(merged_in)
    arr = np.sort(np.asarray(values, dtype="float64"))
    n = len(arr)
    for p, col in ((0.5, "est_p50"), (0.9, "est_p90")):
        got = float(est[col].iloc[0])
        # RANK-error guarantee (the t-digest/GK contract — VALUE error is
        # unboundable when an adversarial gap sits at the quantile): the
        # fraction of values at-or-around the estimate must bracket p
        # within ~2 cluster weights (2/K per merge level => 4/K total)
        # plus the 1/n nearest-rank-vs-interpolated slack.
        rank_lo = float(np.searchsorted(arr, got, side="left")) / n
        rank_hi = float(np.searchsorted(arr, got, side="right")) / n
        slack = 4.0 / 16 + 1.0 / n + 1e-9
        assert rank_lo - slack <= p <= rank_hi + slack, (
            p, got, rank_lo, rank_hi, n,
        )


def test_url_canonicalizer_invariances(spark):
    """Property: d101's canonicalizer is invariant to every nuisance a
    crawl log carries — host casing, trailing slashes, query-param order,
    tracking params (utm_*/fbclid/gclid/ref_src), and the fragment — and
    is IDEMPOTENT (canonicalizing an already-canonical URL with a scheme
    prefixed is a fixed point). Randomized construction, fixed seed."""
    import random

    from pyspark.sql import functions as F

    from lime_on_spark_spark.plans.datapipe import canonical_url

    rng = random.Random(0xC0FFEE)
    rows = []
    for i in range(120):
        host = "Docs.Example.COM"
        path = f"/a/b{i % 9}"
        kept = [f"id={i % 9}", f"lang=l{i % 4}", f"page={i % 3}"]
        clean = (
            f"https://{host.lower()}{path}?" + "&".join(sorted(kept))
        )
        noise = [
            f"utm_source=s{rng.randint(0, 5)}",
            f"utm_campaign=c{rng.randint(0, 5)}",
            f"fbclid=x{rng.randint(0, 99)}",
            f"gclid=g{rng.randint(0, 99)}",
            f"ref_src=r{rng.randint(0, 9)}",
        ]
        params = kept + rng.sample(noise, k=rng.randint(0, len(noise)))
        rng.shuffle(params)
        dirty = (
            "https://"
            + (host.upper() if i % 2 else host.lower())
            + path
            + ("/" * rng.randint(0, 2))
            + "?"
            + "&".join(params)
            + (f"#frag{rng.randint(0, 9)}" if i % 3 else "")
        )
        rows.append((i, dirty, clean))
    df = spark.createDataFrame(rows, "i int, dirty string, clean string")
    out = df.select(
        "i",
        canonical_url(F.col("dirty")).alias("c_dirty"),
        canonical_url(F.col("clean")).alias("c_clean"),
        # Idempotence: canonicalizing a canonical form (re-prefixed with
        # the scheme parse_url needs) must be a fixed point.
        canonical_url(
            F.concat(F.lit("https://"), canonical_url(F.col("dirty")))
        ).alias("c_twice"),
    ).collect()
    for r in out:
        assert r["c_dirty"] == r["c_clean"], (r["i"], r["c_dirty"], r["c_clean"])
        assert r["c_twice"] == r["c_dirty"], (r["i"], r["c_twice"])
    # Query-less / bare-? / all-tracking URLs: the same resource, so all
    # three canonicalize to the SAME non-NULL 'host/path?' form (a NULL
    # here would collapse every query-less URL into one dedup group).
    edge = spark.createDataFrame(
        [
            ("https://Docs.Example.COM/a/b",),
            ("https://docs.example.com/a/b/?",),
            ("https://docs.example.com/a/b?utm_source=x&fbclid=y#f",),
        ],
        "u string",
    ).select(canonical_url(F.col("u")).alias("c")).collect()
    forms = {r["c"] for r in edge}
    assert forms == {"docs.example.com/a/b?"}, forms


# --------------------------------------------------------------------------
# Deterministic-hash utility contracts (r14 verdict task 7): md5-split,
# winnowing tie-break, banded-LSH keys. Each has a cross-engine contract
# that previously lived only in oracle agreement; these pin it against
# pure-Python mirrors and the algebraic invariances the plans rely on.
# --------------------------------------------------------------------------
def test_md5_split_label_properties(spark):
    """d8's split: (1) engine-portable — Spark's label equals the hashlib
    mirror (the DuckDB oracle's derivation) on randomized int64 keys;
    (2) total and disjoint by construction (one label per key);
    (3) rates near 12/2/2 sixteenths; (4) repartition-invariant."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from lime_on_spark_spark.plans.datapipe import md5_split_label

    rng = random.Random(8)
    ids = [rng.randrange(0, 2**62) for _ in range(1500)] + list(range(50))

    def mirror(i: int) -> str:
        nib = hashlib.md5(str(i).encode()).hexdigest()[0]
        return "train" if nib < "c" else ("val" if nib < "e" else "test")

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in df.select(
            "doc_id", md5_split_label(F.col("doc_id")).alias("split")
        ).collect()
    }
    assert got == {i: mirror(i) for i in ids}
    # Rate sanity: 75% / 12.5% / 12.5% within 4 sigma of binomial noise.
    n = len(ids)
    from collections import Counter

    c = Counter(got.values())
    for label, p in (("train", 0.75), ("val", 0.125), ("test", 0.125)):
        sigma = (p * (1 - p) / n) ** 0.5
        assert abs(c[label] / n - p) < 4 * sigma + 0.01, (label, c)
    # Fan-out invariance: assignment is per-row, so any repartitioning
    # yields the identical mapping.
    re = {
        r["doc_id"]: r["split"]
        for r in df.repartition(13)
        .select("doc_id", md5_split_label(F.col("doc_id")).alias("split"))
        .collect()
    }
    assert re == got


def _winnow_mirror(tokens: list[str], k: int, w: int) -> set[int]:
    """Pure-Python winnowing mirror: min 32-bit-md5-prefix VALUE per
    w-shingle window (full windows only), distinct."""
    import hashlib

    sh = [
        " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
    ]
    h = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
    return {min(h[i - w + 1 : i + 1]) for i in range(w - 1, len(h))}


def test_winnow_fingerprints_mirror_and_span_guarantee(spark):
    """Winnowing: (1) Spark fingerprint sets equal the pure-Python mirror
    on randomized token docs (incl. heavy repetition — the tie case:
    value-only min makes the set invariant to WHICH position attains the
    min); (2) the Schleimer guarantee — two docs sharing a verbatim run
    of >= k + w - 1 tokens share >= 1 fingerprint."""
    import random

    from pyspark.sql import functions as F

    from lime_on_spark_spark.plans.textpipe import (
        _SPAN_K,
        _SPAN_W,
        winnow_fingerprints,
    )

    k, w = _SPAN_K, _SPAN_W
    rng = random.Random(64)
    vocab = [f"w{j}" for j in range(9)]  # tiny vocab -> many hash ties
    docs = {}
    for d in range(20):
        docs[d] = [rng.choice(vocab) for _ in range(rng.randint(k, 60))]
    # Plant an exactly (k + w - 1)-token shared run into pairs (20+2i,
    # 20+2i+1) at random offsets.
    planted = []
    for i in range(6):
        run = [rng.choice(vocab) for _ in range(k + w - 1)]
        a, b = 40 + 2 * i, 41 + 2 * i
        for d in (a, b):
            base = [rng.choice(vocab) for _ in range(rng.randint(10, 40))]
            at = rng.randint(0, len(base))
            docs[d] = base[:at] + run + base[at:]
        planted.append((a, b))
    rows = []
    for d, toks in docs.items():
        for pos0, i in enumerate(range(len(toks) - k + 1)):
            rows.append((d, pos0 + 1, " ".join(toks[i : i + k])))
    sh = spark.createDataFrame(rows, "doc_id long, pos int, shingle string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(sh, w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for d, toks in docs.items():
        assert got.get(d, set()) == _winnow_mirror(toks, k, w), d
    for a, b in planted:
        assert got[a] & got[b], (a, b, "planted shared span lost")


def test_minhash_band_keys_mirror_and_set_invariance(spark):
    """d45's banded-LSH keys: (1) equal the hashlib mirror (= the DuckDB
    oracle's derivation) on randomized shingle sets; (2) pure function of
    the shingle SET — duplicating rows and shuffling order changes
    nothing; (3) identical sets share ALL band keys (the self-pairing
    completeness the candidate join relies on)."""
    import hashlib
    import random

    from lime_on_spark_spark.plans.textpipe import minhash_band_keys

    rng = random.Random(45)
    sets = {
        d: {f"s{rng.randrange(200)}" for _ in range(rng.randint(1, 30))}
        for d in range(12)
    }
    sets[100] = set(sets[0])  # identical twin of doc 0

    def mirror(shingles: set[str]) -> dict[int, str]:
        mh = [
            min(hashlib.md5(f"{j}:{s}".encode()).hexdigest() for s in shingles)
            for j in range(12)
        ]
        return {b: "|".join(mh[3 * b : 3 * b + 3]) for b in range(4)}

    rows = [(d, s) for d, ss in sets.items() for s in ss]
    # Multiplicity + order nuisances: duplicate every 3rd row, shuffle.
    rows = rows + rows[::3]
    rng.shuffle(rows)
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got: dict[int, dict[int, str]] = {}
    for r in minhash_band_keys(sh).collect():
        got.setdefault(r["doc_id"], {})[r["band"]] = r["bkey"]
    for d, ss in sets.items():
        assert got[d] == mirror(ss), d
    assert got[100] == got[0]


def test_badwords_hits_matches_python_mirror(spark):
    """d106's hit counter: randomized docs + randomized blocklists must
    match a pure-Python whole-token mirror exactly (occurrences, not
    distinct terms; no substring matches; empty docs -> 0)."""
    import random

    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.c4_clean import badwords_hits

    rng = random.Random(106)
    vocab = ["a", "ab", "abc", "dup", "dupx", "slow", "slowly", "q"]
    cases = []
    for i in range(200):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 25))]
        cases.append((i, " ".join(toks)))
    blocklist = ("dup", "slow", "a")  # prefixes of other vocab entries
    df = spark.createDataFrame(cases, "i int, text string")
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i", badwords_hits("text", blocklist).alias("h")
        ).collect()
    }
    want = {
        i: sum(1 for t in text.split(" ") if t in blocklist)
        for i, text in cases
    }
    assert got == want


def test_dedup_lines_tiebreak_adversarial_skew(spark):
    """r16 (r15 verdict task 4): d107's keep-first winner under planted
    duplicate lines STRADDLING doc boundaries with conflicting
    (doc_id, line_idx) orders and a skewed key distribution — one hot
    line duplicated across most docs (all its copies land on ONE md5
    reducer), plus pairs where doc order and line order disagree (the
    winner must be lexicographic min on (doc_id, line_idx), e.g. (1, 9)
    beats (2, 0)). Winners must match a pure-Python mirror exactly and
    be byte-identical under re-sharding."""
    import random

    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.c4_clean import (
        dedup_lines_keep_first,
    )

    rng = random.Random(107)
    rows: list[tuple[int, int, str, str]] = []
    # Hot key: line "hot" in 150 of 160 docs at random line positions —
    # the skewed reducer. Include the conflicting-order pair explicitly.
    rows.append((1, 9, "s1", "hot"))
    rows.append((2, 0, "s2", "hot"))
    for d in range(3, 153):
        rows.append((d, rng.randint(0, 30), f"s{d % 5}", "hot"))
    # 30 cold lines, each duplicated 2-4 times across random docs with
    # adversarial index order (later doc, earlier index and vice versa).
    for j in range(30):
        text = f"cold line {j}"
        for _ in range(rng.randint(2, 4)):
            rows.append(
                (rng.randint(1, 160), rng.randint(0, 30), "sc", text)
            )
    # Unique (doc_id, line_idx) key required by the operator contract:
    # drop planted collisions (same doc, same idx) keeping the first.
    seen: set[tuple[int, int]] = set()
    uniq = []
    for d, i, s, t in rows:
        if (d, i) not in seen:
            seen.add((d, i))
            uniq.append((d, i, s, t))
    df = spark.createDataFrame(
        uniq, "doc_id long, line_idx long, source string, line string"
    )

    want: dict[str, tuple[int, int, str]] = {}
    for d, i, s, t in uniq:
        if t not in want or (d, i) < want[t][:2]:
            want[t] = (d, i, s)

    def winners(frame):
        return {
            (r["doc_id"], r["line_idx"], r["source"])
            for r in dedup_lines_keep_first(frame).collect()
        }

    expect = {v for v in want.values()}
    assert winners(df) == expect
    # Metamorphic re-shards: winner set invariant under partitioning.
    assert winners(df.repartition(17, "line_idx")) == expect
    assert winners(df.repartition(1)) == expect
    assert (
        winners(df.sortWithinPartitions(F.desc("doc_id"))) == expect
    )


def test_exact_ntile_rank_total_lead_match_sql_window(spark):
    """r16: the new exact_ntile surface (rank_col / total_col /
    lead_expr) must reproduce the single-window SQL semantics exactly —
    randomized Zipf-ish data where most rows tie on the leading key (the
    case lead_expr exists for), compared to row_number()/ntile() over
    one global window."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.exact_ntile import with_exact_ntile

    rng = random.Random(16)
    rows = []
    for i in range(500):
        # Zipfian-ish: ~60% of keys are 1, a long tail above.
        f = 1 if rng.random() < 0.6 else rng.randint(2, 40)
        rows.append((f"w{i:04d}", f))
    df = spark.createDataFrame(rows, "word string, f long")

    lead = (
        F.col("f")
        + F.least(F.ascii(F.col("word")), F.lit(255)) / 256.0
        + F.least(F.ascii(F.substring("word", 2, 1)), F.lit(255)) / 65536.0
    )
    got = {
        r["word"]: (r["rk"], r["nt"], r["n"])
        for r in with_exact_ntile(
            df, 7, ["f", "word"],
            out_col="nt", rank_col="rk", total_col="n", lead_expr=lead,
        ).collect()
    }
    w = Window.orderBy("f", "word")
    want = {
        r["word"]: (r["rk"], r["nt"], 500)
        for r in df.select(
            "word",
            F.row_number().over(w).alias("rk"),
            F.ntile(7).over(w).alias("nt"),
        ).collect()
    }
    assert got == want


def test_exact_ntile_edge_cases(spark):
    """r16: exact_ntile degenerate inputs — a CONSTANT leading key (every
    row ties: all land in one range, the documented worst case — must
    stay correct), an empty frame (no crash, no phantom rows), and fewer
    rows than buckets (SQL: bucket i gets row i)."""
    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.exact_ntile import with_exact_ntile

    # Constant leading key, unique tie-breaker.
    df = spark.createDataFrame(
        [(1, i) for i in range(10)], "f long, k long"
    )
    got = {
        r["k"]: (r["b"], r["rk"])
        for r in with_exact_ntile(
            df, 4, ["f", "k"], out_col="b", rank_col="rk"
        ).collect()
    }
    # 10 rows, 4 buckets: sizes 3,3,2,2 (first total%n buckets get +1).
    want_bucket = [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert got == {i: (want_bucket[i], i + 1) for i in range(10)}

    # Empty input.
    empty = spark.createDataFrame([], "f long, k long")
    assert (
        with_exact_ntile(empty, 4, ["f", "k"], out_col="b").collect() == []
    )

    # Fewer rows than buckets: bucket i = row i.
    small = spark.createDataFrame([(5, 0), (7, 1)], "f long, k long")
    got_s = {
        r["k"]: r["b"]
        for r in with_exact_ntile(small, 4, ["f", "k"], out_col="b").collect()
    }
    assert got_s == {0: 1, 1: 2}


def test_grouped_exact_ntile_matches_sql_window(spark):
    """r16: with_grouped_exact_ntile must reproduce
    ntile(n)/row_number() OVER (PARTITION BY g ORDER BY ...) exactly —
    randomized skewed groups (one giant, one tiny, one singleton, sizes
    not divisible by n) including heavy leading-key ties within groups."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.exact_ntile import (
        with_grouped_exact_ntile,
    )

    rng = random.Random(116)
    rows = []
    for g, size in (("en", 400), ("de", 37), ("zh", 1), ("fr", 5)):
        for i in range(size):
            f = 1 if rng.random() < 0.5 else rng.randint(2, 9)
            rows.append((g, i, f))
    df = spark.createDataFrame(rows, "lang string, k long, f long")

    got = {
        (r["lang"], r["k"]): (r["b"], r["rk"], r["n"])
        for r in with_grouped_exact_ntile(
            df, 3, ["lang"], ["f", "k"],
            out_col="b", rank_col="rk", total_col="n", num_ranges=6,
        ).collect()
    }
    w = Window.partitionBy("lang").orderBy("f", "k")
    want = {
        (r["lang"], r["k"]): (r["b"], r["rk"], r["n"])
        for r in df.select(
            "lang", "k",
            F.ntile(3).over(w).alias("b"),
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
        ).collect()
    }
    assert got == want

    # Empty input survives.
    empty = spark.createDataFrame([], "lang string, k long, f long")
    assert (
        with_grouped_exact_ntile(
            empty, 3, ["lang"], ["f", "k"], out_col="b"
        ).collect()
        == []
    )


def test_d116_bradley_terry_planted_dominance(spark, tmp_path):
    """r16: the BT fit on a planted corpus with a known dominance order.
    Three sources A > B > C by construction (A beats B, B beats C, A
    beats C — one pair each, higher TTR wins) plus an UNPAIRED source D
    (zero comparisons — the ghost regularizer must keep it finite).
    Strengths must rank A, B, C in dominance order and every strength
    must be finite and positive."""
    from lime_on_spark_spark.plans import registry

    # ttr("a b c d") = 1.0 ; ttr("a a b b") = 0.5 — winner is the
    # all-distinct doc. Pairing is (even doc_id d, d+1); doc 6 unpaired.
    rows = [
        (0, "a b c d", "en", "A", 7),   # beats doc 1 (B)
        (1, "a a b b", "en", "B", 7),
        (2, "e f g h", "en", "B", 7),   # beats doc 3 (C)
        (3, "e e f f", "en", "C", 7),
        (4, "i j k l", "en", "A", 7),   # beats doc 5 (C)
        (5, "i i j j", "en", "C", 7),
        (6, "m n o p", "en", "D", 7),   # unpaired
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: r
        for r in registry.queries()["d116_bradley_terry_sources"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"A", "B", "C", "D"}
    assert (got["A"]["wins"], got["B"]["wins"], got["C"]["wins"]) == (2, 1, 0)
    assert got["A"]["comparisons"] == 2 and got["D"]["comparisons"] == 0
    assert (
        got["A"]["strength"] > got["B"]["strength"] > got["C"]["strength"]
    )
    for r in got.values():
        assert r["strength"] > 0
    assert got["A"]["rnk"] == 1


def test_d117_mmr_matches_independent_reference(spark, sf_dir):
    """r16: d117's greedy selection re-derived by an independent NumPy
    implementation over the same 6-dp-rounded cosines — picks, order,
    and scores must match exactly; first pick must be d3's top-1."""
    import numpy as np

    from lime_on_spark_spark.plans import registry

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    q = emb[0]

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    rel = {v: cos(e, q) for v, e in emb.items() if v != 0}
    cand = sorted(rel, key=lambda v: (-rel[v], v))[:20]
    sims = {(a, b): cos(emb[a], emb[b]) for a in cand for b in cand if a != b}
    sel: list[tuple[int, float]] = []
    rest = set(cand)
    for _ in range(5):
        if sel:
            scored = [
                (rel[c] - max(sims[(c, s)] for s, _ in sel), c)
                for c in rest
            ]
        else:
            scored = [(rel[c], c) for c in rest]
        sc, best = max(scored, key=lambda t: (t[0], -t[1]))
        sel.append((best, round(sc, 6)))
        rest.discard(best)

    got = sorted(
        (
            (r["rnk"], r["vec_id"], r["mmr_score"])
            for r in registry.queries()["d117_mmr_rerank"](
                spark, sf_dir
            ).collect()
        )
    )
    want = [(i + 1, v, s) for i, (v, s) in enumerate(sel)]
    assert got == want
    # First pick is the global relevance argmax (d3's top-1).
    assert got[0][1] == cand[0]


def test_d118_exponential_mechanism_invariants(spark, tmp_path):
    """r16: the exact-median arithmetic and mechanism invariants on a
    planted histogram with a known median per source: true_median must
    equal the lower median, util_gap must be >= 0, and the released
    value must come from the source's own value domain."""
    from lime_on_spark_spark.plans import registry

    rows = []
    did = 0
    # src E: lengths [10]*3 + [20]*2 -> n=5, lower median 10 (rank 3).
    # src F: lengths [5, 7, 9, 11] -> n=4, lower median 7 (rank 2).
    for src, lengths in (
        ("E", [10, 10, 10, 20, 20]),
        ("F", [5, 7, 9, 11]),
    ):
        for ln in lengths:
            rows.append((did, "x " * ln, "en", src, ln))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: r
        for r in registry.queries()["d118_dp_quantile_release"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["E"]["n"] == 5 and got["E"]["true_median"] == 10
    assert got["F"]["n"] == 4 and got["F"]["true_median"] == 7
    domains = {"E": {10, 20}, "F": {5, 7, 9, 11}}
    for src, r in got.items():
        assert r["released_median"] in domains[src]
        assert r["util_gap"] >= 0.0


def test_d119_planted_topic_shift(spark, tmp_path):
    """r16: TextTiling on a planted two-topic doc — blocks AA|BB give
    gap cohesions (1, 0, 1): mean 2/3, stddev_pop sqrt(2)/3, threshold
    ~0.431, so exactly the topic-shift gap is a boundary. A uniform
    one-topic doc (all gaps = 1, stddev 0) must yield zero boundaries,
    and a doc shorter than two blocks is excluded."""
    from lime_on_spark_spark.plans import registry

    topic_a = " ".join("a b c d e f g h i j".split())
    topic_b = " ".join("k l m n o p q r s t".split())
    rows = [
        (0, f"{topic_a} {topic_a} {topic_b} {topic_b}", "en", "s0", 0),
        (1, f"{topic_a} {topic_a} {topic_a}", "de", "s0", 0),
        (2, "a b c", "fr", "s0", 0),  # < 2 blocks: excluded
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["lang"]: r
        for r in registry.queries()["d119_texttiling_boundaries"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"en", "de"}
    assert got["en"]["n_gaps"] == 3 and got["en"]["n_boundaries"] == 1
    assert got["de"]["n_gaps"] == 2 and got["de"]["n_boundaries"] == 0
    assert got["de"]["avg_cohesion"] == 1.0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=1,
                   max_size=4),
    n=st.integers(min_value=2, max_value=7),
    tie_frac=st.integers(min_value=0, max_value=9),
)
def test_grouped_exact_ntile_hypothesis(spark, sizes, n, tie_frac):
    """r16: randomized with_grouped_exact_ntile vs the one-window SQL
    semantics — arbitrary group counts/sizes (including singletons and
    sizes not divisible by n) and a drawn leading-key tie rate (up to
    90% of rows tied on f=1, the range-degeneracy worst case)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lime_on_spark_spark.operators.exact_ntile import (
        with_grouped_exact_ntile,
    )

    rng = random.Random(hash((tuple(sizes), n, tie_frac)) & 0xFFFF)
    rows = []
    for gi, size in enumerate(sizes):
        for i in range(size):
            f = 1 if rng.random() < tie_frac / 10 else rng.randint(2, 8)
            rows.append((f"g{gi}", i, f))
    df = spark.createDataFrame(rows, "g string, k long, f long")
    got = {
        (r["g"], r["k"]): (r["b"], r["rk"], r["tot"])
        for r in with_grouped_exact_ntile(
            df, n, ["g"], ["f", "k"],
            out_col="b", rank_col="rk", total_col="tot", num_ranges=4,
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("f", "k")
    want = {
        (r["g"], r["k"]): (r["b"], r["rk"], r["tot"])
        for r in df.select(
            "g", "k",
            F.ntile(n).over(w).alias("b"),
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("tot"),
        ).collect()
    }
    assert got == want


def test_d115_tercile_tie_class_is_deterministic(spark, tmp_path):
    """r16: six docs in one language, ALL with identical text (so every
    scored NLL ties exactly at 6 dp) — the tercile cut must split the
    tie class by doc_id into 2/2/2, identically on every run and under
    re-sharding. Pins the (nll, doc_id) tie-break discipline at the
    bucket boundary, the exact spot a nondeterministic cut would leak."""
    from lime_on_spark_spark.plans import registry

    text = "alpha beta gamma delta epsilon zeta"
    rows = [(i, text, "en", "s0", len(text)) for i in range(6)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def run():
        return sorted(
            (r["bucket"], r["n_docs"])
            for r in registry.queries()["d115_ccnet_perplexity_buckets"](
                spark, str(tmp_path)
            ).collect()
        )

    first = run()
    assert first == [("head", 2), ("middle", 2), ("tail", 2)]
    assert run() == first


def test_d117_shortlist_smaller_than_k(spark, tmp_path):
    """r16: three embeddings -> shortlist of two candidates (query
    excluded) -> the greedy loop must stop at two picks, ranked by the
    MMR rule, instead of padding or crashing."""
    from lime_on_spark_spark.plans import registry

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # query
        (1, [0.9, 0.1, 0.0, 0.0], 1),
        (2, [0.0, 1.0, 0.0, 0.0], 2),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = sorted(
        (r["rnk"], r["vec_id"])
        for r in registry.queries()["d117_mmr_rerank"](
            spark, str(tmp_path)
        ).collect()
    )
    # vec 1 is most relevant (cos ~0.994); vec 2 follows.
    assert got == [(1, 1), (2, 2)]


def test_d116_single_source_corpus(spark, tmp_path):
    """r16: every doc from ONE source -> zero preference pairs (the
    same-source filter drops all) -> the ghost regularizer alone drives
    the fit: one finite positive strength, zero wins/comparisons."""
    from lime_on_spark_spark.plans import registry

    rows = [(i, f"w{i} x y z", "en", "only", 9) for i in range(6)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = registry.queries()["d116_bradley_terry_sources"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source"], r["wins"], r["comparisons"], r["rnk"]) == (
        "only", 0, 0, 1
    )
    assert r["strength"] == 1.0  # sole source: normalized mass is all its
