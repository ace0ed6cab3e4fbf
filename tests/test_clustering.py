"""Unit/property tests for D39 Lloyd's k-means + D40 SemDeDup
(plans/clustering.py, operators/kmeans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_on_spark_spark.operators.kmeans import lloyd_kmeans


def _toy_emb(spark):
    # Two tight blobs far apart; the deterministic seeds (vec_id 0 and 1)
    # land one per blob, so Lloyd's must separate them exactly.
    rows = [
        (0, [0.0, 0.1]),
        (1, [10.1, 10.0]),
        (2, [0.05, 0.05]),
        (3, [10.0, 10.1]),
        (4, [0.1, 0.0]),
        (5, [10.05, 10.05]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_separates_obvious_blobs(spark):
    assigned = lloyd_kmeans(_toy_emb(spark), k=2, iters=3)
    got = {r["vec_id"]: r["cid"] for r in assigned.collect()}
    assert got[0] == got[2] == got[4] == 0
    assert got[1] == got[3] == got[5] == 1


def test_kmeans_inertia_nonincreasing_over_iterations(spark, sf_dir):
    from lime_on_spark_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    inertias = []
    for iters in (1, 2, 3):
        a = lloyd_kmeans(emb, k=8, iters=iters)
        inertias.append(a.agg(F.sum("dist")).collect()[0][0])
    # Lloyd's is monotone up to the 6-dp rounding at iteration boundaries.
    assert inertias[1] <= inertias[0] + 1e-3
    assert inertias[2] <= inertias[1] + 1e-3


def test_kmeans_assignment_is_total_and_deterministic(spark, sf_dir):
    from lime_on_spark_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a1 = lloyd_kmeans(emb, k=8, iters=2)
    a2 = lloyd_kmeans(emb, k=8, iters=2)
    n = emb.count()
    assert a1.count() == n  # every vector assigned exactly once
    assert a1.select("vec_id").distinct().count() == n
    assert a1.exceptAll(a2).count() == 0  # bit-for-bit rerun determinism


def test_semdedup_drops_only_duplicates_with_smaller_neighbor(spark, sf_dir):
    from lime_on_spark_spark.plans.registry import queries

    out = queries()["d40_semantic_dedup"](spark, sf_dir).collect()
    total = sum(r["n_members"] for r in out)
    dropped = sum(r["n_dropped"] for r in out)
    assert total == 500 or total > 0  # all vectors accounted for
    for r in out:
        assert 0 <= r["n_dropped"] < r["n_members"] or r["n_members"] == 0
    # The lowest-id member of any cluster can never be dropped, so at least
    # one survivor exists per cluster.
    assert dropped < total


# ---------------------------------------------------------------------------
# Large-star/small-star connected components (operators/connected_components
# .connected_components_star): the high-diameter path d10/d10b rely on.
# ---------------------------------------------------------------------------


def _path_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a bigint, b bigint"
    )


def test_cc_star_converges_logarithmically_on_long_chain(spark):
    from lime_on_spark_spark.operators.connected_components import (
        connected_components_star,
    )

    n = 300  # diameter 299: min-label would need ~299 rounds
    stats = {}
    comp = connected_components_star(_path_edges(spark, n), stats=stats)
    rows = comp.collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}
    # O(log n) alternations, not O(diameter): log2(300) ~ 8.2.
    assert stats["rounds"] <= 12, stats


def test_cc_star_min_label_parity_on_random_graph(spark):
    import random

    from lime_on_spark_spark.operators.connected_components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    star = {
        (r["node"], r["component"])
        for r in connected_components_star(df).collect()
    }
    prop = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    assert star == prop


def test_cc_min_label_overflow_falls_back_to_star(spark):
    """On a chain whose diameter exceeds the round budget, min-label warns
    and then finishes exactly via star contraction on the label quotient
    graph — never returning silently fragmented components."""
    import warnings as W

    from lime_on_spark_spark.operators.connected_components import (
        connected_components,
    )

    edges = _path_edges(spark, 120)
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        labels = connected_components(edges, max_rounds=25)
        rows = labels.collect()
    assert any(issubclass(c.category, RuntimeWarning) for c in caught)
    assert len(rows) == 120
    assert {r["component"] for r in rows} == {0}  # exact despite overflow


def test_cc_min_label_zero_round_budget_still_exact(spark):
    """max_rounds <= 0 skips the min-label loop entirely; the fallback must
    still warn (without an unbound-name crash) and finish exactly via star
    contraction."""
    import warnings as W

    from lime_on_spark_spark.operators.connected_components import (
        connected_components,
    )

    edges = _path_edges(spark, 12)
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        rows = connected_components(edges, max_rounds=0).collect()
    assert any(issubclass(c.category, RuntimeWarning) for c in caught)
    assert len(rows) == 12
    assert {r["component"] for r in rows} == {0}
