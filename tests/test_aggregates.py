"""Quantitative checks for oracle-less aggregates (SURVEY.md §2d row A3).

`approx_count_distinct` is HLL-based, so no DuckDB hash-match oracle is
possible; instead we bound the relative error against the exact count
computed in the same query. The registered rsd is 0.02 — HLL's error is
approximately normal with that std-dev, so 3·rsd is a ~99.7% bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_on_spark_spark.plans import registry


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """a3 now emits the verdict itself (exact count + within_tol boolean,
    so the driver can oracle-check it); assert every group is in-tolerance
    and the exact side is sane."""
    fn = registry.queries()["a3_approx_count_distinct"]
    rows = fn(spark, sf_dir).collect()
    assert rows, "a3 returned no groups"
    for r in rows:
        assert r["exact_customers"] > 0
        assert r["within_tol"] is True, (
            f"group {r['o_orderstatus']}: HLL estimate outside 3·rsd of "
            f"exact={r['exact_customers']}"
        )


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """`approx_percentile(x, p, accuracy)` (Greenwald-Khanna) guarantees the
    returned value's RANK is within accuracy^-1 of p·n; check the value lies
    between the exact quantiles at p ± 1/accuracy."""
    from pyspark.sql import functions as F

    from lime_on_spark_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    accuracy = 1000
    # 2/accuracy: 1/accuracy for the GK rank guarantee plus headroom for
    # percentile() interpolating between elements while approx returns an
    # actual element.
    eps = 2.0 / accuracy
    for p in (0.5, 0.9, 0.99):
        row = li.agg(
            F.percentile_approx("l_extendedprice", p, accuracy).alias("approx"),
            F.percentile("l_extendedprice", F.lit(max(p - eps, 0.0))).alias("lo"),
            F.percentile("l_extendedprice", F.lit(min(p + eps, 1.0))).alias("hi"),
        ).collect()[0]
        assert row["lo"] <= row["approx"] <= row["hi"], (p, dict(row.asDict()))


def test_hll_sketch_merge_within_tolerance(spark, sf_dir):
    """Per-type sketch estimates AND the hll_union_agg'd ALL row are judged
    in-query (within_tol, the oracle-checkable a3 pattern); assert every
    verdict is true and the exact side is sane."""
    rows = registry.queries()["a3_hll_sketch_merge"](spark, sf_dir).collect()
    by_type = {r["event_type"]: r for r in rows}
    assert "ALL" in by_type and len(by_type) >= 2
    for et, r in by_type.items():
        assert r["exact_users"] > 0
        assert r["within_tol"] is True, dict(r.asDict())


def test_exact_ntile_matches_global_window(spark):
    """The range-partitioned exact-ntile operator must equal SQL ntile for
    ragged sizes (N % n != 0), tiny N < n, and a constant leading key."""
    from pyspark.sql import Window

    from lime_on_spark_spark.operators.exact_ntile import with_exact_ntile

    cases = [(1, 4), (3, 4), (10, 3), (101, 8), (1000, 7)]
    for N, n in cases:
        df = spark.range(N).select((F.col("id") * 37 % 97).alias("v"), "id")
        mine = (
            with_exact_ntile(df, n, ["v", "id"])
            .toPandas()
            .sort_values(["v", "id"])
            .reset_index(drop=True)
        )
        ref = (
            df.select(
                "v", "id", F.ntile(n).over(Window.orderBy("v", "id")).alias("bucket")
            )
            .toPandas()
            .sort_values(["v", "id"])
            .reset_index(drop=True)
        )
        assert (mine["bucket"] == ref["bucket"]).all(), (N, n)
    # Constant leading key: every row in one range — degrades to the
    # single-task case but stays CORRECT.
    df = spark.range(20).select(F.lit(5).alias("v"), "id")
    mine = (
        with_exact_ntile(df, 4, ["v", "id"])
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    ref = (
        df.select("v", "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("bucket"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert (mine["bucket"] == ref["bucket"]).all()
