"""Quantitative checks for oracle-less aggregates (SURVEY.md §2d row A3).

`approx_count_distinct` is HLL-based, so no DuckDB hash-match oracle is
possible; instead we bound the relative error against the exact count
computed in the same query. The registered rsd is 0.02 — HLL's error is
approximately normal with that std-dev, so 3·rsd is a ~99.7% bound.
"""

from __future__ import annotations

from lime_on_spark_spark.plans import registry


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    fn = registry.queries()["a3_approx_count_distinct"]
    rows = fn(spark, sf_dir).collect()
    assert rows, "a3 returned no groups"
    rsd = 0.02
    for r in rows:
        exact = r["exact_customers"]
        approx = r["approx_customers"]
        assert exact > 0
        rel_err = abs(approx - exact) / exact
        assert rel_err <= 3 * rsd, (
            f"group {r['o_orderstatus']}: approx={approx} exact={exact} "
            f"rel_err={rel_err:.4f} > {3 * rsd}"
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
