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
