"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``lime_on_spark_spark/`` — this module only
re-exports the registry (lime_on_spark_spark.plans.registry) and wires
the flagship query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lime_on_spark_spark.plans import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q3-style shipping-priority: parquet scan -> filter -> 3-way join
    (broadcast dim) -> hash agg -> top-k. Touches S1/P2/J1/J4/A1/O2.
    """
    from lime_on_spark_spark.plans.relational import q3_shipping_priority

    return q3_shipping_priority(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator row from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return registry.oracle_sql()
