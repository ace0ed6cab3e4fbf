"""Query/oracle registry — the driver-facing surface of the engine.

Every operator row in SURVEY.md §2 registers here as a named query
(``(spark, sf_dir) -> DataFrame``) plus, where the semantics are
SQL-expressible, a DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports :func:`queries` / :func:`oracle_sql` verbatim.

Design rules enforced by convention (SURVEY.md §3.2):
* every computed column is aliased identically in Spark and oracle SQL;
* float aggregates are rounded on both sides (hash robustness);
* DuckDB integer sums are cast (hugeint -> bigint) in the oracle SQL;
* outputs are deterministic (sorted collect_* , explicit tie-breakers).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}
_LOADED = False

#: Plan modules imported for their registration side effects.
_PLAN_MODULES = (
    "lime_on_spark_spark.plans.relational",
    "lime_on_spark_spark.plans.classic",
    "lime_on_spark_spark.plans.basic",
    "lime_on_spark_spark.plans.joins",
    "lime_on_spark_spark.plans.aggregates",
    "lime_on_spark_spark.plans.windows",
    "lime_on_spark_spark.plans.setops",
    "lime_on_spark_spark.plans.scalar_funcs",
    "lime_on_spark_spark.plans.events_time",
    "lime_on_spark_spark.plans.datapipe",
    "lime_on_spark_spark.plans.textpipe",
    "lime_on_spark_spark.plans.vectors",
    "lime_on_spark_spark.plans.multimodal_plans",
    "lime_on_spark_spark.plans.lime_plans",
    "lime_on_spark_spark.plans.streaming_plans",
    "lime_on_spark_spark.plans.extras",
    "lime_on_spark_spark.plans.sources_sinks",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


#: Plan modules that failed to import as "not built yet" (inspectable in tests).
_SKIPPED: list[str] = []


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    skipped: list[str] = []
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Module not built yet (incremental rounds). Swallow ONLY when the
            # missing module IS the registry entry itself — a typo'd import
            # inside an existing plan module must propagate loudly.
            if exc.name != mod:
                raise
            skipped.append(mod)
    # Assign only on a clean pass so a partial failure + retry can't leave
    # stale duplicates behind.
    _SKIPPED[:] = skipped
    _LOADED = True


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)
