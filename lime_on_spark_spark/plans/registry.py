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
    "lime_on_spark_spark.plans.clustering",
    "lime_on_spark_spark.plans.multimodal_plans",
    "lime_on_spark_spark.plans.lime_plans",
    "lime_on_spark_spark.plans.streaming_plans",
    "lime_on_spark_spark.plans.extras",
    "lime_on_spark_spark.plans.datasel",
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


#: Curated head of the registry iteration order. The verify driver samples
#: the FIRST 50 queries it sees, so without curation its correctness
#: artifact only ever covers the q/p/j/a families (the first modules to
#: import). This prefix spans every family — q, p, j, a, w, o, u, f, t, l,
#: d, m, s — with >=2 rows each, all oracle-backed, so one driver sample
#: exercises the whole engine. Names listed but not (yet) registered are
#: skipped harmlessly; everything not listed follows in registration order.
_CURATED_PREFIX = (
    # r12 rotation: EVERY row never yet seen in a driver artifact goes in
    # — the round-11 additions (s23, d94, d95, d96, o11, t25) plus all
    # nine round-12 rows (s24-s26, d97, t26, t27, m6, f24, o12). Long-
    # sampled veterans rotate out; every family keeps >= 2 rows.
    # q — TPC-H-ish classics (kept first for round-over-round continuity)
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    # p — predicates / projection
    "p18_sql_scripting", "p20_dynamic_sql",
    # j — joins
    "j3_semi", "j7_asof_tolerance",
    # a — aggregates
    "a2_count_distinct", "a26_approx_top_k",
    # w — window functions
    "w1_order_rank_per_customer", "w6_time_range_frame",
    # o — physical layout (o11 skew split and o12 exchange reuse were
    # never driver-sampled)
    "o10_nested_schema_pruning", "o11_aqe_skew_join", "o12_exchange_reuse",
    # u — set operations
    "u1_union_all", "u5_snapshot_diff",
    # f — functions (f24 VARIANT is new; both Arrow quadrants stay)
    "f22_table_arg_udtf", "f23_apply_in_arrow", "f24_variant_type",
    # t — event-time & streaming (t25-t27 never driver-sampled)
    "t23_rocksdb_state_agg", "t24_state_ttl", "t25_late_drop_metrics",
    "t26_exactly_once_sink", "t27_streaming_ivm",
    # l — LIME (l12 = image-LIME: multimodal + provable-surrogate signal)
    "l6_ridge_verdict", "l12_image_verdict",
    # d — data-pipeline (d94-d97 never driver-sampled)
    "d1_exact_dedup", "d90_global_concat_pack", "d91_pq_quantization",
    "d92_ivfadc_search", "d93_curated_lakehouse", "d94_retrieval_eval",
    "d95_matryoshka_eval", "d96_supplier_pagerank",
    "d97_incremental_view_maintenance",
    # m — multimodal (m6 audio is new)
    "m1_multimodal_features", "m2_multimodal_embed_join",
    "m6_audio_features",
    # s — sources / sinks / catalog (the full manifest lifecycle; s23-s26
    # never driver-sampled)
    "s16_manifest_data_skipping",
    "s17_manifest_time_travel", "s18_manifest_vacuum",
    "s19_manifest_delete_vectors", "s20_manifest_schema_evolution",
    "s21_manifest_compaction_purge", "s22_manifest_merge_upsert",
    "s23_manifest_stream_read", "s24_manifest_change_data_feed",
    "s25_manifest_occ_conflict", "s26_manifest_bloom_skipping",
    "s27_manifest_cdf_updates",
)


def _curated_order(d: dict) -> dict:
    """Reorder a registry dict: curated prefix first, rest unchanged."""
    head = {n: d[n] for n in _CURATED_PREFIX if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


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
    return _curated_order(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _curated_order(_ORACLE)
