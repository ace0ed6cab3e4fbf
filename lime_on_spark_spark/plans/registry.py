"""Query/oracle registry — the driver-facing surface of the engine.

Every operator row in SURVEY.md §2 registers here as a named query
(``(spark, sf_dir) -> DataFrame``) plus, where the semantics are
SQL-expressible, a DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports :func:`queries` / :func:`oracle_sql` verbatim.

Design rules enforced by convention (SURVEY.md §3.2):
* every computed column is aliased identically in Spark and oracle SQL;
* float aggregates are rounded on both sides (hash robustness);
* DuckDB integer sums are cast (hugeint -> bigint) in the oracle SQL;
* no oracle may return a bare DECIMAL of precision > 18 — SUM/AVG over
  DECIMAL widens past 18 digits and DuckDB's pandas client demotes such
  values to float64 while Spark keeps exact Decimal objects, which the
  driver's type-tagged hash fails; string-cast (CAST(... AS VARCHAR) /
  ``.cast("string")``) or round-to-double at the boundary on BOTH sides
  (statically enforced by tests/test_conventions.py);
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
    # r17 rotation v7: 40 of these 50 rows have NEVER appeared in any
    # CORRECTNESS_r*.json (recomputed against r01–r16 at rotation time:
    # 422 oracles, 346 ever sampled, 76-row backlog). 10 pins: q1
    # (continuity — the headline query) plus the 9 rows whose internals
    # this round rewrote (same-round re-certification principle):
    # d108/d115/w1_ntile_percent_rank (exact_ntile now one lazy plan),
    # d91/d92 (PQ subvector frame pre-partitioned), t26/t27 (manifest
    # connector Arrow write+read paths), s21 (spool-encoder-agnostic
    # purge probe), d39 (lloyd_kmeans pre-partitioned + join-free
    # update — rewritten after the initial v7 cut; re-pinned in place of
    # the d1_fingerprint backlog row). d65/d75 are both first-time AND
    # ntile-rewritten; d30 was rewritten in r16 but never sampled;
    # d40_semantic_dedup is first-time AND a lloyd_kmeans caller (swapped
    # in for d4_ivf_recall — the d4 family keeps d4_ann_recall).
    # All 50 oracle-backed. Never-sampled backlog after this rotation:
    # 76 − 40 = 36.
    # q — TPC-H classic (continuity pin)
    "q1_pricing_summary",
    # re-pins — rows whose internals r17 rewrote
    "d108_semantic_decontamination", "d115_ccnet_perplexity_buckets",
    "w1_ntile_percent_rank", "d91_pq_quantization", "d92_ivfadc_search",
    "t26_exactly_once_sink", "t27_streaming_ivm",
    "s21_manifest_compaction_purge", "d39_kmeans_lloyd",
    # first-time: exact_ntile callers + r16-rewritten-but-never-sampled
    "d65_curriculum_phases", "d75_gini_concentration",
    "d30_perplexity_score",
    # first-time: the d2/d45 agreement family + skew-audit targets
    "d2_ngram_jaccard", "d57_repeated_ngrams", "d2_minhash_recall",
    "d2_embedding_near_dup",
    # first-time: streaming backlog (clears the t_streaming family)
    "t1_streaming_tumbling", "t2_streaming_sliding",
    "t3_streaming_session", "t5_dedup_within_watermark",
    "t7_stream_stream_join", "t8_foreach_batch_sink",
    "t12_streaming_topk", "t13_stream_static_join",
    "t16_stream_stream_left_outer", "t18_streaming_upsert",
    "t21_streaming_observe",
    # first-time: sources backlog
    "s4_compaction", "s4_orc_roundtrip", "s5_rate_source",
    "s8_text_roundtrip",
    # first-time: LIME backlog
    "l2c_around_instance", "l3b_perturb_text_bow",
    # first-time: aggregates backlog
    "a4_minmax_by", "a21_mergeable_histogram", "a22_grouping_labels",
    # first-time: d backlog (retrieval + dedup + sampling families)
    "d1_dedup_keep_best", "d3_batch_knn",
    "d4_ann_recall", "d40_semantic_dedup", "d6_multimodal_join",
    "d7_langid_routing", "d8_stratified_sample", "d11_label_centroids",
    "d17_dup_triangles", "d18_source_entropy", "d20_winsorize",
    "d21_merge_upsert", "d22_pack_cross_doc",
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
