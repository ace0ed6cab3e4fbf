"""Metamorphic distributed-correctness tests.

Partition-count invariance: a correct distributed query returns the SAME
result under any shuffle fan-out. Running a representative query slice at
shuffle.partitions=3 and =17 catches the whole class of bugs the oracle
mirror can't see by construction if both runs share the fault — float
aggregation order dependence, limit-without-order nondeterminism, and
per-partition RNG/state leaking into results.

Empty-input robustness: every representative query must execute (not
crash) against a zero-row corpus with the production schemas — the
behavior a scheduled pipeline needs on an empty ingest day.
"""

from __future__ import annotations

import pytest

from lime_on_spark_spark.plans import registry
from tests.compare import canon_frame

#: Queries spanning the families, weighted toward shuffle-heavy shapes.
REPRESENTATIVE = (
    "q1_pricing_summary",
    "q5_region_revenue",
    "w1_order_rank_per_customer",
    "w10_pareto_front",
    "a2_count_distinct",
    "a21_mergeable_histogram",
    "d1_exact_dedup",
    "d8_hash_split",
    "d45_minhash_banded_exact",
    "d48_weighted_reservoir",
    "u5_snapshot_diff",
    "f6_vector_math",
    # round-7 additions: Gumbel top-k selection, BPE argmax loop, winnowing
    # window-min, span islands — all shapes where per-partition state or
    # float order could leak into results.
    "d56_dsir_selection",
    "d58_temperature_mix",
    "d60_bpe_merges",
    "d61_span_corruption",
    "d64_winnowing_fingerprints",
    # round-8 additions: star-contraction CC (iterative edge rewrites with
    # per-round convergence checks — the classic place partition-dependent
    # state could leak) and the single-explode map-HOF chain.
    "d10b_cc_star",
    "f7b_map_hofs",
    "d81_bootstrap_ci",
    "d82_ab_welch_test",
    # round-9 additions: the span machinery (window-min fingerprints +
    # diagonal islands + interval-union merge — positional state that
    # could leak across partition boundaries) and the Mann-Whitney
    # prefix-sum scan (per-partition offsets MUST cancel out exactly).
    "d84_cross_doc_spans",
    "d87_span_removal",
    "d86_mann_whitney",
    # round-10 additions: the global prefix-sum packing scan (per-
    # partition offsets must cancel exactly — the d86 risk class on a
    # second consumer), PQ (per-subspace argmin + driver-state centroid
    # updates — assignment must not depend on fan-out), the langid
    # pipeline (broadcast-model scoring), and the markup extraction
    # Arrow stage (batch-boundary-sensitive by construction).
    "d90_global_concat_pack",
    "d91_pq_quantization",
    "d88_langid_classifier",
    "d89_markup_extraction",
    # round-11 additions: IVFADC search (the index is cache-stable by the
    # two-build pytest; THIS covers the per-query ADC join + shortlist
    # windows + rescore under different fan-outs), the lakehouse flagship
    # (funnel -> range-partitioned manifest write -> skipping readback),
    # and the state-TTL sessionizer (state-store partitioning must not
    # leak into which sessions close or stay open).
    "d92_ivfadc_search",
    "d93_curated_lakehouse",
    "t24_state_ttl",
    # (also round 11) the retrieval harness: rank windows + integer-unit
    # metric sums + the distributed ADC join — all order-free claims.
    "d94_retrieval_eval",
    # (also round 11) truncated-dim ranking (slice + window under two
    # fan-outs) and the integer PageRank loop (per-round keyed shuffles —
    # the classic place partition-dependent accumulation could leak).
    "d95_matryoshka_eval",
    "d96_supplier_pagerank",
    # round-12 additions: the change data feed (task-per-changed-file scan
    # feeding an RDD createDataFrame — emission must not depend on
    # fan-out), IVM (delta application over a union+re-agg — float deltas
    # must cancel identically), the audio Arrow stage (batch-boundary-
    # sensitive framing), and exchange reuse (pre-rounded max-equality
    # must pick the same winner under any fan-out).
    "s24_manifest_change_data_feed",
    "d97_incremental_view_maintenance",
    "m6_audio_features",
    "o12_exchange_reuse",
    # (also round 12) the chained-stateful pipeline: two state stores'
    # partitioning must not leak into which windows close, and the RAG
    # packing cut (rank window + running sum) must be fan-out-free.
    "t29_chained_stateful",
    "d98_rag_context_assembly",
    # round-13 additions: the rest of the CDF surface — CDF planning is
    # manifest-DIFF-driven (task-per-changed-file), so these pin that
    # executor parallelism can never reorder, duplicate, or drop change
    # rows: s27 update pairing (a keyed window over the change set must
    # pair pre/postimages identically under any fan-out), s28 the DSv2
    # batch reader spelling of the same plan. Plus the d2-vs-d45 LSH
    # agreement verdict (two independent banded candidate joins whose
    # pair sets must not depend on fan-out).
    "s27_manifest_cdf_updates",
    "s28_manifest_cdf_reader",
    "d2_vs_d45_agreement",
    # (also round 13) the full-outer stream-stream join: BOTH sides'
    # unmatched-row emission depends on watermark bookkeeping that must
    # not vary with state-store partitioning.
    "t30_stream_stream_full_outer",
    # (also round 13) rename-column lifecycle: the post-rename append's
    # logical->physical key translation runs per executor task, and the
    # cross-rename change feed is task-per-changed-file — neither may
    # vary with fan-out. And the a27 digest: groupBy guarantees each
    # nation lands whole in one Arrow batch regardless of partitioning,
    # which is exactly the property this slice pins.
    "s33_manifest_rename_column",
    "a27_quantile_digest_rollup",
    # (round-13 wave 4) drop-column lifecycle: the fresh-physical re-add
    # key translation and NULL-fill run per executor task; the history
    # row's DML alphabet spans every publish path; d99's per-source
    # percent_rank window must not depend on how sources are fanned out.
    "s34_manifest_drop_column",
    "s35_manifest_describe_history",
    "d99_source_calibrated_quality",
    # (round-13 wave 5) w12's grouped percentile + join-back and o16's
    # per-group k-heap both shuffle on the group key; t32's state-store
    # hash layout is pinned BY DESIGN to the checkpoint — none may vary
    # with fan-out.
    "w12_median_joinback",
    "o16_window_group_limit",
    "t32_state_repartition_stability",
    # (round-13 wave 6) generated values are computed per executor task
    # at the spool boundary; row ids are per-file metadata arithmetic —
    # neither may vary with write fan-out (the registry rows use fixed
    # partition counts for their closed forms, so the slice varies only
    # the SHUFFLE side).
    "s36_manifest_generated_columns",
    "s37_manifest_row_tracking",
    # (also wave 6) per-commit CDF: one task per changed-file-PER-COMMIT
    # feeding an RDD union — attribution must not vary with fan-out.
    "s38_manifest_cdf_per_commit",
    "s39_manifest_feature_gates",
    # (also wave 8) the provenance matrix: 12 integer sums over per-doc
    # flag columns — pure map + one agg, order-free by construction.
    "d100_filter_provenance",
    "t33_streaming_cdf_per_commit",
    # (also wave 9) gaps-and-islands: dense_rank + two keyed aggs over
    # the same user partitioning — run detection must be fan-out-free.
    "w13_gaps_islands_streaks",
    # round-14 additions: d101's canonical-URL groupBy and d103's
    # (bigram, pairing-key) equi-join + clipped sums shuffle on derived
    # string keys; a28's KMV sketch is built by TakeOrderedAndProject
    # (per-partition top-k then merge — the k-set must be identical
    # under any fan-out or the estimates drift); d102's four keyed
    # aggregates share one bigram extraction.
    "d101_url_dedup",
    "d102_kneser_ney",
    "d103_rouge_overlap",
    "a28_theta_sketch_setops",
    # (also round 14) l15's sampler is seeded PER INSTANCE inside
    # mapInPandas — how instances land in Arrow batches must not change
    # the draws; m7's banded self-join + candidate-only verify is the
    # d45 fan-out risk class on hash keys.
    "l15_categorical_explain",
    "m7_image_phash_neardup",
    # (round-14 wave 3) d104's straddle audit counts distinct splits per
    # group across the shuffle; d105's posting join pairs positions
    # across partition boundaries.
    "d104_group_aware_split",
    "d105_phrase_search",
    # (round 15) d107's cross-doc line dedup shuffles ids keyed on
    # md5(line) — keep-first winners must not vary with fan-out; d106 is
    # a pure codegen map + one agg, order-free by construction; d108's
    # decile frontier is a top-k over a shuffled max-agg (the rank cut
    # must be fan-out-exact); d109 is a narrow regex scan + census agg.
    "d106_badwords_blocklist",
    "d107_c4_line_cleaning",
    "d108_semantic_decontamination",
    "d109_pii_redaction",
    # (round 15 wave 2) a29's sketch cells are a keyed count agg whose
    # 256-cell layout — and therefore every estimate — must be identical
    # under any fan-out (the a28 risk class); f28 is a narrow
    # parse/extract map + one agg.
    "a29_countmin_heavy_hitters",
    "f28_variant_semistructured",
    # (round 15 wave 3) d110's per-domain rollup + top-subdomain window
    # shuffle on derived string keys; l16's per-instance Arrow fit groups
    # + pick-set join must not vary with how instances land in batches
    # (the l15 risk class).
    "d110_domain_profile",
    "l16_deletion_faithfulness",
    # (round 15 wave 4) t35's windowed-agg state keyed on (window, type)
    # must close identical windows under any fan-out; o17's pushdown
    # booleans are plan-derived and must not depend on partitioning.
    "t35_streaming_variant_ingest",
    "o17_filter_pushdown",
    # (round 15 wave 5) d112's (doc, term) posting shuffle + broadcast
    # scalars + rounded-score top-k frontier must be fan-out-exact; s43's
    # roundtrip census and schema pin must not depend on write fan-out.
    "d112_bm25_ranking",
    "s43_variant_parquet_roundtrip",
    # (round 15 wave 6) f29's collated groupBy must form the same
    # case-insensitive groups under any fan-out; d113's md5 u-draws are
    # per-key pure functions — fan-out cannot move the noise.
    "f29_collation_semantics",
    "d113_dp_count_release",
    # (round 15 wave 7) m8's shard-local packing cumsum must assign the
    # same sequences under any fan-out (the d90 prefix-sum risk class).
    "m8_interleaved_packing",
    # (round 16) m9/d114 are shard-local window cumsums over d13's chunk
    # explode (the m8 risk class at chunk granularity); m10 adds a keyed
    # agg on top of m9's census; d111's merge-rule argmaxes are per-round
    # top-1 frontiers over a shuffled pair agg — the learned rules (and
    # so every fertility number) must be fan-out-exact (the d60 class).
    "m9_tokenized_packing",
    "m10_packing_efficiency",
    "d111_tokenizer_fertility",
    "d114_length_bucketed_batching",
    # (round 16 wave 2) d115: the grouped exact-ntile's percentile-sketch
    # CUTS may legitimately differ with fan-out — the claim is that any
    # cuts yield the identical tercile assignment (ranges only partition
    # the order; ranks come from counts + local row_number). d116's wins
    # matrix and d118's histogram prefix sums shuffle on derived keys;
    # a30's verdict must hold even if the sketch itself drifts with
    # merge order — the gate is exactly the fan-out-robust statement.
    "d115_ccnet_perplexity_buckets",
    "d116_bradley_terry_sources",
    "d118_dp_quantile_release",
    "a30_approx_percentile_rank_gate",
    # d120's per-dimension float sums must round identically under any
    # partial-aggregation order (the classic float-order risk, held at
    # the 6-dp output boundary).
    "d120_embedding_centroid_drift",
    # d119's census averages per-doc cohesion sums across partitions and
    # p24 transposes a float agg — both hold their cross-partition float
    # sums at a rounding boundary.
    "d119_texttiling_boundaries",
    "p24_transpose",
)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_partition_count_invariance(spark, sf_dir, name):
    fn = registry.queries()[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = canon_frame(fn(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = canon_frame(fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: result depends on shuffle partition count"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """Zero-row copies of every table with the production schemas."""
    out = tmp_path_factory.mktemp("empty_corpus")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


EMPTY_SAFE = (
    "q1_pricing_summary",
    "w1_order_rank_per_customer",
    "a2_count_distinct",
    "d1_exact_dedup",
    "d8_hash_split",
    "d45_minhash_banded_exact",
    "u5_snapshot_diff",
    "d46_mad_outliers",
    "w10_pareto_front",
    # round-7 (d60 is deliberately absent: BPE training on a zero-row
    # corpus is a caller error — its argmax has nothing to learn from)
    "d56_dsir_selection",
    "d58_temperature_mix",
    "d61_span_corruption",
    "d64_winnowing_fingerprints",
    # round-11: markup extraction (fixtures are UNIONed in, so the result
    # is the fixture-only pipeline), global packing (zero windows), and
    # the pure-SQL retrieval eval (no queries -> no metric rows).
    # d92/d94/d96 are deliberately absent: training an index / ranking a
    # graph on a zero-row corpus is a caller error (the d60 rule).
    "d89_markup_extraction",
    "d90_global_concat_pack",
    "d95_matryoshka_eval",
    # round-12: audio features (zero clips -> zero feature rows; the
    # Arrow stage must tolerate empty batches) and exchange reuse (an
    # empty scan still plans — zero winners, no crash). The manifest rows
    # are deliberately absent: they synthesize their own tables, so an
    # empty corpus exercises nothing (the d60 rule's inverse).
    "m6_audio_features",
    "o12_exchange_reuse",
    # round-13 wave 5: the corpus-facing additions. w12's join-back on an
    # empty orders table is zero groups joined to zero rows; o15/o16's
    # plan pins must still PLAN (empty scans under AQE); f26/f27 are pure
    # scalar work; j12's NOT IN arms are empty-vs-empty 3VL; d99's
    # percent_rank window and median scalar see zero rows.
    "w12_median_joinback",
    "f26_interval_arithmetic",
    "f27_timestamp_parsing",
    "o15_aqe_bhj_conversion",
    "o16_window_group_limit",
    "j12_null_aware_anti",
    "d99_source_calibrated_quality",
    "w13_gaps_islands_streaks",
    # round-15: every new row must survive a zero-row ingest day — the
    # C4 stages, decon, PII, domain, BM25, DP release produce empty
    # profiles; a29's sketch has zero cells and zero queries; f28/f29
    # aggregate nothing; o17's pushdown pins are plan properties that
    # hold on an empty scan; s43 roundtrips an empty-but-typed variant
    # table; t35 replays zero micro-batch rows; l16 explains zero
    # instances.
    "d106_badwords_blocklist",
    "d107_c4_line_cleaning",
    "d108_semantic_decontamination",
    "d109_pii_redaction",
    "d110_domain_profile",
    "d112_bm25_ranking",
    "d113_dp_count_release",
    "a29_countmin_heavy_hitters",
    "f28_variant_semistructured",
    "f29_collation_semantics",
    "o17_filter_pushdown",
    "s43_variant_parquet_roundtrip",
    "t35_streaming_variant_ingest",
    "l16_deletion_faithfulness",
    "m8_interleaved_packing",
    # round-16: packing/batching over an empty chunk stream produces
    # empty censuses. d111 is deliberately absent (the d60 rule: BPE
    # training on a zero-row corpus is a caller error).
    "m9_tokenized_packing",
    "m10_packing_efficiency",
    "d114_length_bucketed_batching",
    # round-16 second wave: d115 buckets zero scored docs into zero
    # terciles (the grouped exact-ntile empty path); d116 fits zero
    # sources from zero preference pairs; d117 selects from an empty
    # shortlist (the greedy loop stops early).
    "d115_ccnet_perplexity_buckets",
    "d116_bradley_terry_sources",
    "d117_mmr_rerank",
    # d118 releases zero quantiles from a zero-row histogram.
    "d118_dp_quantile_release",
    # d119 tiles zero docs into zero gaps.
    "d119_texttiling_boundaries",
    # a30 gates zero candidates over a zero-row table.
    "a30_approx_percentile_rank_gate",
    # p24 transposes a zero-index summary (key column only).
    "p24_transpose",
    # d120 pairs zero dimension sums into zero drift rows.
    "d120_embedding_centroid_drift",
    # l17 enumerates coalitions of a missing instance (empty design ->
    # zero output rows, no crash).
    "l17_kernel_shap",
)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_runs_on_empty_corpus(spark, empty_sf_dir, name):
    """No crash and no phantom rows on a zero-row ingest day."""
    out = registry.queries()[name](spark, empty_sf_dir).collect()
    assert out == [] or all(r is not None for r in out)


AQE_SLICE = (
    "q5_region_revenue",
    "q3_shipping_priority",
    "d45_minhash_banded_exact",
    "j8_salted_skew_join",
    "a21_mergeable_histogram",
    "u5_snapshot_diff",
    # round-13: the grouped-median join-back (join strategy free to
    # change under AQE) and the WindowGroupLimit filter (pushdown is an
    # optimizer rewrite, orthogonal to adaptive re-planning) — results
    # must be identical either way. o15/o14 are deliberately absent:
    # their PINS assert adaptive behavior, so toggling AQE off would
    # (correctly) fail the self-certifying boolean, not the values.
    "w12_median_joinback",
    "o16_window_group_limit",
)


@pytest.mark.parametrize("name", AQE_SLICE)
def test_aqe_toggle_invariance(spark, sf_dir, name):
    """Adaptive execution re-plans at runtime (broadcast conversion,
    partition coalescing, skew splits) — it must NEVER change results.
    Catches accidental dependence on physical partitioning or join
    strategy in operator logic."""
    fn = registry.queries()[name]
    orig = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        a = canon_frame(fn(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        b = canon_frame(fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", orig)
    assert a == b, f"{name}: result depends on AQE"
