"""Dual-API parity: the ANSI-portable oracle SQL strings must run on Spark
SQL itself (over registered temp views) and return exactly the same rows as
the registered DataFrame plans.

This proves a SQL-first user gets the identical engine: same semantics
through `spark.sql(...)` as through the DataFrame API, for every query whose
oracle doesn't use DuckDB-only functions (list lambdas, quantile_cont,
generate_subscripts, recursive CTEs, json_extract, epoch_us, md5-on-int).
"""

from __future__ import annotations

import pytest

from lime_on_spark_spark.plans import registry
from lime_on_spark_spark.sources.catalog import TABLES, load_table
from tests.compare import canon_frame

#: Oracle strings verified ANSI-portable (parse AND evaluate identically on
#: Spark). DuckDB-specific oracles are intentionally absent; adding a new
#: portable query here extends the parity guarantee.
PORTABLE = [
    "a10_salted_agg", "a11_histogram", "a12_bool_aggs", "a2_count_distinct",
    "a2_distinct_pairs", "a4_minmax_by", "a5_cube", "a5_grouping_sets",
    "a5_pivot", "a5_rollup", "a5_unpivot", "a6_filtered_agg",
    "a9_corr_regression", "d1_dedup_keep_best", "d1_exact_dedup",
    "d7_lang_routing", "d83_quality_classifier", "f24_variant_type",
    "f2_date_extras",
    "f3_math_funcs", "f7_map_funcs",
    "j2_full_outer",
    "j2_left_outer", "j2_right_outer", "j3_anti", "j3_semi", "j5_theta_join",
    "j6_range_join", "j8_salted_skew_join", "o12_exchange_reuse",
    "o13_cache_reuse", "t28_stream_stream_semi",
    "o1_global_sort",
    "o3_bucketed_join", "p1_projection", "p2_scalar_subquery", "p4_case_when",
    "p5_nullsafe_eq", "q10_returned_revenue", "q11_important_stock",
    "q12_priority_buckets", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_count", "q17_small_qty_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue",
    "q1_pricing_summary", "q20_dominant_suppliers", "q21_waiting_suppliers",
    "q22_dormant_customers", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_priority_check", "q5_region_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "s3_sql_over_views", "s4_csv_roundtrip", "s4_json_roundtrip",
    "s4_merge_schema", "s4_orc_roundtrip", "s4_partition_pruning",
    "t1_hierarchical_rollup", "t1_tumbling_hour", "t3_session_window",
    "u1_union", "u1_union_all", "u2_intersect", "u2_intersect_all",
    "u3_except", "u3_except_all", "w1_ntile_percent_rank",
    "w1_order_rank_per_customer", "w3_running_frames", "w4_topk_per_group",
    "w5_value_funcs",
    # round-5 additions (streaming twins' batch SQL + new window/funnel ops)
    "a3_approx_count_distinct", "d8_stratified_sample", "s4_seeded_sample",
    "t1_streaming_tumbling", "t5_streaming_dedup", "t6_stateful_user_stats",
    "t7_stream_stream_join", "t9_conversion_funnel",
    "w7_cumulative_distinct_users", "w8_ewma_daily_revenue",
    "t11_event_transitions", "a13_equidepth_histogram",
    "a15_deterministic_mode", "t12_streaming_topk", "f10_bitwise_funcs",
    # round-6 additions
    "j10_scd2_join", "a17_sketch_rollup", "t17_dynamic_session_window",
    "a19_decimal_money", "a18_join_cardinality", "f15_array_set_ops",
    # round-7 additions (LATERAL + recursive CTE are verbatim-parity rows —
    # the plan IS spark.sql(oracle text); o5's oracle is plain ANSI)
    "p11_lateral_topk", "p12_recursive_cte", "o5_observed_metrics",
    # round-8 additions (lateral column aliases + IDENTIFIER are native
    # Spark SQL features; a24/a26/o9/f19/f7b oracles are plain ANSI)
    "p16_lateral_column_alias", "p17_identifier_clause", "a24_pandas_udaf",
    "a26_approx_top_k", "o9_bloom_filter_join", "f19_xml_funcs",
    "f7b_map_hofs",
    # round-9 additions (plain ANSI oracles; d83 is listed above)
    "s13_state_store_reader", "p18_sql_scripting", "j11_join_strategy_hints",
    "p19_pandas_api_parity",
    # round-10 additions (f22/f23 oracles are plain ANSI GROUP BYs; the
    # Python-path-vs-SQL equality IS the parity claim)
    "f22_table_arg_udtf", "f23_apply_in_arrow", "p20_dynamic_sql",
    # round-13 additions: o16/j12 are plain ANSI (window + NOT IN 3VL —
    # the parity run proves Spark SQL honors the same null-aware
    # semantics); t32's oracle is a plain GROUP BY over events; d99 uses
    # percent_rank + percentile_disc WITHIN GROUP (Spark 3.4+).
    "o16_window_group_limit", "j12_null_aware_anti",
    "t32_state_repartition_stability", "d99_source_calibrated_quality",
    # round-14 additions: a28's exact referee arm is scalar subqueries +
    # IN; s40's oracle is plain CASE/SUM; d101's canonical derivation is
    # `||` string concat + modular arithmetic (verified to parse AND
    # evaluate identically on Spark SQL before listing).
    "a28_theta_sketch_setops", "s40_dynamic_partition_overwrite",
    "d101_url_dedup",
    # p23's oracle is the identical SQL text (GROUP BY ALL + ORDER BY
    # ALL ship in both engines); d104's is md5-over-string + CASE.
    "p23_order_by_all", "d104_group_aware_split",
    # round-15 additions (verified to parse AND evaluate identically on
    # Spark SQL before listing): f29's oracle is the plain lower()
    # normalization twin; o17/t35/l16 are ANSI aggregates/pins; d110's
    # feed CTE is || concat + CASE + row_number.
    "f29_collation_semantics", "o17_filter_pushdown",
    "t35_streaming_variant_ingest", "l16_deletion_faithfulness",
    "d110_domain_profile",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_dataframe_plan(spark, sf_dir, views, name):
    sql = registry.oracle_sql()[name]
    via_sql = canon_frame(spark.sql(sql).toPandas())
    via_df = canon_frame(registry.queries()[name](spark, sf_dir).toPandas())
    assert via_sql == via_df, name
