"""Bucketed co-located join (the 100-TB shuffle-elimination strategy).

Writes orders/lineitem bucketed by the join key into managed tables, then
asserts the bucketed join plan contains NO shuffle exchange while the plain
parquet join does — the concrete payoff of pre-bucketing fact tables that
are repeatedly joined on the same key.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lime_on_spark_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_dir, "orders").write.bucketBy(4, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(4, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def _join_plan(spark, left, right):
    df = left.join(right, left.o_orderkey == right.l_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.sum("l_quantity").alias("qty"))
    return df, df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    # Disable AQE broadcast conversion so the join strategy (not size-based
    # runtime rewrites) is what the plan shows at this tiny SF.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        b_df, b_plan = _join_plan(
            spark, spark.table("b_orders"), spark.table("b_lineitem")
        )
        p_df, p_plan = _join_plan(
            spark,
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        )
        # bucketed: join itself needs no exchange (only the final group-by's)
        b_pre_agg = b_plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in b_pre_agg, b_plan
        # plain parquet: the same join must shuffle both sides
        p_pre_agg = p_plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" in p_pre_agg, p_plan
        # and the results agree
        assert sorted(map(tuple, b_df.collect())) == sorted(
            map(tuple, p_df.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_o3_bucketed_join_helper_plan_is_shuffle_free(spark, sf_dir):
    from lime_on_spark_spark.plans.sources_sinks import bucketed_join_frames

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, tables = bucketed_join_frames(spark, sf_dir)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_partitioned_write_scan_is_pruned(spark, sf_dir):
    import shutil

    from lime_on_spark_spark.plans.sources_sinks import partition_pruned_scan

    pruned, base = partition_pruned_scan(spark, sf_dir)
    try:
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_type" in plan, plan
        # The pruned scan must touch only the purchase partition.
        n_pruned = pruned.count()
        n_all = spark.read.parquet(base).count()
        assert 0 < n_pruned < n_all
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_output_file_count_and_size_control(spark, sf_dir, tmp_path):
    """Small-files control: repartition(n) + maxRecordsPerFile bound both
    the file count and the per-file row count — the two knobs that keep a
    100-TB dataset from becoming millions of tiny files (or one giant one)."""
    import glob

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    out = str(tmp_path / "sized")
    (
        li.repartition(4)
        .write.option("maxRecordsPerFile", n // 8 + 1)
        .parquet(out)
    )
    files = glob.glob(f"{out}/*.parquet")
    # 4 tasks x (ceil over maxRecordsPerFile) -> between 4 and 12 files
    assert 4 <= len(files) <= 12, files
    import pyarrow.parquet as pq

    counts = [pq.read_metadata(f).num_rows for f in files]
    assert sum(counts) == n
    assert max(counts) <= n // 8 + 1


def test_sorted_write_clusters_for_minmax_pruning(spark, sf_dir, tmp_path):
    """Sort-clustering: sortWithinPartitions('ts') before writing gives each
    file a narrow ts min/max span, so a time-filtered scan can skip files on
    footer stats alone. Proof: total per-file span is far smaller than with
    the unsorted layout."""
    import glob

    import pyarrow.parquet as pq

    events = load_table(spark, sf_dir, "events")

    def total_span(path):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index("ts")
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append((hi - lo))
        return sum(spans, start=spans[0] - spans[0])

    unsorted_out = str(tmp_path / "unsorted")
    sorted_out = str(tmp_path / "sorted")
    # Spark's default INT96 timestamp encoding carries NO min/max stats —
    # stats-based skipping needs TIMESTAMP_MICROS (a real 100-TB gotcha).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        events.repartition(8).write.parquet(unsorted_out)
        events.repartitionByRange(8, "ts").sortWithinPartitions(
            "ts"
        ).write.parquet(sorted_out)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    assert total_span(sorted_out) < total_span(unsorted_out) / 4


def test_permissive_ingest_quarantines_corrupt_records(spark, tmp_path):
    """Ingest robustness: PERMISSIVE mode with columnNameOfCorruptRecord
    routes malformed JSON lines into a quarantine column instead of failing
    the job — at 100 TB a crawler always emits some garbage, and the
    pipeline must count/route it, not die."""
    src = tmp_path / "lines.json"
    good = ['{"id": %d, "v": %d}' % (i, i * 10) for i in range(8)]
    bad = ['{"id": 8, "v": ', "not json at all", '{"id": }']
    src.write_text("\n".join(good + bad) + "\n")

    df = (
        spark.read.schema("id bigint, v bigint, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(str(src))
    )
    rows = df.collect()
    n_bad = sum(1 for r in rows if r["_bad"] is not None)
    n_good = sum(1 for r in rows if r["_bad"] is None and r["id"] is not None)
    assert n_good == len(good)
    assert n_bad == len(bad)
    # and the good rows parsed correctly
    assert sum(r["v"] or 0 for r in rows) == sum(i * 10 for i in range(8))
