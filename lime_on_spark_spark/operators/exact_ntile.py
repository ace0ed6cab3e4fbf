"""Distributed exact ntile: global sort-rank buckets without the
single-task window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the ENTIRE input
through one task (Spark warns ``WindowExec: No Partition Defined``) — the
classic scale-killer for exact quantile assignment. This operator computes
the identical ntile result in fully-parallel steps:

1. Broadcast P-1 approximate-quantile cut points of the leading order key
   (``percentile_approx``: a mergeable sketch agg riding the plan as a
   1-row broadcast array). The cuts need not be exact quantiles — they
   only define contiguous key ranges; accuracy just balances range sizes,
   and the final ranks are exact for ANY cuts.
2. Assign each row a range id as a deterministic expression of its key vs
   the broadcast cut array, so every downstream branch of the lineage
   agrees on the assignment — ``repartitionByRange`` +
   ``spark_partition_id`` would NOT (its reservoir sample reseeds per
   job, so a counts branch and a rank branch can disagree on boundaries).
3. Per-range local ``row_number`` (window partitioned by range id: each
   task sorts only its range); per-range counts = max local rank,
   aggregated on the SAME exchange (no extra pass); cumulative offsets =
   a prefix-sum window over the bounded O(P)-row count frame, broadcast
   back → global rank = local rank + offset.
4. The ntile bucket is a closed-form expression of (rank, N, n) matching
   SQL semantics exactly: the first ``N % n`` buckets hold ``ceil(N/n)``
   rows, the rest ``floor(N/n)``.

At 100 TB this is one sketch agg + one hash shuffle (read twice via
ReusedExchange) instead of a full-table single-task sort — one lazy
plan, no eager driver action. Heavy duplicate leading-key
values all land in one range (assignment must stay monotone in the total
order), so a pathological constant column degrades toward the single-task
case — pick a high-cardinality leading key, or pre-combine key columns.
For APPROXIMATE equi-depth at scale prefer percentile_approx bounds
broadcast straight onto the scan (the L1 discretizer shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_exact_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[str],
    *,
    out_col: str = "bucket",
    num_ranges: int | None = None,
    rank_col: str | None = None,
    total_col: str | None = None,
    lead_expr: Column | None = None,
) -> DataFrame:
    """Return ``df`` plus ``out_col`` = ``ntile(n) OVER (ORDER BY
    order_cols)``, computed with deterministic range partitioning instead
    of a single-task global window. Pass a unique tie-breaker as the last
    order column (SQL ntile over a non-unique key is nondeterministic
    anyway); ranges split on the FIRST order column only.

    ``rank_col`` additionally keeps the global 1-based rank (equals SQL
    ``rank()``/``row_number()`` when the order key is unique — the only
    case this operator supports deterministically); ``total_col`` attaches
    the total row count (riding the broadcast per-range count frame — no
    extra pass), so callers can derive
    ``percent_rank`` = (rank - 1) / (total - 1) without a second scan.

    ``lead_expr`` overrides the range-split key: a NUMERIC expression that
    must be MONOTONE (non-strictly) in the total order of ``order_cols``
    — rows tied on it collapse into one range, which stays correct but
    concentrates them on one task. Use it when the first order column is
    heavily duplicated (the Zipf case: half a vocabulary shares f=1) to
    spread ties by a secondary-key prefix, e.g. ``f + ascii(word)/256``.
    """
    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))

    lead = (
        lead_expr if lead_expr is not None else F.col(order_cols[0])
    ).cast("double")
    fracs = [i / num_ranges for i in range(1, num_ranges)]

    # r17 (guide §1.2/§2.4): the operator is now ONE lazy plan — two input
    # passes (sketch agg + ranked pass) instead of three, and zero eager
    # driver actions at construction. The cuts ride as a broadcast 1-row
    # array (cut VALUES only balance range sizes; final ranks are exact
    # for ANY cuts, so a per-action sketch recompute cannot change the
    # result). NULL cuts (empty input / all-NULL lead) coalesce to range
    # 0 — the old `cuts = []` behavior.
    cuts = F.broadcast(
        df.select(
            F.array_sort(
                F.array_distinct(F.percentile_approx(lead, fracs, 10_000))
            ).alias("_cuts")
        )
    )
    # Monotone range id: number of cut points strictly below the key. Rows
    # tied on the leading key share a range, keeping ranges contiguous in
    # the total order.
    with_rid = (
        df.crossJoin(cuts)
        .withColumn(
            "_range_id",
            F.coalesce(
                F.size(F.filter("_cuts", lambda c: lead > c)), F.lit(0)
            ),
        )
        .drop("_cuts")
    )
    order_exprs = [F.col(c) for c in order_cols]

    # Parallel local rank: each window group is exactly one key range.
    local_w = Window.partitionBy("_range_id").orderBy(*order_exprs)
    ranked = with_rid.withColumn("_local_rank", F.row_number().over(local_w))

    # Per-range counts = max local rank, aggregated ON the rank pass's own
    # exchange (the groupBy key equals the window partitioning, so Spark
    # adds no shuffle and ReusedExchange dedupes the input subtree); the
    # cumulative offsets are a prefix-sum window over the bounded
    # O(#ranges)-row frame, broadcast back. The former per-range count
    # pass (a full input re-execution + driver collect) is gone.
    pw = Window.orderBy("_range_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = F.broadcast(
        ranked.groupBy("_range_id")
        .agg(F.max("_local_rank").alias("_cnt"))
        .select(
            "_range_id",
            F.coalesce(F.sum("_cnt").over(pw), F.lit(0))
            .cast("long")
            .alias("_rank_offset"),
            F.sum("_cnt")
            .over(Window.partitionBy())
            .cast("long")
            .alias("_group_total"),
        )
    )
    ranked = ranked.join(offsets, "_range_id").withColumn(
        "_rank", F.col("_local_rank") + F.col("_rank_offset")
    )
    result = ranked.withColumn(
        out_col, _ntile_bucket_col(F.col("_rank"), F.col("_group_total"), n)
    )
    if rank_col is not None:
        result = result.withColumn(rank_col, F.col("_rank"))
    if total_col is not None:
        result = result.withColumn(total_col, F.col("_group_total"))
    return result.drop(
        "_range_id", "_local_rank", "_rank_offset", "_rank", "_group_total"
    )


def with_grouped_exact_ntile(
    df: DataFrame,
    n: int,
    partition_cols: list[str],
    order_cols: list[str],
    *,
    out_col: str = "bucket",
    num_ranges: int | None = None,
    rank_col: str | None = None,
    total_col: str | None = None,
    lead_expr: Column | None = None,
) -> DataFrame:
    """Per-group twin of :func:`with_exact_ntile`: ``out_col`` =
    ``ntile(n) OVER (PARTITION BY partition_cols ORDER BY order_cols)``
    without the few-huge-partitions window.

    ``Window.partitionBy(lang)`` is only safe when groups are SMALL; with
    a handful of giant groups (5 languages x 20 TB each) every group is a
    single task sorting corpus/|groups| rows — the d108 anti-pattern with
    a fig leaf. This operator runs the range-bucketed exact rank WITHIN
    each group: per-group percentile sketch cuts (one mergeable agg), a
    (group, range) local ``row_number`` so every task sorts only one key
    range of one group, and broadcast (group, range) -> (offset, total)
    literals. Driver state is O(|groups| x num_ranges) — bounded when the
    group key is a low-cardinality routing column (lang, source, split).
    For HIGH-cardinality groups use the plain partitioned window instead:
    many groups means small groups, which is exactly when windows are
    fine.

    Same contract as the global operator: pass a unique trailing order
    column; ``rank_col``/``total_col`` expose the per-group rank and
    per-group row count; ``lead_expr`` must be numeric and monotone in
    the total order of ``order_cols`` within every group.
    """
    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))

    lead = (
        lead_expr if lead_expr is not None else F.col(order_cols[0])
    ).cast("double")
    fracs = [i / num_ranges for i in range(1, num_ranges)]

    # One mergeable sketch agg -> per-group cut arrays, broadcast back.
    # Dedupe + sort inside the expression: duplicate cuts (skewed groups)
    # must not split one key value across range ids.
    cuts = F.broadcast(
        df.groupBy(*partition_cols).agg(
            F.array_sort(
                F.array_distinct(F.percentile_approx(lead, fracs, 10_000))
            ).alias("_cuts")
        )
    )
    with_rid = (
        df.join(cuts, partition_cols)
        .withColumn(
            "_range_id",
            F.size(F.filter("_cuts", lambda c: lead > c)),
        )
        .drop("_cuts")
    )

    # Parallel local rank: each window group is one (group, range) cell.
    local_w = Window.partitionBy(*partition_cols, "_range_id").orderBy(
        *[F.col(c) for c in order_cols]
    )
    ranked = with_rid.withColumn("_local_rank", F.row_number().over(local_w))

    # r17 (guide §1.2/§2.4): per-cell counts = max local rank, aggregated
    # ON the rank pass's own exchange (grouping key == window partitioning
    # -> no new shuffle, ReusedExchange dedupes the input subtree); the
    # per-group offsets/totals are prefix-sum/total windows over the
    # bounded O(|groups| x num_ranges)-row frame, broadcast back. The
    # former per-cell count pass (a full input re-execution + driver
    # collect) is gone, and the operator is one lazy plan.
    pw = (
        Window.partitionBy(*partition_cols)
        .orderBy("_range_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = F.broadcast(
        ranked.groupBy(*partition_cols, "_range_id")
        .agg(F.max("_local_rank").alias("_cnt"))
        .select(
            *partition_cols,
            "_range_id",
            F.coalesce(F.sum("_cnt").over(pw), F.lit(0))
            .cast("long")
            .alias("_rank_offset"),
            F.sum("_cnt")
            .over(Window.partitionBy(*partition_cols))
            .cast("long")
            .alias("_group_total"),
        )
    )
    ranked = ranked.join(
        offsets, [*partition_cols, "_range_id"]
    ).withColumn("_rank", F.col("_local_rank") + F.col("_rank_offset"))
    result = ranked.withColumn(
        out_col,
        _ntile_bucket_col(F.col("_rank"), F.col("_group_total"), n),
    )
    if rank_col is not None:
        result = result.withColumn(rank_col, F.col("_rank"))
    if total_col is not None:
        result = result.withColumn(total_col, F.col("_group_total"))
    return result.drop(
        "_range_id", "_local_rank", "_rank_offset", "_rank", "_group_total"
    )


def _ntile_bucket_col(rank: Column, total: Column, n: int) -> Column:
    """:func:`_ntile_bucket` with a per-row ``total`` column (grouped
    variant: each group has its own N). Same SQL semantics: the first
    ``N % n`` buckets hold ``N // n + 1`` rows each; when ``N < n``
    bucket i gets row i."""
    q = F.floor(total.cast("long") / n).cast("long")
    rem = (total.cast("long") % n).cast("long")
    big = rem * (q + 1)
    return (
        F.when(q == 0, rank)
        .when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(rem + F.ceil((rank - big) / q))
        .cast("int")
    )
