"""Distributed exact ntile: global sort-rank buckets without the
single-task window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the ENTIRE input
through one task (Spark warns ``WindowExec: No Partition Defined``) — the
classic scale-killer for exact quantile assignment. This operator computes
the identical ntile result in fully-parallel steps:

1. Collect P-1 approximate-quantile cut points of the leading order key
   ONCE on the driver (``percentile_approx``: a mergeable sketch agg, one
   O(P) collect). The cuts need not be exact quantiles — they only define
   contiguous key ranges; accuracy just balances range sizes.
2. Assign each row a range id as a PURE EXPRESSION of its key vs the
   broadcast cut literals. Deterministic by construction, so every
   downstream branch of the lineage agrees on the assignment —
   ``repartitionByRange`` + ``spark_partition_id`` would NOT be (its
   reservoir sample reseeds per job, so a counts pass and a rank pass
   can disagree on boundaries).
3. Per-range counts → cumulative offsets (a P-row driver collect) +
   per-range local ``row_number`` (window partitioned by range id: each
   task sorts only its range) → global rank = local rank + offset.
4. The ntile bucket is a closed-form expression of (rank, N, n) matching
   SQL semantics exactly: the first ``N % n`` buckets hold ``ceil(N/n)``
   rows, the rest ``floor(N/n)``.

At 100 TB this is one sketch agg + one hash shuffle + two O(P) collects
instead of a full-table single-task sort. Heavy duplicate leading-key
values all land in one range (assignment must stay monotone in the total
order), so a pathological constant column degrades toward the single-task
case — pick a high-cardinality leading key, or pre-combine key columns.
For APPROXIMATE equi-depth at scale prefer percentile_approx bounds
broadcast straight onto the scan (the L1 discretizer shape).
"""

from __future__ import annotations

import functools
import operator

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
    the total row count as a literal (already driver-known from the
    per-range counts — no extra job), so callers can derive
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
    cuts_row = df.select(
        F.percentile_approx(lead, fracs, 10_000).alias("c")
    ).first()
    cuts = sorted(set(cuts_row["c"] or []))

    # Monotone range id: number of cut points strictly below the key. Rows
    # tied on the leading key share a range, keeping ranges contiguous in
    # the total order.
    if cuts:
        rid = functools.reduce(
            operator.add,
            [(lead > F.lit(c)).cast("int") for c in cuts],
        )
    else:
        rid = F.lit(0)
    order_exprs = [F.col(c) for c in order_cols]
    with_rid = df.withColumn("_range_id", rid)

    # O(#ranges) rows to the driver: one count per key range.
    counts = sorted(
        (r["_range_id"], r["cnt"])
        for r in with_rid.groupBy("_range_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(c for _, c in counts)
    offsets, acc = [], 0
    for rng, cnt in counts:
        offsets.append((rng, acc))
        acc += cnt
    offset_df = F.broadcast(
        spark.createDataFrame(offsets, "_range_id int, _rank_offset long")
    )

    # Parallel local rank: each window group is exactly one key range.
    local_w = Window.partitionBy("_range_id").orderBy(*order_exprs)
    ranked = (
        with_rid.withColumn("_local_rank", F.row_number().over(local_w))
        .join(offset_df, "_range_id")
        .withColumn("_rank", F.col("_local_rank") + F.col("_rank_offset"))
    )
    result = ranked.withColumn(
        out_col, _ntile_bucket(F.col("_rank"), total, n)
    )
    if rank_col is not None:
        result = result.withColumn(rank_col, F.col("_rank"))
    if total_col is not None:
        result = result.withColumn(total_col, F.lit(total))
    return result.drop("_range_id", "_local_rank", "_rank_offset", "_rank")


def _ntile_bucket(rank: Column, total: int, n: int) -> Column:
    """SQL ntile bucket for a 1-based global ``rank`` out of ``total`` rows:
    the first ``total % n`` buckets hold ``total // n + 1`` rows each."""
    q, rem = divmod(total, n)
    if q == 0:
        # Fewer rows than buckets: bucket i gets row i.
        return rank.cast("int")
    big = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(rem + F.ceil((rank - big) / q))
        .cast("int")
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

    # O(|groups| x num_ranges) rows to the driver: one count per
    # (group, key range). Offsets/totals are per group.
    count_rows = (
        with_rid.groupBy(*partition_cols, "_range_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in count_rows:
        key = tuple(r[c] for c in partition_cols)
        by_group.setdefault(key, []).append((r["_range_id"], r["cnt"]))
    offset_rows = []
    for key, ranges in by_group.items():
        total = sum(c for _, c in ranges)
        acc = 0
        for rng, cnt in sorted(ranges):
            offset_rows.append((*key, rng, acc, total))
            acc += cnt
    schema_prefix = ", ".join(
        f"{c} {t}"
        for c, t in zip(
            partition_cols,
            (df.schema[c].dataType.simpleString() for c in partition_cols),
        )
    )
    offset_df = F.broadcast(
        spark.createDataFrame(
            offset_rows,
            f"{schema_prefix}, _range_id int, _rank_offset long,"
            " _group_total long",
        )
    )

    # Parallel local rank: each window group is one (group, range) cell.
    local_w = Window.partitionBy(*partition_cols, "_range_id").orderBy(
        *[F.col(c) for c in order_cols]
    )
    ranked = (
        with_rid.withColumn("_local_rank", F.row_number().over(local_w))
        .join(offset_df, [*partition_cols, "_range_id"])
        .withColumn("_rank", F.col("_local_rank") + F.col("_rank_offset"))
    )
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
