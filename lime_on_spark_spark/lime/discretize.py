"""Quantile discretizer for tabular LIME (SURVEY.md §2j row L1).

Upstream analogue [public, unverified locally]: ``lime/discretize.py``'s
QuartileDiscretizer — bin a continuous feature by its quantile edges so the
interpretable representation is "x falls in the same bin".

Scale design: edges are computed with an exact distributed percentile
aggregate (one shuffle, k doubles to the driver); assignment is a chained
CASE expression — no UDF, fully codegen'd, O(k) comparisons per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_edges(df: DataFrame, col: str, probs: tuple[float, ...] = (0.25, 0.5, 0.75)) -> list[float]:
    """Exact linear-interpolation percentiles (matches DuckDB quantile_cont)."""
    row = df.agg(
        F.percentile(col, F.array(*[F.lit(p) for p in probs])).alias("edges")
    ).head()
    return [float(e) for e in row["edges"]]


def assign_bins(col: Column, edges: list[float]) -> Column:
    """Bin index in [0, len(edges)]: i iff edges[i-1] <= x < edges[i]."""
    expr = F.lit(len(edges))
    for i in reversed(range(len(edges))):
        expr = F.when(col < F.lit(edges[i]), F.lit(i)).otherwise(expr)
    return expr


def discretize(df: DataFrame, col: str, out: str = "bin",
               probs: tuple[float, ...] = (0.25, 0.5, 0.75)) -> tuple[DataFrame, list[float]]:
    edges = fit_edges(df, col, probs)
    return df.withColumn(out, assign_bins(F.col(col), edges)), edges
