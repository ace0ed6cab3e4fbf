"""Shared JVM-side vector math (SURVEY.md §2h row F6).

These are the primitives every similarity operator builds on (D2/D3/D4
near-dup + kNN in plans/vectors.py, IVF in operators/ivf.py). Pure
higher-order-function column expressions — no UDFs — so they stay inside
whole-stage codegen at any scale. Float32 elements are cast to double
*before* arithmetic so Spark and the DuckDB oracle accumulate in f64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, left-to-right (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sq_l2(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² in double precision, left-to-right — the k-means assignment
    metric. Same fold order as DuckDB's list_sum over list_zip, so rounded
    distances agree across engines."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
