"""LIME distance + kernel weighting (SURVEY.md §2j row L5).

Upstream analogue [public, unverified locally]: ``lime/lime_base.py``'s
exponential kernel ``exp(-d^2 / width^2)`` with default width
``0.75 * sqrt(d)`` over euclidean distance (tabular) / cosine distance
(text). Everything here is pure JVM column expressions — kernel weighting
of 5000 perturbations × millions of instances is a scan, not a UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def default_kernel_width(dim: int) -> float:
    return 0.75 * math.sqrt(dim)


def euclidean_distance(a: Column, b: Column) -> Column:
    """L2 distance between two array<double> columns, JVM-side."""
    sq = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda s, v: s + v))


def exponential_kernel(dist: Column, width: float) -> Column:
    """exp(-d^2 / w^2) — LIME's locality weight."""
    return F.exp(-(dist * dist) / F.lit(float(width * width)))
