"""Reusable column-expression functions shared across operator modules."""

from lime_on_spark_spark.functions.vector import cosine, dot, l2_norm

__all__ = ["cosine", "dot", "l2_norm"]
