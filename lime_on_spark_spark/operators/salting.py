"""Skew mitigation via key salting (SURVEY.md §4 scale notes).

AQE's skew-join splitting handles most skew at runtime; salting is the
explicit fallback for pathological hot keys (one key >> a partition) and
for skewed AGGREGATIONS, which AQE does not split. Pattern:

* aggregate: add a salt in [0, n_salts) to the key, partial-aggregate on
  (key, salt), then final-aggregate on key — two small shuffles instead of
  one skewed one. Works for any commutative re-aggregable function.
* join: salt the skewed (probe) side's key; explode the build side over all
  salts so every (key, salt) pair still matches. Build-side inflation is
  n_salts×, so use only on genuinely small-ish build sides or per-hot-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int, out: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a stable row attribute when possible
    is unnecessary — any uniform assignment rebalances; pmod(xxhash64 of all
    columns) keeps it deterministic for tests."""
    return df.withColumn(
        out, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_sum(
    df: DataFrame, key: str, value: str, n_salts: int = 8, alias: str = "total"
) -> DataFrame:
    """Two-phase skew-safe sum: (key, salt) partial -> key final."""
    salted = with_salt(df, key, n_salts)
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(alias))


def salted_join_small_build(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where the probe side has hot keys: salt the probe key and
    explode the build side over every salt value so matching still holds.
    The build side inflates n_salts x — reserve for small builds."""
    salted_probe = with_salt(probe, key, n_salts)
    exploded_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_probe.join(exploded_build, [key, "_salt"]).drop("_salt")
