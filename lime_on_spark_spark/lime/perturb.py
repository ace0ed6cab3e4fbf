"""Perturbation samplers for LIME (SURVEY.md §2j rows L2 tabular, L3 text).

Upstream analogue [public, unverified locally]: ``lime_tabular``'s
neighborhood sampler and ``lime_text.IndexedString`` word masking.

Determinism without driver-side RNG: every Bernoulli draw is
``xxhash64(seed, instance_id, sample_id, position) mod 2`` — a pure JVM
expression, reproducible across runs, partitionings, and cluster sizes
(no per-partition RNG state, no collect). Sample 0 is always the
unperturbed instance, as upstream.

Scale design: the instances × num_samples explosion happens via
``explode(sequence(...))`` — each instance's neighborhood is generated
where the instance row lives; nothing round-trips the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bernoulli_keep(seed: int, instance_id: Column, sample_id: Column, pos: Column) -> Column:
    """Deterministic fair coin: True => keep the original feature/word."""
    h = F.xxhash64(F.lit(seed), instance_id, sample_id, pos)
    return F.pmod(h, F.lit(2)) == 0


def with_samples(instances: DataFrame, num_samples: int) -> DataFrame:
    """Explode each instance row into `num_samples` sample rows."""
    return instances.withColumn(
        "sample_id", F.explode(F.sequence(F.lit(0), F.lit(num_samples - 1)))
    )


def perturb_tabular(
    instances: DataFrame,
    *,
    x_col: str = "x",
    id_col: str = "instance_id",
    mu: list[float],
    num_samples: int,
    seed: int = 7,
) -> DataFrame:
    """Binary-mask neighborhood: z_i ~ Bernoulli(1/2); masked dims are
    replaced with the corpus mean mu_i (mask-to-baseline reconstruction).

    Output adds: sample_id, z (array<int> interpretable rep), raw
    (array<double> reconstruction fed to the black box).
    """
    d = len(mu)
    mu_col = F.array(*[F.lit(float(m)) for m in mu])
    samples = with_samples(instances, num_samples)
    keep = lambda i: _bernoulli_keep(  # noqa: E731
        seed, F.col(id_col), F.col("sample_id"), i
    )
    z = F.when(
        F.col("sample_id") == 0, F.array_repeat(F.lit(1), d)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)), lambda i: keep(i).cast("int")
        )
    )
    samples = samples.withColumn("z", z)
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: (
            F.element_at(F.col(x_col), i + 1).cast("double")
            * F.element_at(F.col("z"), i + 1)
            + F.element_at(mu_col, i + 1)
            * (1 - F.element_at(F.col("z"), i + 1))
        ),
    )
    return samples.withColumn("raw", raw)


def perturb_tabular_gaussian(
    instances: DataFrame,
    *,
    x_col: str = "x",
    id_col: str = "instance_id",
    mu: list[float],
    sigma: list[float],
    num_samples: int,
    seed: int = 7,
    sample_around_instance: bool = False,
) -> DataFrame:
    """Upstream-fidelity Gaussian neighborhood (the non-discretized
    lime_tabular sampler): raw_i ~ N(center_i, sigma_i) with center = the
    corpus mean (upstream default) or the instance itself
    (`sample_around_instance=True`). Sample 0 is the unperturbed instance.

    Alternative L2 mode: the deterministic mask-to-mean `perturb_tabular`
    stays the default (exactly reproducible, pure JVM); this mode exists
    for fidelity with the published algorithm's sampling distribution.

    Determinism without driver-side RNG state: each instance's whole
    neighborhood block is drawn inside `mapInPandas` from a PCG64 generator
    seeded by (seed, instance_id) — reproducible across runs, partitionings
    and cluster sizes, because the stream never crosses instances.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d = len(mu)
    if len(sigma) != d:
        raise ValueError(f"mu ({d}) and sigma ({len(sigma)}) length mismatch")
    mu_arr_b, sigma_arr_b = list(map(float, mu)), list(map(float, sigma))
    in_schema = instances.select(
        F.col(id_col).cast("long").alias("instance_id"),
        F.col(x_col).alias("x"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mu_arr = np.asarray(mu_arr_b)
        sigma_arr = np.asarray(sigma_arr_b)
        for pdf in batches:
            out = []
            for iid, x in zip(pdf["instance_id"], pdf["x"]):
                x = np.asarray(list(x), dtype=np.float64)
                rng = np.random.default_rng([seed, int(iid)])
                center = x if sample_around_instance else mu_arr
                raw = rng.standard_normal((num_samples, d)) * sigma_arr + center
                raw[0] = x  # sample 0 = the unperturbed instance, as upstream
                out.append(
                    pd.DataFrame(
                        {
                            "instance_id": np.full(num_samples, int(iid)),
                            "sample_id": np.arange(num_samples),
                            "raw": list(raw),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"instance_id": [], "sample_id": [], "raw": []}
            )

    return in_schema.mapInPandas(
        run, schema="instance_id bigint, sample_id int, raw array<double>"
    )


def perturb_text(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_samples: int,
    seed: int = 7,
) -> DataFrame:
    """Word-masking neighborhood for text: each word position is kept with
    probability 1/2; the perturbed text is the kept words re-joined.

    Output adds: sample_id, z (array<int> over word positions), perturbed
    (string), n_kept.
    """
    # Materialize the token array as a column BEFORE indexing it inside
    # transform lambdas: element_at over an inline split() re-evaluates the
    # split per element access — O(words²) per sample row.
    samples = with_samples(docs, num_samples).withColumn(
        "_toks", F.split(F.col(text_col), " ")
    )
    toks = F.col("_toks")
    keep = lambda i: _bernoulli_keep(  # noqa: E731
        seed, F.col(id_col), F.col("sample_id"), i
    )
    z = F.when(
        F.col("sample_id") == 0,
        F.array_repeat(F.lit(1), F.size(toks)),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda i: keep(i).cast("int"),
        )
    )
    samples = samples.withColumn("z", z)
    kept_words = F.array_compact(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda i: F.when(
                F.element_at(F.col("z"), i + 1) == 1, F.element_at(toks, i + 1)
            ),
        )
    )
    return (
        samples.withColumn("perturbed", F.concat_ws(" ", kept_words))
        .withColumn("n_kept", F.aggregate("z", F.lit(0), lambda s, v: s + v))
        .drop("_toks")
    )


def perturb_text_bow(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_samples: int,
    seed: int = 7,
) -> DataFrame:
    """Bag-of-words masking — upstream ``lime_text``'s DEFAULT mode
    (``bow=True``): the interpretable feature is the DISTINCT word, and
    masking a feature removes EVERY occurrence. The vocabulary is the
    doc's distinct words in first-appearance order (upstream
    ``IndexedString`` semantics).

    Output adds: sample_id, vocab (array<string>), z (array<int> over
    vocab positions), perturbed (string), n_kept (kept vocab count).
    """
    samples = with_samples(docs, num_samples).withColumn(
        "_toks", F.split(F.col(text_col), " ")
    )
    # array_distinct preserves first-appearance order.
    samples = samples.withColumn("vocab", F.array_distinct(F.col("_toks")))
    keep = lambda i: _bernoulli_keep(  # noqa: E731
        seed, F.col(id_col), F.col("sample_id"), i
    )
    z = F.when(
        F.col("sample_id") == 0,
        F.array_repeat(F.lit(1), F.size("vocab")),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("vocab") - 1),
            lambda i: keep(i).cast("int"),
        )
    )
    samples = samples.withColumn("z", z)
    # A word survives iff its VOCAB slot is kept — every occurrence moves
    # together (|vocab| is small, so array_position stays cheap).
    kept_words = F.filter(
        F.col("_toks"),
        lambda w: F.element_at(
            F.col("z"), F.array_position(F.col("vocab"), w).cast("int")
        )
        == 1,
    )
    return (
        samples.withColumn("perturbed", F.concat_ws(" ", kept_words))
        .withColumn("n_kept", F.aggregate("z", F.lit(0), lambda s, v: s + v))
        .drop("_toks")
    )
