"""Unit tests for the LIME library (SURVEY.md §5.3): closed-form ridge vs a
hand-computed fixture, kernel math vs NumPy, seeded sampler determinism,
and SP-LIME greedy coverage on a toy matrix.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lime_on_spark_spark.lime.pick import submodular_pick
from lime_on_spark_spark.lime.ridge import (
    _lars_lasso_path,
    explain_with_data,
    select_forward,
    select_highest_weights,
    select_lasso_path,
    weighted_ridge,
)


# --------------------------------------------------------------------------
# L6 — closed-form ridge against an independently hand-built normal-equation
# solve on a 3-feature fixture.
# --------------------------------------------------------------------------
class TestWeightedRidge:
    Z = np.array(
        [
            [1.0, 1.0, 1.0],
            [1.0, 0.0, 1.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 1.0, 0.0],
            [0.0, 0.0, 0.0],
        ]
    )
    y = np.array([1.0, 0.8, 0.3, 0.2, 0.9, 0.1])
    w = np.array([1.0, 0.5, 0.5, 0.25, 0.75, 1.0])
    alpha = 1.0

    def _hand_solution(self):
        # Independent construction: explicit augmented design + matrix inverse
        # (vs np.linalg.solve on the normal equations in the implementation).
        X = np.hstack([np.ones((6, 1)), self.Z])
        W = np.diag(self.w)
        reg = self.alpha * np.diag([0.0, 1.0, 1.0, 1.0])
        theta = np.linalg.inv(X.T @ W @ X + reg) @ (X.T @ W @ self.y)
        return theta

    def test_matches_hand_computed_normal_equations(self):
        beta, intercept, _ = weighted_ridge(self.Z, self.y, self.w, self.alpha)
        theta = self._hand_solution()
        assert intercept == pytest.approx(theta[0], abs=1e-12)
        np.testing.assert_allclose(beta, theta[1:], atol=1e-12)

    def test_unweighted_unregularized_recovers_exact_fit(self):
        # y is exactly linear in Z: y = 0.1 + 0.4*z1 + 0.2*z2 + 0.3*z3
        Z = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], dtype=float
        )
        y = 0.1 + Z @ np.array([0.4, 0.2, 0.3])
        beta, intercept, r2 = weighted_ridge(Z, y, np.ones(5), alpha=0.0)
        np.testing.assert_allclose(beta, [0.4, 0.2, 0.3], atol=1e-10)
        assert intercept == pytest.approx(0.1, abs=1e-10)
        assert r2 == pytest.approx(1.0, abs=1e-10)

    def test_r2_in_unit_interval_for_noisy_fit(self):
        _, _, r2 = weighted_ridge(self.Z, self.y, self.w, self.alpha)
        assert 0.0 <= r2 <= 1.0


# --------------------------------------------------------------------------
# L7 — highest-weights feature selection
# --------------------------------------------------------------------------
def test_select_highest_weights_picks_strongest_features():
    rng = np.random.default_rng(0)
    Z = rng.integers(0, 2, size=(200, 6)).astype(float)
    # Only features 1 and 4 matter.
    y = 0.9 * Z[:, 1] - 0.7 * Z[:, 4] + 0.01 * rng.standard_normal(200)
    idx = select_highest_weights(Z, y, np.ones(200), k=2)
    assert list(idx) == [1, 4]


def test_select_forward_recovers_informative_features():
    rng = np.random.default_rng(3)
    Z = rng.integers(0, 2, size=(200, 6)).astype(float)
    # Only features 2 and 5 matter; forward selection must find both even
    # though neither alone explains y fully.
    y = 0.8 * Z[:, 2] + 0.6 * Z[:, 5] + 0.01 * rng.standard_normal(200)
    idx = select_forward(Z, y, np.ones(200), k=2)
    assert list(idx) == [2, 5]


def test_lars_path_orthogonal_entry_order_and_ols_endpoint():
    """On an orthogonal design LARS admits features in |correlation| order
    and ends at the OLS solution — both are textbook LARS facts checkable
    by hand. 4 orthogonal columns (scaled Hadamard), y built so feature
    correlations rank 2 > 0 > 3 (feature 1 unused)."""
    H = np.array(
        [[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]],
        dtype=float,
    )
    X = np.vstack([H, -H])  # 8x4, columns orthogonal, zero-mean
    beta_true = np.array([0.5, 0.0, 1.0, 0.25])
    y = X @ beta_true
    coefs = _lars_lasso_path(X, y)
    entry = []
    for coef in coefs:
        for j in np.flatnonzero(coef):
            if j not in entry:
                entry.append(j)
    assert entry[:3] == [2, 0, 3]
    np.testing.assert_allclose(coefs[-1], beta_true, atol=1e-8)


def test_select_lasso_path_picks_informative_features():
    rng = np.random.default_rng(7)
    Z = rng.integers(0, 2, size=(200, 6)).astype(float)
    y = 0.9 * Z[:, 1] - 0.7 * Z[:, 4] + 0.01 * rng.standard_normal(200)
    idx = select_lasso_path(Z, y, np.ones(200), k=2)
    assert list(idx) == [1, 4]
    # k=1 keeps the single strongest feature
    idx1 = select_lasso_path(Z, y, np.ones(200), k=1)
    assert list(idx1) == [1]


def test_select_lasso_path_weighted_hand_case():
    """3-feature hand case: with weights zeroing out the rows where feature
    2 varies, the weighted path must rank features 0 then 1 and never
    select 2."""
    Z = np.array(
        [
            [1.0, 0.0, 1.0],
            [1.0, 1.0, 0.0],
            [0.0, 1.0, 1.0],
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
        ]
    )
    y = np.array([1.0, 1.4, 0.5, 0.0, 1.0, 0.4])  # y = z0 + 0.4*z1 exactly
    w = np.ones(6)
    assert list(select_lasso_path(Z, y, w, k=2)) == [0, 1]
    assert list(select_lasso_path(Z, y, w, k=1)) == [0]


def test_explain_with_data_lasso_path_green():
    rng = np.random.default_rng(11)
    Z = rng.integers(0, 2, size=(150, 5)).astype(float)
    Z[0] = 1.0
    y = 0.5 * Z[:, 1] - 0.4 * Z[:, 4] + 0.01 * rng.standard_normal(150)
    idx, beta, intercept, r2, local_pred = explain_with_data(
        Z, y, np.ones(150), k=2, method="lasso_path"
    )
    assert list(idx) == [1, 4]
    assert 0.0 <= r2 <= 1.0
    assert np.isfinite(local_pred) and np.isfinite(intercept)
    np.testing.assert_allclose(beta, [0.5, -0.4], atol=0.05)


def test_explain_with_data_forward_matches_highest_on_clean_signal():
    rng = np.random.default_rng(4)
    Z = rng.integers(0, 2, size=(150, 5)).astype(float)
    Z[0] = 1.0
    y = 0.5 * Z[:, 1] - 0.4 * Z[:, 4]
    fwd = explain_with_data(Z, y, np.ones(150), k=2, method="forward_selection")
    hw = explain_with_data(Z, y, np.ones(150), k=2, method="highest_weights")
    assert list(fwd[0]) == list(hw[0]) == [1, 4]
    np.testing.assert_allclose(fwd[1], hw[1], atol=1e-3)


def test_explain_with_data_local_pred_consistent():
    rng = np.random.default_rng(1)
    Z = rng.integers(0, 2, size=(100, 5)).astype(float)
    Z[0] = 1.0  # sample 0 = unperturbed instance (all-ones rep)
    y = 0.5 * Z[:, 0] + 0.25 * Z[:, 3] + 0.05
    idx, beta, intercept, r2, local_pred = explain_with_data(
        Z, y, np.ones(100), k=2, alpha=0.0
    )
    assert local_pred == pytest.approx(intercept + beta.sum(), abs=1e-9)
    assert list(idx) == [0, 3]
    assert r2 == pytest.approx(1.0, abs=1e-9)


# --------------------------------------------------------------------------
# L5 — kernel column vs NumPy
# --------------------------------------------------------------------------
def test_kernel_matches_numpy(spark):
    from lime_on_spark_spark.lime.kernel import (
        euclidean_distance,
        exponential_kernel,
    )

    a = [1.0, 2.0, 3.0]
    b = [0.0, 2.0, 5.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        euclidean_distance(F.col("a"), F.col("b")).alias("d"),
        exponential_kernel(
            euclidean_distance(F.col("a"), F.col("b")), 6.0
        ).alias("k"),
    ).head()
    d_np = float(np.linalg.norm(np.array(a) - np.array(b)))
    assert row["d"] == pytest.approx(d_np, rel=1e-12)
    assert row["k"] == pytest.approx(
        math.sqrt(math.exp(-(d_np**2) / 36.0)), rel=1e-12
    )


# --------------------------------------------------------------------------
# L2/L3 — seeded determinism: same seed => identical masks, across actions
# --------------------------------------------------------------------------
def test_perturb_tabular_deterministic(spark):
    from lime_on_spark_spark.lime.perturb import perturb_tabular

    inst = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [5.0, 6.0, 7.0, 8.0])],
        "instance_id bigint, x array<double>",
    )
    kwargs = dict(mu=[0.0, 0.0, 0.0, 0.0], num_samples=20, seed=11)
    r1 = perturb_tabular(inst, **kwargs).select("instance_id", "sample_id", "z", "raw")
    r2 = perturb_tabular(inst, **kwargs).select("instance_id", "sample_id", "z", "raw")
    rows1 = sorted(map(tuple, r1.collect()))
    rows2 = sorted(map(tuple, r2.collect()))
    assert rows1 == rows2
    # sample 0 is the unperturbed instance
    s0 = [r for r in rows1 if r[1] == 0]
    for iid, _sid, z, raw in s0:
        assert z == [1, 1, 1, 1]
        assert raw == ([1.0, 2.0, 3.0, 4.0] if iid == 0 else [5.0, 6.0, 7.0, 8.0])
    # different seed => different neighborhood
    r3 = perturb_tabular(inst, mu=[0.0] * 4, num_samples=20, seed=12)
    assert sorted(map(tuple, r3.select("instance_id", "sample_id", "z", "raw").collect())) != rows1


def test_perturb_gaussian_moments_and_determinism(spark):
    """Gaussian L2 mode: per-dimension sample moments match the analytic
    N(center, sigma) within 4-sigma-of-the-mean bounds, the stream is
    reproducible across runs AND partitionings, and sample 0 is the
    unperturbed instance."""
    import numpy as np

    from lime_on_spark_spark.lime.perturb import perturb_tabular_gaussian

    inst = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [5.0, 6.0])],
        "instance_id bigint, x array<double>",
    )
    kwargs = dict(
        mu=[10.0, -4.0], sigma=[2.0, 0.5], num_samples=4000, seed=11
    )
    out = perturb_tabular_gaussian(inst, **kwargs)
    rows1 = sorted(map(tuple, out.collect()))
    rows2 = sorted(
        map(tuple, perturb_tabular_gaussian(inst.repartition(7), **kwargs).collect())
    )
    assert rows1 == rows2, "not partitioning-independent"

    by_inst = {0: [], 1: []}
    for iid, sid, raw in rows1:
        if sid == 0:
            assert list(raw) == ([1.0, 2.0] if iid == 0 else [5.0, 6.0])
        else:
            by_inst[iid].append(list(raw))
    n = kwargs["num_samples"] - 1
    for iid, mat in by_inst.items():
        mat = np.asarray(mat)
        assert mat.shape == (n, 2)
        for dim, (m, s) in enumerate(zip(kwargs["mu"], kwargs["sigma"])):
            se = s / np.sqrt(n)
            assert abs(mat[:, dim].mean() - m) < 4 * se, (iid, dim)
            # sample std: se(std) ≈ s/sqrt(2n)
            assert abs(mat[:, dim].std(ddof=1) - s) < 4 * s / np.sqrt(2 * n)

    around = perturb_tabular_gaussian(
        inst, mu=[10.0, -4.0], sigma=[1.0, 1.0], num_samples=2000, seed=3,
        sample_around_instance=True,
    ).collect()
    m0 = np.asarray(
        [list(r["raw"]) for r in around if r["instance_id"] == 0 and r["sample_id"] > 0]
    )
    assert abs(m0[:, 0].mean() - 1.0) < 4 / np.sqrt(len(m0))


def test_perturb_text_masks_words(spark):
    from lime_on_spark_spark.lime.perturb import perturb_text

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
    )
    out = perturb_text(docs, num_samples=10, seed=3).collect()
    by_sample = {r["sample_id"]: r for r in out}
    assert by_sample[0]["perturbed"] == "alpha beta gamma delta epsilon"
    assert by_sample[0]["n_kept"] == 5
    for r in out:
        words = r["perturbed"].split(" ") if r["perturbed"] else []
        assert len(words) == r["n_kept"]
        # kept words appear in original order
        orig = "alpha beta gamma delta epsilon".split(" ")
        it = iter(orig)
        assert all(w in it for w in words)


# --------------------------------------------------------------------------
# L9 — greedy submodular pick on a toy matrix with a known answer
# --------------------------------------------------------------------------
def test_submodular_pick_covers_features():
    W = np.array(
        [
            [0.9, 0.0, 0.0, 0.0],  # covers f0
            [0.8, 0.0, 0.0, 0.0],  # fully redundant with row 0
            [0.0, 0.5, 0.7, 0.6],  # covers f1+f2+f3 (largest joint gain)
            [0.0, 0.5, 0.0, 0.0],  # covers f1 only
        ]
    )
    # importances: f0=sqrt(1.7), f1=sqrt(1.0), f2=sqrt(0.7), f3=sqrt(0.6)
    # greedy: row2 (f1+f2+f3 = 2.61) > row0 (f0 = 1.30) > rest gain 0 -> row1
    # (first index among zero-gain rows). Redundant rows never beat coverage.
    picked = submodular_pick(W, k=3)
    assert picked[:2] == [2, 0]
    assert len(set(picked)) == 3


# --------------------------------------------------------------------------
# End-to-end faithfulness: explaining a model whose decision is driven by
# one known feature must surface that feature with the largest |weight|.
# --------------------------------------------------------------------------
def test_explanation_faithful_to_dominant_feature(spark):
    import numpy as np
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from lime_on_spark_spark.lime.explain import TABULAR_SCHEMA, _fit_group
    from lime_on_spark_spark.lime.kernel import (
        default_kernel_width,
        euclidean_distance,
        exponential_kernel,
    )
    from lime_on_spark_spark.lime.models import score_tabular
    from lime_on_spark_spark.lime.perturb import perturb_tabular
    from pyspark.sql import functions as F

    d = 6
    rng = np.random.default_rng(0)
    X = rng.standard_normal((300, d))
    y = (X[:, 2] > 0).astype(float)  # feature 2 fully determines the label
    train = spark.createDataFrame(
        [(x.tolist(), float(lbl)) for x, lbl in zip(X, y)],
        "embedding array<double>, label double",
    )
    model = LogisticRegression(maxIter=50, regParam=0.01).fit(
        train.select(array_to_vector("embedding").alias("features"), "label")
    )

    inst = spark.createDataFrame(
        [(0, [0.5, -0.3, 2.0, 0.1, -0.2, 0.4])],
        "instance_id bigint, x array<double>",
    )
    samples = perturb_tabular(inst, mu=[0.0] * d, num_samples=400, seed=7)
    scored = score_tabular(model, samples)
    scored = scored.withColumn("y", F.element_at("probs", 2))  # P(class 1)
    weighted = scored.withColumn(
        "weight",
        exponential_kernel(
            euclidean_distance(F.col("raw"), F.col("x")), default_kernel_width(d)
        ),
    )
    # both L7 selection methods must surface the dominant feature
    for method in ("highest_weights", "forward_selection"):
        expl = (
            weighted.select("instance_id", "sample_id", "z", "y", "weight")
            .groupBy("instance_id")
            .applyInPandas(
                lambda pdf: _fit_group(
                    pdf, k=3, alpha=1.0, with_words=False, method=method
                ),
                schema=TABULAR_SCHEMA,
            )
            .toPandas()
        )
        top = expl.loc[expl["weight"].abs().idxmax()]
        assert top["feature_idx"] == 2, (method, expl)
        # masking x2=2.0 to 0 flips P(class 1) down => positive weight on z2
        assert top["weight"] > 0, method


def test_mdl_cuts_separable_and_noise():
    """Fayyad-Irani MDL: a cleanly separable histogram yields the boundary
    cut; a label-independent (noise) histogram yields no cut."""
    import numpy as np

    from lime_on_spark_spark.lime.mdl import mdl_cuts

    # Two classes, perfectly separated at bin 4 of 8 (edge value 0.5).
    hist = np.zeros((8, 2), dtype=np.int64)
    hist[:4, 0] = 25
    hist[4:, 1] = 25
    edges = np.linspace(0.0, 1.0, 9)
    cuts = mdl_cuts(hist, edges)
    assert cuts == [0.5], cuts

    # Same marginals but labels independent of the bin: MDL must refuse.
    noise = np.full((8, 2), 25, dtype=np.int64)
    assert mdl_cuts(noise, edges) == []


def test_perturb_text_bow_masks_all_occurrences(spark):
    """bow=True invariant: a repeated word is fully present or fully absent
    in every perturbed sample — never partially masked."""
    from pyspark.sql import functions as F

    from lime_on_spark_spark.lime.perturb import perturb_text_bow

    docs = spark.createDataFrame(
        [(1, "spark join spark filter spark join")],
        "doc_id bigint, text string",
    )
    out = perturb_text_bow(docs, num_samples=16, seed=3).collect()
    for r in out:
        words = r["perturbed"].split(" ") if r["perturbed"] else []
        n_spark = words.count("spark")
        n_join = words.count("join")
        assert n_spark in (0, 3), r["perturbed"]
        assert n_join in (0, 2), r["perturbed"]
        # z is over the 3-word vocab [spark, join, filter]
        assert len(r["z"]) == 3
        assert r["vocab"] == ["spark", "join", "filter"]
    # sample 0 is unperturbed
    s0 = [r for r in out if r["sample_id"] == 0][0]
    assert s0["perturbed"] == "spark join spark filter spark join"
