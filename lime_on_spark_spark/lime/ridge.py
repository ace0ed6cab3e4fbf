"""Closed-form weighted ridge surrogate (SURVEY.md §2j rows L6, L7).

Upstream analogue [public, unverified locally]:
``lime_base.explain_instance_with_data`` fits sklearn ``Ridge`` with sample
weights, then selects features. sklearn is not available here, so the fit
is the closed-form normal-equations solve

    theta = (X^T W X + alpha * I)^-1 X^T W y

with an unregularized intercept column — NumPy only (`np.linalg.solve`).
Feature selection is upstream's ``highest_weights`` default: fit on all
features, keep the top-k by |weight|, refit on the kept set.
"""

from __future__ import annotations

import numpy as np


def weighted_ridge(
    Z: np.ndarray, y: np.ndarray, w: np.ndarray, alpha: float = 1.0
) -> tuple[np.ndarray, float, float]:
    """Fit y ~ Z with sample weights w; returns (beta, intercept, r2).

    The intercept column is not regularized (matches sklearn Ridge with
    fit_intercept=True on centered data up to conditioning).
    """
    Z = np.asarray(Z, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    n, d = Z.shape
    X = np.hstack([np.ones((n, 1)), Z])
    A = X.T @ (X * w[:, None])
    reg = alpha * np.eye(d + 1)
    reg[0, 0] = 0.0  # no penalty on intercept
    theta = np.linalg.solve(A + reg, X.T @ (w * y))
    pred = X @ theta
    y_bar = np.average(y, weights=w) if w.sum() > 0 else float(y.mean())
    ss_res = float(np.sum(w * (y - pred) ** 2))
    ss_tot = float(np.sum(w * (y - y_bar) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    return theta[1:], float(theta[0]), r2


def select_highest_weights(
    Z: np.ndarray, y: np.ndarray, w: np.ndarray, k: int, alpha: float = 1.0
) -> np.ndarray:
    """Upstream 'highest_weights': rank features by |ridge weight| on the
    full fit, keep the top-k indices (ascending index order)."""
    beta, _, _ = weighted_ridge(Z, y, w, alpha)
    k = min(k, Z.shape[1])
    top = np.argsort(-np.abs(beta), kind="stable")[:k]
    return np.sort(top)


def select_forward(
    Z: np.ndarray, y: np.ndarray, w: np.ndarray, k: int
) -> np.ndarray:
    """Upstream 'forward_selection': greedily add the feature that most
    improves the weighted R^2 of an (effectively) OLS fit, k rounds.

    Upstream uses Ridge(alpha=0); a 1e-8 ridge keeps the normal equations
    solvable when candidate columns are collinear (duplicate mask columns
    happen at small num_samples), which is numerically the same fit.
    """
    k = min(k, Z.shape[1])
    used: list[int] = []
    for _ in range(k):
        best_feat, best_score = -1, -np.inf
        for feat in range(Z.shape[1]):
            if feat in used:
                continue
            cols = used + [feat]
            _, _, r2 = weighted_ridge(Z[:, cols], y, w, alpha=1e-8)
            if r2 > best_score:
                best_feat, best_score = feat, r2
        used.append(best_feat)
    return np.sort(np.array(used, dtype=np.int64))


def explain_with_data(
    Z: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    k: int,
    alpha: float = 1.0,
    method: str = "highest_weights",
) -> tuple[np.ndarray, np.ndarray, float, float, float]:
    """Full L6+L7: select top-k features, refit on them.

    ``method`` is upstream's ``feature_selection``: 'highest_weights'
    (default) or 'forward_selection' (upstream picks the latter under its
    'auto' mode when k <= 6). Returns (feature_idx, weights, intercept, r2,
    local_pred) where local_pred is the surrogate's prediction for the
    unperturbed instance (all-ones interpretable row, i.e. sample 0's
    representation).
    """
    if method == "forward_selection":
        idx = select_forward(Z, y, w, k)
    else:
        idx = select_highest_weights(Z, y, w, k, alpha)
    beta, intercept, r2 = weighted_ridge(Z[:, idx], y, w, alpha)
    local_pred = float(intercept + Z[0, idx] @ beta)
    return idx, beta, intercept, r2, local_pred
