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


def _lars_lasso_path(
    X: np.ndarray, y: np.ndarray, max_steps: int | None = None
) -> list[np.ndarray]:
    """Coefficient vectors at each LARS-lasso breakpoint (Efron et al. 2004,
    'Least Angle Regression', with the lasso modification: an active
    coefficient crossing zero is dropped from the active set).

    Pure NumPy stand-in for sklearn ``lars_path(method='lasso')`` — only
    the path's ACTIVE SETS are consumed by feature selection, so the tiny
    ridge jitter on the Gram solve (collinear mask columns happen at small
    num_samples) is immaterial. O(steps * d * n); d here is LIME's
    interpretable dimension (tens), not the raw feature space.
    """
    n, d = X.shape
    if max_steps is None:
        max_steps = 8 * d + 16
    coef = np.zeros(d)
    coefs = [coef.copy()]
    active: list[int] = []
    tiny = 1e-12
    for _ in range(max_steps):
        c = X.T @ (y - X @ coef)
        C = float(np.max(np.abs(c))) if d else 0.0
        if C < 1e-10:
            break
        if len(active) < min(max(n - 1, 1), d):
            mask = np.ones(d, dtype=bool)
            mask[active] = False
            if mask.any():
                cabs = np.where(mask, np.abs(c), -np.inf)
                jmax = int(np.argmax(cabs))
                if cabs[jmax] >= C - 1e-10:
                    active.append(jmax)
        if not active:
            break
        s = np.sign(c[active])
        s[s == 0] = 1.0
        XA = X[:, active] * s
        G = XA.T @ XA + 1e-10 * np.eye(len(active))
        ones = np.ones(len(active))
        Ginv1 = np.linalg.solve(G, ones)
        A = 1.0 / np.sqrt(max(float(ones @ Ginv1), tiny))
        w_eq = A * Ginv1
        a = X.T @ (XA @ w_eq)
        # Distance to the next breakpoint: an inactive feature's correlation
        # catches up, all correlations hit zero, or (lasso) an active
        # coefficient crosses zero.
        gamma = C / A
        for j in range(d):
            if j in active:
                continue
            for num, den in ((C - c[j], A - a[j]), (C + c[j], A + a[j])):
                if den > tiny:
                    g = num / den
                    if tiny < g < gamma:
                        gamma = float(g)
        dvec = s * w_eq
        drop = None
        for pos, j in enumerate(active):
            if abs(dvec[pos]) > tiny:
                g = -coef[j] / dvec[pos]
                if tiny < g < gamma:
                    gamma, drop = float(g), pos
        coef[active] += gamma * dvec
        if drop is not None:
            coef[active[drop]] = 0.0
            active.pop(drop)
        coefs.append(coef.copy())
    return coefs


def select_lasso_path(
    Z: np.ndarray, y: np.ndarray, w: np.ndarray, k: int
) -> np.ndarray:
    """Upstream 'lasso_path': weighted-center the data, walk the LARS-lasso
    path from its dense end backward, and keep the first (largest) active
    set with at most k features — upstream lime_base's selection loop
    verbatim, minus sklearn. The returned set can be SMALLER than k when
    the path jumps (a drop step), exactly as upstream."""
    w = np.asarray(w, dtype=np.float64)
    sw = np.sqrt(w)
    Xc = (Z - np.average(Z, axis=0, weights=w)) * sw[:, None]
    yc = (y - np.average(y, weights=w)) * sw
    coefs = _lars_lasso_path(Xc, yc)
    nonzero = np.arange(Z.shape[1])
    for coef in coefs[:0:-1]:
        nonzero = np.flatnonzero(coef)
        if len(nonzero) <= k:
            break
    return np.sort(nonzero)


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
    (default), 'forward_selection' (upstream picks it under 'auto' when
    k <= 6), or 'lasso_path' (LARS-lasso active set). Returns
    (feature_idx, weights, intercept, r2, local_pred) where local_pred is
    the surrogate's prediction for the unperturbed instance (all-ones
    interpretable row, i.e. sample 0's representation).
    """
    if method == "forward_selection":
        idx = select_forward(Z, y, w, k)
    elif method == "lasso_path":
        idx = select_lasso_path(Z, y, w, k)
        if len(idx) == 0:
            # Degenerate path (constant y): fall back to the default ranker
            # so the refit below always has at least one column.
            idx = select_highest_weights(Z, y, w, min(k, 1), alpha)
    else:
        idx = select_highest_weights(Z, y, w, k, alpha)
    beta, intercept, r2 = weighted_ridge(Z[:, idx], y, w, alpha)
    local_pred = float(intercept + Z[0, idx] @ beta)
    return idx, beta, intercept, r2, local_pred
