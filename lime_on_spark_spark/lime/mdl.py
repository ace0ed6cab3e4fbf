"""Entropy (MDL) discretization — Fayyad & Irani 1993, the supervised
discretizer behind upstream LIME's ``EntropyDiscretizer`` (upstream wraps
sklearn's DecisionTreeClassifier; this is the same recursive
minimum-description-length cut criterion in pure NumPy).

Spark-first shape: the DISTRIBUTED step reduces each feature to a bounded
sufficient statistic — per-(feature, quantile-bin) class-count histograms
(≤ n_features × n_bins × n_classes cells, independent of row count) — and
only that bounded table reaches the driver. The recursion then runs on
histograms, never on rows. At 100 TB the histogram agg is one
map-side-combinable groupBy; the driver payload stays a few thousand cells.
"""

from __future__ import annotations

import numpy as np


def _entropy(counts: np.ndarray) -> float:
    """Shannon entropy (bits) of a class-count vector."""
    n = counts.sum()
    if n == 0:
        return 0.0
    p = counts[counts > 0] / n
    return float(-(p * np.log2(p)).sum())


def mdl_cuts(hist: np.ndarray, edges: np.ndarray) -> list[float]:
    """Recursive MDL-accepted cut points for one feature.

    hist:  (n_bins, n_classes) class counts per pre-binned value range
    edges: (n_bins + 1,) bin edges; cut candidates are interior edges.
    Returns accepted cut values, ascending.
    """

    def recurse(lo: int, hi: int) -> list[float]:
        # bins [lo, hi) — evaluate every interior boundary b in (lo, hi).
        seg = hist[lo:hi]
        n = seg.sum()
        if n == 0 or hi - lo < 2:
            return []
        ent_s = _entropy(seg.sum(axis=0))
        k = int((seg.sum(axis=0) > 0).sum())
        best = None
        for b in range(lo + 1, hi):
            left = hist[lo:b].sum(axis=0)
            right = hist[b:hi].sum(axis=0)
            n1, n2 = left.sum(), right.sum()
            if n1 == 0 or n2 == 0:
                continue
            e1, e2 = _entropy(left), _entropy(right)
            gain = ent_s - (n1 / n) * e1 - (n2 / n) * e2
            if best is None or gain > best[0]:
                best = (gain, b, e1, e2, left, right)
        if best is None:
            return []
        gain, b, e1, e2, left, right = best
        k1 = int((left > 0).sum())
        k2 = int((right > 0).sum())
        delta = np.log2(3**k - 2) - (k * ent_s - k1 * e1 - k2 * e2)
        threshold = (np.log2(max(n - 1, 1)) + delta) / n
        if gain <= threshold:
            return []
        return recurse(lo, b) + [float(edges[b])] + recurse(b, hi)

    return recurse(0, hist.shape[0])
