"""SP-LIME submodular pick (SURVEY.md §2j row L9).

Upstream analogue [public, unverified locally]: ``lime/submodular_pick.py``
(paper §4): greedily choose k instances maximizing coverage
``c(V) = sum_j I_j * 1[exists i in V with |W_ij| > 0]`` where the feature
importance is ``I_j = sqrt(sum_i |W_ij|)``.

Driver-side by design: the explanation matrix is (num_explained × d'),
tiny relative to the data that produced it — the distributed work happened
in L8.
"""

from __future__ import annotations

import numpy as np


def submodular_pick(W: np.ndarray, k: int) -> list[int]:
    """Greedy max-coverage over the |instances| × |features| weight matrix.

    Returns row indices of the picked instances, in pick order.
    """
    W = np.abs(np.asarray(W, dtype=np.float64))
    importance = np.sqrt(W.sum(axis=0))
    covered = np.zeros(W.shape[1], dtype=bool)
    picked: list[int] = []
    k = min(k, W.shape[0])
    for _ in range(k):
        gains = ((W > 0) & ~covered) @ importance
        gains[picked] = -1.0
        best = int(np.argmax(gains))
        picked.append(best)
        covered |= W[best] > 0
    return picked
