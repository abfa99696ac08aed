"""Dynamic Time Warping distance — symmetric-2 recursion, matching the
reference kernel semantics (``src/dtw.cpp:71-105``, used by
``sits_detect_change``/``sits_dtw``, ``R/sits_dtw.R:27``):

    cost[i,j] = |a_i - b_j| + min(cost[i-1,j-1], cost[i-1,j], cost[i,j-1])

(Euclidean local distance for multivariate rows.) Pure numpy with an
anti-diagonal-free two-row rolling buffer; the oracle twin
``dtw_distance_ref`` is a literal O(n*m) double loop.
"""

from __future__ import annotations

import numpy as np


def dtw_distance_ref(a: np.ndarray, b: np.ndarray) -> float:
    """Literal reference twin (slow, obviously-correct)."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64).T).T
    b = np.atleast_2d(np.asarray(b, dtype=np.float64).T).T
    n, m = a.shape[0], b.shape[0]
    cost = np.full((n + 1, m + 1), np.inf)
    cost[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d = float(np.sqrt(np.sum((a[i - 1] - b[j - 1]) ** 2)))
            cost[i, j] = d + min(cost[i - 1, j - 1], cost[i - 1, j], cost[i, j - 1])
    return float(cost[n, m])


def dtw_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Row-rolling DTW; identical result to :func:`dtw_distance_ref`."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64).T).T
    b = np.atleast_2d(np.asarray(b, dtype=np.float64).T).T
    n, m = a.shape[0], b.shape[0]
    if n == 0 or m == 0:
        return float("inf")
    # local distance matrix row by row to bound memory at O(m)
    prev = np.full(m + 1, np.inf)
    prev[0] = 0.0
    cur = np.empty(m + 1)
    for i in range(n):
        cur[0] = np.inf
        d = np.sqrt(np.sum((b - a[i]) ** 2, axis=1))
        # sequential along j (cur[j-1] dependency)
        c_prev = prev  # alias
        run = cur
        run_jm1 = np.inf
        for j in range(1, m + 1):
            best = c_prev[j - 1]
            if c_prev[j] < best:
                best = c_prev[j]
            if run_jm1 < best:
                best = run_jm1
            run_jm1 = d[j - 1] + best
            run[j] = run_jm1
        prev, cur = cur, prev
        prev[0] = np.inf if i + 1 > 0 else 0.0
    return float(prev[m])


def dtw_many(M: np.ndarray, pattern: np.ndarray) -> np.ndarray:
    """DTW distance of EVERY row of a (k x L) matrix to one 1-D pattern,
    vectorized across rows (same symmetric-2 recursion and float order as
    :func:`dtw_distance`; parity pinned in tests/test_classify_ml.py)."""
    M = np.atleast_2d(np.asarray(M, dtype=np.float64))
    pat = np.asarray(pattern, dtype=np.float64).ravel()
    k, L = M.shape
    m = pat.size
    if L == 0 or m == 0:
        return np.full(k, np.inf)
    prev = np.full((k, m + 1), np.inf)
    prev[:, 0] = 0.0
    cur = np.empty((k, m + 1))
    for i in range(L):
        d = np.abs(pat[None, :] - M[:, i:i + 1])
        cur[:, 0] = np.inf
        run = np.full(k, np.inf)
        for j in range(1, m + 1):
            best = np.minimum(np.minimum(prev[:, j - 1], prev[:, j]), run)
            run = d[:, j - 1] + best
            cur[:, j] = run
        prev, cur = cur, prev
        prev[:, 0] = np.inf if i + 1 > 0 else 0.0
    return prev[:, m]
