"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013).

The display/downsample modality of the rollup engine: reduce a regular
series to ``n_out`` REPRESENTATIVE points (actual data elements, not
aggregates) while preserving visual shape — first and last points always
kept, interior divided into ``n_out - 2`` equal buckets, and each bucket
contributes the point maximizing the triangle area with the previously
selected point and the NEXT bucket's average. Selection is inherently
sequential in the previously-selected point, so the kernel loops over
buckets (``n_out`` is small, e.g. tens to hundreds) while staying
vectorized across every series of a batch inside each bucket step.

``lttb_indices_scalar`` is the literal-textbook twin used by the tests.
"""

from __future__ import annotations

import numpy as np


def _bucket_bounds(n: int, n_out: int) -> tuple[np.ndarray, np.ndarray]:
    """Interior bucket [start, end) bounds over indices 1..n-1 (the
    canonical float split ``1 + i*(n-2)/(n_out-2)``)."""
    nb = n_out - 2
    edges = 1 + np.floor(np.arange(nb + 1) * (n - 2) / nb).astype(np.int64)
    return edges[:-1], edges[1:]


def lttb_indices_scalar(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Textbook per-point LTTB (loops, one series) — the test oracle."""
    n = x.size
    if n_out >= n or n_out < 3:
        return np.arange(n)
    starts, ends = _bucket_bounds(n, n_out)
    sel = [0]
    a = 0
    for b in range(n_out - 2):
        s, e = int(starts[b]), int(ends[b])
        if b + 1 < n_out - 2:
            ns, ne = int(starts[b + 1]), int(ends[b + 1])
        else:
            ns, ne = n - 1, n
        # sequential accumulation (not .mean()'s pairwise sum): the float
        # order a SQL ordered-window running sum replays exactly — the
        # lttb_downsample oracle contract
        sx = np.float64(0.0)
        sy = np.float64(0.0)
        for j in range(ns, ne):
            sx = sx + x[j]
            sy = sy + y[j]
        avg_x = sx / (ne - ns)
        avg_y = sy / (ne - ns)
        best, best_area = s, -1.0
        for i in range(s, e):
            area = abs(
                (x[a] - avg_x) * (y[i] - y[a]) - (x[a] - x[i]) * (avg_y - y[a])
            )
            if area > best_area:
                best_area = area
                best = i
        sel.append(best)
        a = best
    sel.append(n - 1)
    return np.asarray(sel, dtype=np.int64)


def lttb_indices_batch(X: np.ndarray, Y: np.ndarray, n_out: int) -> np.ndarray:
    """Vectorized-across-series LTTB: ``X``/``Y`` are (n_series, n)
    matrices of one length group; returns (n_series, n_out) selected
    indices. Identical picks to :func:`lttb_indices_scalar` (first-max
    tie rule both sides)."""
    m, n = X.shape
    if n_out >= n or n_out < 3:
        return np.broadcast_to(np.arange(n), (m, n)).copy()
    starts, ends = _bucket_bounds(n, n_out)
    out = np.empty((m, n_out), dtype=np.int64)
    out[:, 0] = 0
    out[:, -1] = n - 1
    rows = np.arange(m)
    ax = X[:, 0].astype(np.float64).copy()
    ay = Y[:, 0].astype(np.float64).copy()
    for b in range(n_out - 2):
        s, e = int(starts[b]), int(ends[b])
        if b + 1 < n_out - 2:
            ns, ne = int(starts[b + 1]), int(ends[b + 1])
        else:
            ns, ne = n - 1, n
        # sequential over the bucket, vectorized across series (the SQL
        # running-sum order — see scalar twin)
        acc_x = np.zeros(m, dtype=np.float64)
        acc_y = np.zeros(m, dtype=np.float64)
        for j in range(ns, ne):
            acc_x = acc_x + X[:, j]
            acc_y = acc_y + Y[:, j]
        avg_x = acc_x / (ne - ns)
        avg_y = acc_y / (ne - ns)
        xs = X[:, s:e]
        ys = Y[:, s:e]
        area = np.abs(
            (ax[:, None] - avg_x[:, None]) * (ys - ay[:, None])
            - (ax[:, None] - xs) * (avg_y[:, None] - ay[:, None])
        )
        pick = s + np.argmax(area, axis=1)  # first max == scalar loop rule
        out[:, b + 1] = pick
        ax = X[rows, pick].astype(np.float64)
        ay = Y[rows, pick].astype(np.float64)
    return out
