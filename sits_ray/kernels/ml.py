"""Post-classification / scoring utilities over probability matrices
(rows = series/windows, cols = labels). Semantics mirror the reference
kernels, cited per function.
"""

from __future__ import annotations

import numpy as np


def softmax(values: np.ndarray) -> np.ndarray:
    """Numerically-stable softmax (reference ``src/softmax.cpp:15-37``).

    Note: the reference subtracts the GLOBAL matrix max (not per-row) before
    exponentiating; the result is mathematically identical to per-row
    stabilization, and we use per-row for better conditioning."""
    v = np.atleast_2d(np.asarray(values, dtype=np.float64))
    mx = np.max(v, axis=1, keepdims=True)
    e = np.exp(v - mx)
    return e / np.sum(e, axis=1, keepdims=True)


def normalize_minmax(data: np.ndarray, mins: np.ndarray, maxs: np.ndarray) -> np.ndarray:
    """Column min-max normalization clamped to [1e-4, 1]
    (reference ``src/normalize_data.cpp:10-20``)."""
    d = np.atleast_2d(np.asarray(data, dtype=np.float64))
    res = (d - mins) / (np.asarray(maxs) - np.asarray(mins))
    return np.clip(res, 0.0001, 1.0)


def label_max_prob(probs: np.ndarray) -> np.ndarray:
    """1-based argmax per row; NaNs treated as 0; all-zero rows -> NaN
    (reference ``src/label_class.cpp:7-20``)."""
    p = np.nan_to_num(np.atleast_2d(np.asarray(probs, dtype=np.float64)), nan=0.0)
    out = np.argmax(p, axis=1).astype(np.float64) + 1.0
    out[np.all(p == 0.0, axis=1)] = np.nan
    return out


def entropy_probs(probs: np.ndarray) -> np.ndarray:
    """Normalized entropy -sum p*log(p)/log(k) (reference ``src/uncertainty.cpp:8-10``)."""
    p = np.atleast_2d(np.asarray(probs, dtype=np.float64))
    k = p.shape[1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = p * (np.log(p) / np.log(k))
    return -np.nansum(t, axis=1)


def margin_probs(probs: np.ndarray) -> np.ndarray:
    """1 - (p1 - p2) with p1>=p2 the two largest (reference ``src/uncertainty.cpp:13-19``)."""
    p = np.sort(np.atleast_2d(np.asarray(probs, dtype=np.float64)), axis=1)[:, ::-1]
    return 1.0 - (p[:, 0] - p[:, 1])


def least_probs(probs: np.ndarray) -> np.ndarray:
    """1 - max(p) least-confidence (reference ``src/uncertainty.cpp:22-23``)."""
    p = np.atleast_2d(np.asarray(probs, dtype=np.float64))
    return 1.0 - np.max(p, axis=1)


def combine_average(prob_stack: list[np.ndarray], weights: list[float] | None = None) -> np.ndarray:
    """Ensemble average of k probability matrices, uniform or weighted
    (reference ``src/combine_data.cpp:8-87`` / ``R/sits_combine_predictions.R:82-182``)."""
    stack = np.stack([np.asarray(p, dtype=np.float64) for p in prob_stack])
    if weights is None:
        return np.mean(stack, axis=0)
    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    return np.tensordot(w, stack, axes=1)


def combine_uncertainty(prob_stack: list[np.ndarray],
                        uncert_stack: list[np.ndarray]) -> np.ndarray:
    """Uncertainty-weighted ensemble (reference ``sits_combine_predictions``
    type="uncertainty", ``R/sits_combine_predictions.R:124-182`` +
    ``src/combine_data.cpp:40-87``): per-row weights are the normalized
    INVERSE uncertainties ``w_c = (1/u_c) / sum_j (1/u_j)``; the combined
    probability is ``sum_c w_c * p_c``. (The reference kernel's weight
    loop reads ``conf(i,0)`` for every classifier — an indexing quirk; we
    implement the inverse-uncertainty formula its API documents, the same
    convention as ``t_skew``.) Callers should floor uncertainties away
    from zero (an exactly-certain model would otherwise take all weight
    via an inf/inf NaN)."""
    P = np.stack([np.atleast_2d(np.asarray(p, np.float64)) for p in prob_stack])
    U = np.stack([np.atleast_1d(np.asarray(u, np.float64)) for u in uncert_stack])
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / U                                # (C, n)
        w = inv / inv.sum(axis=0, keepdims=True)
    return np.einsum("cn,cnk->nk", w, P)


def confusion_matrix(y_true: np.ndarray, y_pred: np.ndarray, k: int) -> np.ndarray:
    """(k x k) counts, rows = predicted (map), cols = reference
    (the reference's caret-style table, ``R/sits_accuracy.R``)."""
    y_true = np.asarray(y_true, dtype=np.int64)
    y_pred = np.asarray(y_pred, dtype=np.int64)
    return np.bincount(y_pred * k + y_true, minlength=k * k).reshape(k, k).astype(np.float64)


def accuracy_metrics(cm: np.ndarray, area_weights: np.ndarray | None = None) -> dict:
    """Overall accuracy, Cohen's kappa, per-class producer/user accuracy;
    optionally area-weighted (Olofsson et al. 2013, the reference's
    ``sits_accuracy_area``, ``R/sits_accuracy.R:1-500``): with mapped-area
    proportions ``W_i`` per predicted class, cell proportions are
    ``p_ij = W_i * n_ij / n_i.`` and all metrics come from ``p``."""
    cm = np.asarray(cm, dtype=np.float64)
    k = cm.shape[0]
    total = cm.sum()
    if area_weights is not None:
        w = np.asarray(area_weights, dtype=np.float64)
        w = w / w.sum()
        row = cm.sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            p = np.where(row[:, None] > 0, w[:, None] * cm / row[:, None], 0.0)
    else:
        p = cm / total if total else cm
    diag = np.diag(p)
    rows = p.sum(axis=1)  # predicted (user's side)
    cols = p.sum(axis=0)  # reference (producer's side)
    overall = float(diag.sum())
    pe = float((rows * cols).sum())
    kappa = (overall - pe) / (1.0 - pe) if pe < 1.0 else 1.0
    with np.errstate(invalid="ignore", divide="ignore"):
        ua = np.where(rows > 0, diag / rows, np.nan)
        pa = np.where(cols > 0, diag / cols, np.nan)
    return {
        "overall": overall,
        "kappa": float(kappa),
        "producer_acc": pa,
        "user_acc": ua,
    }


def pav_blocks(cq, n, nc):
    """Pool-adjacent-violators over confidence groups sorted by ``cq``:
    returns the isotonic (nondecreasing accuracy) block partition as
    parallel lists (lo, hi, n, n_correct). ALL-INTEGER: the violation
    test is the cross-multiplied ``nc_prev * n_cur > nc_cur * n_prev``
    (strict — equal-mean neighbors stay separate blocks, a deterministic
    tie rule both engines share), so the block structure is an exact
    pure function of the counts; rates are divided once downstream.
    Driver-side over the bounded confidence-grid group table."""
    stack: list[list[int]] = []
    for c, cnt, cor in zip(cq, n, nc):
        stack.append([int(c), int(c), int(cnt), int(cor)])
        while (len(stack) >= 2
               and stack[-2][3] * stack[-1][2] > stack[-1][3] * stack[-2][2]):
            top = stack.pop()
            prev = stack.pop()
            stack.append([prev[0], top[1], prev[2] + top[2],
                          prev[3] + top[3]])
    return stack
