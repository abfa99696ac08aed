"""Non-negative least squares endmember unmixing — the ``sits_mixture_model``
analog (reference ``R/sits_mixture_model.R:106-270``; batched solver
``src/nnls_solver.cpp:46-124``, 50k rows per batch).

:func:`nnls` is the classic Lawson-Hanson active-set algorithm (Lawson &
Hanson 1974, "Solving Least Squares Problems", ch. 23) in pure numpy.
:func:`unmix` applies it row-wise to a (rows x bands) matrix against a
broadcast (endmembers x bands) matrix, optionally returning the residual
RMSE band like the reference's ``rmse_band`` option.
"""

from __future__ import annotations

import numpy as np


def nnls(A: np.ndarray, b: np.ndarray, max_iter: int | None = None, tol: float = 1e-11):
    """Solve min ||Ax - b|| s.t. x >= 0. Returns (x, rnorm)."""
    A = np.asarray(A, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    m, n = A.shape
    if max_iter is None:
        max_iter = 3 * n
    x = np.zeros(n)
    P = np.zeros(n, dtype=bool)  # passive (free) set
    w = A.T @ (b - A @ x)
    it = 0
    while (~P).any() and (w[~P] > tol).any():
        j = int(np.argmax(np.where(~P, w, -np.inf)))
        P[j] = True
        while True:
            it += 1
            if it > max_iter:
                break
            Ap = A[:, P]
            s_p, *_ = np.linalg.lstsq(Ap, b, rcond=None)
            if (s_p > tol).all():
                x = np.zeros(n)
                x[P] = s_p
                break
            # shrink the step to stay feasible; move blockers to active set
            xp = x[P]
            neg = s_p <= tol
            with np.errstate(divide="ignore", invalid="ignore"):
                ratios = np.where(neg, xp / (xp - s_p), np.inf)
            alpha = np.min(ratios)
            x[P] = xp + alpha * (s_p - xp)
            P[np.asarray(P).nonzero()[0][x[P] <= tol]] = False
            x[~P] = 0.0
        if it > max_iter:
            break
        w = A.T @ (b - A @ x)
    return x, float(np.linalg.norm(A @ x - b))


def unmix(values: np.ndarray, endmembers: np.ndarray, rmse_band: bool = True):
    """Row-wise NNLS unmixing: values (rows x bands), endmembers
    (k x bands). Returns (fractions rows x k, rmse rows) — the reference
    scales fractions implicitly by the model; we return raw NNLS solutions.
    """
    v = np.atleast_2d(np.asarray(values, dtype=np.float64))
    E = np.asarray(endmembers, dtype=np.float64)
    A = E.T  # (bands x k)
    fracs = np.empty((v.shape[0], E.shape[0]))
    rmse = np.empty(v.shape[0])
    nb = v.shape[1]
    for i in range(v.shape[0]):
        x, rn = nnls(A, v[i])
        fracs[i] = x
        rmse[i] = rn / np.sqrt(nb)
    return (fracs, rmse) if rmse_band else (fracs, None)


def _seqdot_const(a, b) -> float:
    """Scalar sequential dot with pinned left-associated order (matches
    the generated SQL literal chains)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def unmix2_pinned(m: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Exact 2-endmember NNLS by case enumeration, every float operation
    in a PINNED order so a generated SQL twin is bit-identical.

    For two variables the NNLS optimum is either the unconstrained
    normal-equation solution (when feasible) or the better of the two
    clamped single-endmember projections — enumeration IS Lawson-Hanson
    here (src/nnls_solver.cpp semantics, n_endmembers=2). Returns
    (fracs (n,2), rmse (n,)). Gram constants are computed once with the
    same sequential rule the SQL literals use."""
    n, d = m.shape
    a11 = _seqdot_const(e1, e1)
    a12 = _seqdot_const(e1, e2)
    a22 = _seqdot_const(e2, e2)
    det = a11 * a22 - a12 * a12

    def seqdot(w: np.ndarray) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        for j in range(d):
            acc = acc + m[:, j] * float(w[j])
        return acc

    b1, b2 = seqdot(e1), seqdot(e2)
    x1u = (a22 * b1 - a12 * b2) / det
    x2u = (a11 * b2 - a12 * b1) / det
    x1a = np.maximum(b1 / a11, 0.0)
    x2b = np.maximum(b2 / a22, 0.0)

    def rss(x1, x2, use1: bool, use2: bool) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        for j in range(d):
            t = m[:, j]
            if use1:
                t = t - x1 * float(e1[j])
            if use2:
                t = t - x2 * float(e2[j])
            acc = acc + t * t
        return acc

    rssu = rss(x1u, x2u, True, True)
    rss1 = rss(x1a, None, True, False)
    rss2 = rss(None, x2b, False, True)

    feas = (x1u >= 0.0) & (x2u >= 0.0)
    pick1 = rss1 <= rss2
    f0 = np.where(feas, x1u, np.where(pick1, x1a, 0.0))
    f1 = np.where(feas, x2u, np.where(pick1, 0.0, x2b))
    chosen = np.where(feas, rssu, np.where(pick1, rss1, rss2))
    rmse = np.sqrt(chosen / float(d))
    return np.stack([f0, f1], axis=1), rmse
