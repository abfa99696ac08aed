"""Smoothing filters over (series x time) matrices.

* :func:`whittaker` — Whittaker smoother with 2nd-order difference penalty,
  default ``lambda = 0.5``; replicates the exact banded-solver recursion of
  the reference kernel ``src/smooth_whit.cpp:20-64`` (itself from the ptw
  package), weights all 1. The recursion is carried along the time axis and
  vectorized across series rows (``data`` arrays of shape (nrows,) per step).
* :func:`sgolay_coef` / :func:`sgolay` — Savitzky-Golay filter, default
  order 3 / length 5; coefficient matrix built from the Moore-Penrose
  pseudo-inverse of the local Vandermonde system exactly like the reference
  (``R/api_signal.R:49-79``); edge rows use the one-sided filters, interior
  uses the central row (``src/smooth_sgp.cpp:37-75``).
"""

from __future__ import annotations

import numpy as np


def whittaker(m: np.ndarray, lam: float = 0.5) -> np.ndarray:
    """Row-wise Whittaker smoothing; exact recursion of ``src/smooth_whit.cpp``."""
    x = np.atleast_2d(np.asarray(m, dtype=np.float64))
    nrows, n = x.shape
    if n < 4:
        return x.copy()
    lam = float(lam)
    mm = n - 1

    d = np.empty((n, nrows))
    c = np.empty((n, nrows))
    e = np.empty((n, nrows))
    z = np.empty((n, nrows))
    xt = x.T  # (time, rows)

    d[0] = 1.0 + lam
    c[0] = -2.0 * lam / d[0]
    e[0] = lam / d[0]
    z[0] = xt[0]
    d[1] = 1.0 + 5.0 * lam - d[0] * c[0] * c[0]
    c[1] = (-4.0 * lam - d[0] * c[0] * e[0]) / d[1]
    e[1] = lam / d[1]
    z[1] = xt[1] - c[0] * z[0]

    for i in range(2, mm - 1):
        i1, i2 = i - 1, i - 2
        d[i] = 1.0 + 6.0 * lam - c[i1] * c[i1] * d[i1] - e[i2] * e[i2] * d[i2]
        c[i] = (-4.0 * lam - d[i1] * c[i1] * e[i1]) / d[i]
        e[i] = lam / d[i]
        z[i] = xt[i] - c[i1] * z[i1] - e[i2] * z[i2]

    i1, i2 = mm - 2, mm - 3
    d[mm - 1] = 1.0 + 5.0 * lam - c[i1] * c[i1] * d[i1] - e[i2] * e[i2] * d[i2]
    c[mm - 1] = (-2.0 * lam - d[i1] * c[i1] * e[i1]) / d[mm - 1]
    z[mm - 1] = xt[mm - 1] - c[i1] * z[i1] - e[i2] * z[i2]
    i1, i2 = mm - 1, mm - 2
    d[mm] = 1.0 + lam - c[i1] * c[i1] * d[i1] - e[i2] * e[i2] * d[i2]
    z[mm] = (xt[mm] - c[i1] * z[i1] - e[i2] * z[i2]) / d[mm]
    z[mm - 1] = z[mm - 1] / d[mm - 1] - c[mm - 1] * z[mm]
    for i in range(mm - 2, -1, -1):
        z[i] = z[i] / d[i] - c[i] * z[i + 1] - e[i] * z[i + 2]
    return z.T.copy()


def sgolay_coef(order: int = 3, length: int = 5) -> np.ndarray:
    """(length x length) S-G filter bank: row r evaluates the fit at offset r
    within the window (``R/api_signal.R:49-79``)."""
    p, n = int(order), int(length)
    if n % 2 != 1:
        raise ValueError("length must be odd")
    if p >= n:
        raise ValueError("order must be < length")
    k = n // 2
    f = np.zeros((n, n))
    for row in range(k + 1):
        xx = np.arange(1, n + 1, dtype=np.float64) - (row + 1)
        cmat = xx[:, None] ** np.arange(p + 1)[None, :]
        pinv = np.linalg.pinv(cmat)
        f[row] = pinv[0]
    # right-edge filters mirror the left-edge ones
    f[k + 1 : n] = f[k - 1 :: -1, ::-1]
    return f


def sgolay(m: np.ndarray, order: int = 3, length: int = 5, f: np.ndarray | None = None) -> np.ndarray:
    """Row-wise S-G smoothing; edge rows use one-sided filters
    (``src/smooth_sgp.cpp:37-75``). ``f`` lets callers precompute/broadcast
    the coefficient bank once (sits computes it once per filter closure,
    ``R/sits_filters.R:127-157``)."""
    x = np.atleast_2d(np.asarray(m, dtype=np.float64))
    nrows, ln = x.shape
    n = int(length)
    if ln < n:
        return x.copy()
    if f is None:
        f = sgolay_coef(order, n)
    k = n // 2
    out = np.empty_like(x)
    # Explicit left-to-right accumulation (NOT a BLAS dot): each output is
    # c0*x0 + c1*x1 + ... evaluated left-associatively, so the SQL oracle
    # (queries._sgolay_sql) reproduces the sums bit-exactly.
    mid = x[:, 0 : ln - n + 1] * f[k, 0]
    for j in range(1, n):
        mid = mid + x[:, j : ln - n + 1 + j] * f[k, j]
    out[:, k : ln - k] = mid
    for r in range(k):  # left edge rows: one-sided filters over x[:, :n]
        acc = x[:, 0] * f[r, 0]
        for j in range(1, n):
            acc = acc + x[:, j] * f[r, j]
        out[:, r] = acc
    for r in range(k + 1, n):  # right edge rows over x[:, ln-n:]
        acc = x[:, ln - n] * f[r, 0]
        for j in range(1, n):
            acc = acc + x[:, ln - n + j] * f[r, j]
        out[:, ln - n + r] = acc
    return out


def ewma(m: np.ndarray, alpha: float = 0.3) -> np.ndarray:
    """Exponential moving average along time, vectorized across series
    (rows): s_1 = x_1; s_t = alpha*x_t + (1-alpha)*s_{t-1}. The
    sits_filter-family exponential smoother (the recursive cousin of
    sits_sgolay's FIR bank, R/api_signal.R). Operand order is pinned —
    ``alpha*x + (1-alpha)*s`` with ``1-alpha`` precomputed — so a SQL
    recursive CTE evaluating the same literal expression is bit-exact."""
    out = np.empty_like(m, dtype=np.float64)
    beta = 1.0 - alpha
    s = m[:, 0].astype(np.float64).copy()
    out[:, 0] = s
    for t in range(1, m.shape[1]):
        s = alpha * m[:, t] + beta * s
        out[:, t] = s
    return out


def cusum(m: np.ndarray, k: float = 1.0, ref: str = "first"):
    """Two-sided CUSUM drift detector along time, vectorized across series
    (rows): reference = each series' first value (``ref='first'``) or its
    NEAREST-RANK median (``ref='median'``, == SQL quantile_disc — a pure
    selection, so cross-engine exact); slack ``k``;
    ``hi_t = max((hi_{t-1} + (x_t - ref)) - k, 0)`` and
    ``lo_t = max((lo_{t-1} + (ref - x_t)) - k, 0)`` with hi_1 = lo_1 = 0.
    The change-detection recursion of Page (1954), the streaming cousin of
    bayts' sequential chain. Operand order is pinned exactly as written —
    a SQL recursive CTE evaluating the same literal expressions is
    bit-exact (the ewma/bayts walk trick). Returns (hi, lo) matrices."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    hi = np.zeros_like(m)
    lo = np.zeros_like(m)
    if ref == "median":
        idx = max(0, int(np.ceil(0.5 * m.shape[1])) - 1)
        ref = np.sort(m, axis=1)[:, idx].copy()
    else:
        ref = m[:, 0].copy()
    sh = np.zeros(m.shape[0])
    sl = np.zeros(m.shape[0])
    for t in range(1, m.shape[1]):
        sh = np.maximum((sh + (m[:, t] - ref)) - k, 0.0)
        sl = np.maximum((sl + (ref - m[:, t])) - k, 0.0)
        hi[:, t] = sh
        lo[:, t] = sl
    return hi, lo


def mann_kendall(m: np.ndarray):
    """Mann-Kendall trend statistic S and Theil-Sen slope per series
    (rows), over a REGULAR grid (slope denominators are integer position
    gaps). S = sum over pairs i<j of sign(x_j - x_i) — pure integer,
    cross-engine exact. The Theil-Sen slope is the NEAREST-RANK median
    (== DuckDB quantile_disc / median-on-doubles: the lower-middle
    selection) of the pairwise slopes (x_j - x_i) / (j - i) — a selection
    over identically-computed divisions, bit-exact. Vectorized: one
    triu_indices pair grid shared by every series of the length group."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    r, T = m.shape
    if T < 2:
        return np.zeros(r, dtype=np.int64), np.full(r, np.nan)
    iu, ju = np.triu_indices(T, 1)
    dv = m[:, ju] - m[:, iu]
    s = np.sign(dv).sum(axis=1).astype(np.int64)
    slopes = dv / (ju - iu).astype(np.float64)
    srt = np.sort(slopes, axis=1)
    k = max(0, int(np.ceil(0.5 * srt.shape[1])) - 1)
    return s, srt[:, k]


def holt(m: np.ndarray, alpha: float = 0.3, beta: float = 0.1) -> np.ndarray:
    """Holt double-exponential (level + trend) smoothing along time,
    vectorized across series (rows) — the trend-aware member of the
    sits_filter recursive family (ewma's two-state extension):
    ``s_1 = x_1``; ``b_1 = x_2 - x_1`` (0 for singleton series);
    ``s_t = alpha*x_t + (1-alpha)*(s_{t-1} + b_{t-1})``;
    ``b_t = beta*(s_t - s_{t-1}) + (1-beta)*b_{t-1}``.
    Operand order is pinned exactly as written (literal a*x + (1-a)*(s+b)
    and beta*(s'-s) + (1-beta)*b), so a SQL recursive CTE carrying (s, b)
    and evaluating the same literal expressions is bit-exact. Returns the
    level matrix."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    out = np.empty_like(m)
    a, oma = alpha, 1.0 - alpha
    g, omg = beta, 1.0 - beta
    s = m[:, 0].copy()
    b = (m[:, 1] - m[:, 0]) if m.shape[1] > 1 else np.zeros(m.shape[0])
    out[:, 0] = s
    for t in range(1, m.shape[1]):
        s_new = a * m[:, t] + oma * (s + b)
        b = g * (s_new - s) + omg * b
        s = s_new
        out[:, t] = s
    return out


def hampel(m: np.ndarray, h: int = 2, k: float = 3.0 * 1.4826):
    """Hampel rolling-median despiking filter along time, vectorized across
    series (rows) — the robust (selection-based) member of the sits_filter
    family (the outlier-removal companion of sits_whittaker / sits_sgolay,
    R/api_signal.R; Pearson et al. 2016). For each interior position t
    (full window of ``2h+1`` points available): ``med`` = NEAREST-RANK
    median of the window (odd window -> the exact sorted middle, == DuckDB
    ``quantile_disc`` — a pure selection, cross-engine exact); ``mad`` =
    nearest-rank median of ``|x_j - med|`` (single subtract + abs per
    element, then a selection — exact); the point is a spike iff
    ``|x_t - med| > k * mad`` (one multiply each side of an exact
    comparison). Spikes are REPLACED by the window median; edge positions
    (< h from either end) and series shorter than the window pass through
    unflagged. Returns ``(filtered, flags)`` float64 matrices (flags 0/1).
    """
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    filt = m.copy()
    flags = np.zeros_like(m)
    w = 2 * h + 1
    T = m.shape[1]
    if T < w:
        return filt, flags
    win = np.lib.stride_tricks.sliding_window_view(m, w, axis=1)
    med = np.sort(win, axis=2)[:, :, h]
    mad = np.sort(np.abs(win - med[:, :, None]), axis=2)[:, :, h]
    centers = m[:, h:T - h]
    spike = np.abs(centers - med) > k * mad
    filt[:, h:T - h] = np.where(spike, med, centers)
    flags[:, h:T - h] = spike.astype(np.float64)
    return filt, flags


def holt_winters(m: np.ndarray, period: int = 7, alpha: float = 0.3,
                 beta: float = 0.1, gamma: float = 0.2) -> np.ndarray:
    """Holt-Winters additive triple-exponential smoothing (level + trend +
    seasonal, Winters 1960) along time, vectorized across series (rows) —
    the seasonal member completing the recursive sits_filter family
    (ewma -> holt -> holt_winters). Online-init variant: ``s_1 = x_1``,
    ``b_1 = 0``, seasonal state all-zero (seasonality is learned by the
    recursion itself — no separate warm-up pass, which keeps the walk a
    single recursion replayable in SQL). For t >= 2 with ``j = (t-1) mod
    period`` (0-based):
    ``s_t = alpha*(x_t - seas_j) + (1-alpha)*(s + b)``;
    ``b_t = beta*(s_t - s) + (1-beta)*b``;
    ``seas_j' = gamma*(x_t - s_t) + (1-gamma)*seas_j``;
    emitted value = ``s_t + seas_j'``. Operand order is pinned exactly as
    written (the ewma/holt discipline), so a SQL recursive CTE carrying
    (s, b, seas DOUBLE[period]) and evaluating the same literal
    expressions is bit-exact. Returns the fitted (level+seasonal) matrix."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    r, T = m.shape
    out = np.empty_like(m)
    a, oma = alpha, 1.0 - alpha
    g, omg = beta, 1.0 - beta
    c, omc = gamma, 1.0 - gamma
    s = m[:, 0].copy()
    b = np.zeros(r)
    seas = np.zeros((r, period))
    out[:, 0] = s + seas[:, 0]
    for t in range(1, T):
        j = t % period
        sj = seas[:, j]
        s_new = a * (m[:, t] - sj) + oma * (s + b)
        b = g * (s_new - s) + omg * b
        sj_new = c * (m[:, t] - s_new) + omc * sj
        seas[:, j] = sj_new
        s = s_new
        out[:, t] = s + sj_new
    return out


def goertzel_power(m: np.ndarray, period: float = 7.0) -> np.ndarray:
    """Goertzel single-bin spectral power (Goertzel 1958) at frequency
    ``1/period`` cycles per sample, per series (rows) — the O(n) one-bin
    DFT used to score periodicity strength (e.g. weekly seasonality of a
    daily series) without an FFT. Two-state linear recursion with
    ``coeff = 2*cos(2*pi/period)`` (computed ONCE on the driver via libm
    and shared with the SQL twin as a literal — no per-element
    trigonometry): ``s_t = (x_t + coeff*s1) - s2`` with the operand order
    pinned exactly as written; final power =
    ``(s1*s1 + s2*s2) - coeff*(s1*s2)``. A SQL recursive CTE carrying
    (s1, s2) and evaluating the same literal expressions is bit-exact.
    Returns the power vector (one value per series)."""
    import math

    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    r, T = m.shape
    coeff = 2.0 * math.cos(2.0 * math.pi / float(period))
    s1 = np.zeros(r)
    s2 = np.zeros(r)
    for t in range(T):
        s_new = (m[:, t] + coeff * s1) - s2
        s2 = s1
        s1 = s_new
    return (s1 * s1 + s2 * s2) - coeff * (s1 * s2)


def croston(m: np.ndarray, alpha: float = 0.2):
    """Croston's method for intermittent demand (Croston 1972), vectorized
    across series (rows): two exponential smoothers run ONLY on nonzero
    demands — ``z`` over the demand sizes and ``p`` over the inter-demand
    intervals — with the forecast ``z / p``. The estimator of record for
    sparse count series (a per-day tool-usage series is mostly zeros,
    where plain ewma/Holt systematically lag).

    Walk (t is 0-based; states start z = p = q = 0, started = false):
    first nonzero demand at position t: ``z = y_t``, ``p = t + 1``;
    later nonzero demands: ``z' = alpha*y + (1-alpha)*z``,
    ``p' = alpha*q + (1-alpha)*p`` with ``q`` = periods since the last
    demand; ``q`` resets to 1 on demand, else increments. Operand order
    is pinned exactly as written so a recursive-CTE twin carrying
    (z, p, q, started) is bit-exact; masked lanes select the literal
    expression via np.where (selected lanes compute exactly the scalar
    walk).

    Returns (z, p, n_demand): final size/interval estimates and the
    nonzero-demand count per series (0 where the series never demands —
    the caller drops those rows; z/p is undefined there)."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    rows, T = m.shape
    a, oma = alpha, 1.0 - alpha
    z = np.zeros(rows)
    p = np.zeros(rows)
    q = np.zeros(rows)
    started = np.zeros(rows, dtype=bool)
    nd = np.zeros(rows, dtype=np.int64)
    for t in range(T):
        y = m[:, t]
        pos = y > 0.0
        upd = started & pos
        z = np.where(upd, a * y + oma * z, z)
        p = np.where(upd, a * q + oma * p, p)
        st = ~started & pos
        z = np.where(st, y, z)
        p = np.where(st, float(t + 1), p)
        started |= pos
        q = np.where(pos, 1.0, q + 1.0)
        nd += pos
    return z, p, nd


def pacf_durbin_levinson(r: np.ndarray) -> np.ndarray:
    """Partial autocorrelations phi_kk from autocorrelations r_1..r_K via
    the Durbin-Levinson recursion (Box & Jenkins), vectorized over rows
    (series). Float contract: every inner product over j accumulates
    LEFT-TO-RIGHT from 0.0 (``acc = (..(0 + t_1) + t_2)..``) and the
    step is ``a = (r_{k+1} - acc_num) / (1 - acc_den)`` — the exact tree
    the recursive-CTE SQL twin replays with ``list_reduce(list_prepend(
    0.0e0, ...))`` folds. NaN rows propagate untouched.

    r: (m, K) matrix; returns (m, K) with column k-1 = phi_kk at lag k.
    """
    r = np.asarray(r, dtype=np.float64)
    m, K = r.shape
    pacf = np.empty((m, K))
    phi = np.zeros((m, K))
    phi[:, 0] = r[:, 0]
    pacf[:, 0] = r[:, 0]
    for k in range(1, K):            # extending order k -> k+1 (1-based)
        acc_num = np.zeros(m)
        acc_den = np.zeros(m)
        for j in range(k):           # 1-based j+1 = 1..k, in order
            acc_num = acc_num + phi[:, j] * r[:, k - 1 - j]
            acc_den = acc_den + phi[:, j] * r[:, j]
        with np.errstate(divide="ignore", invalid="ignore"):
            a = (r[:, k] - acc_num) / (1.0 - acc_den)
        new = phi.copy()
        for j in range(k):
            new[:, j] = phi[:, j] - a * phi[:, k - 1 - j]
        new[:, k] = a
        phi = new
        pacf[:, k] = a
    return pacf


def page_hinkley(m: np.ndarray, delta: float = 0.0, lam: float = 1.0):
    """Page-Hinkley mean-drift detector along time, vectorized across
    series (rows) — the running-mean cousin of :func:`cusum` (CUSUM
    tests against a FIXED reference; PH tests against the series' own
    cumulative mean, the standard streaming-drift formulation):
    ``S_t = S_{t-1} + x_t``, ``m_t = m_{t-1} + (x_t - S_t/t - delta)``,
    ``M_t = min(M_{t-1}, m_t)`` with ``m_0 = M_0 = 0``; drift alarms
    when ``m_t - M_t > lam``. Operand order pinned exactly as written —
    the SQL recursive-CTE twin evaluates the same literal expressions
    (the cusum/ewma walk trick). Returns (m, gap) matrices where
    ``gap = m_t - M_t``."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    ph = np.zeros_like(m)
    gap = np.zeros_like(m)
    S = np.zeros(m.shape[0])
    mt = np.zeros(m.shape[0])
    Mt = np.zeros(m.shape[0])
    for t in range(m.shape[1]):
        S = S + m[:, t]
        mt = mt + (m[:, t] - S / np.float64(t + 1) - delta)
        Mt = np.minimum(Mt, mt)
        ph[:, t] = mt
        gap[:, t] = mt - Mt
    return ph, gap
