"""Temporal reducers ``t_*`` — collapse the time axis of a (series x time)
matrix to one value per series. Semantics mirror the reference kernels in
``src/reduce_fns.cpp:12-92`` (armadillo row-wise stats) driven by
``sits_reduce`` (``R/sits_reduce.R:96-203``).

Conventions pinned for cross-engine parity (SURVEY.md §7.5):

* ``t_std`` is the sample standard deviation (ddof=1), matching armadillo
  ``stddev(...,0,...)`` and SQL ``stddev``;
* ``t_median`` interpolates the two middle elements for even n (armadillo
  median == numpy median == SQL ``quantile_cont(0.5)``);
* ``t_fqr``/``t_tqr`` use linear interpolation (numpy default, == SQL
  ``quantile_cont``);
* ``p95`` / ``t_p95`` uses the NEAREST-RANK definition: element at index
  ``ceil(q * n) - 1`` of the sorted array, matching SQL ``quantile_disc``.
"""

from __future__ import annotations

import numpy as np


def t_max(m):
    return np.max(m, axis=1)


def t_min(m):
    return np.min(m, axis=1)


def t_mean(m):
    return np.mean(m, axis=1)


def t_median(m):
    return np.median(m, axis=1)


def t_sum(m):
    return np.sum(m, axis=1)


def t_std(m):
    return np.std(m, axis=1, ddof=1)


def t_skew(m):
    """Adjusted Fisher-Pearson skewness (reference ``src/reduce_fns.cpp:37-49``).

    Standard form g1 * sqrt(n(n-1))/(n-2) with g1 = m3/m2^1.5. (The
    reference's C++ expression has an operator-precedence quirk in its
    adjustment factor; we implement the textbook formula it documents.)
    """
    m = np.asarray(m, dtype=np.float64)
    n = m.shape[1]
    mu = np.mean(m, axis=1, keepdims=True)
    m3 = np.mean((m - mu) ** 3, axis=1)
    m2 = np.mean((m - mu) ** 2, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        g1 = m3 / m2**1.5
    return g1 * (np.sqrt(n * (n - 1.0)) / (n - 2.0))


def t_kurt(m):
    """Pearson kurtosis n*m4/m2^2 (normal -> 3.0), reference ``src/reduce_fns.cpp:52-60``."""
    m = np.asarray(m, dtype=np.float64)
    n = m.shape[1]
    mu = np.mean(m, axis=1, keepdims=True)
    m4 = np.sum((m - mu) ** 4, axis=1)
    m2 = np.sum((m - mu) ** 2, axis=1) ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        return n * m4 / m2


def t_amplitude(m):
    return np.max(m, axis=1) - np.min(m, axis=1)


def t_fslope(m):
    """Max absolute first difference (reference ``src/reduce_fns.cpp:68-70``)."""
    return np.max(np.abs(np.diff(m, axis=1)), axis=1)


def t_mse(m):
    """Mean spectral energy |FFT|^2 (reference ``src/reduce_fns.cpp:73-76``)."""
    return np.mean(np.abs(np.fft.fft(m, axis=1)) ** 2, axis=1)


def t_fqr(m):
    return np.quantile(m, 0.25, axis=1)


def t_tqr(m):
    return np.quantile(m, 0.75, axis=1)


def t_iqr(m):
    return t_tqr(m) - t_fqr(m)


def nearest_rank(values: np.ndarray, q: float) -> float:
    """Nearest-rank quantile of a 1-D array == SQL ``quantile_disc``:
    sorted[ceil(q*n) - 1]."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = v.size
    if n == 0:
        return float("nan")
    k = int(np.ceil(q * n)) - 1
    return float(v[max(0, min(k, n - 1))])


def t_p95(m):
    m = np.asarray(m, dtype=np.float64)
    n = m.shape[1]
    k = max(0, min(int(np.ceil(0.95 * n)) - 1, n - 1))
    return np.sort(m, axis=1)[:, k]


TEMPORAL_REDUCERS = {
    "t_max": t_max,
    "t_min": t_min,
    "t_mean": t_mean,
    "t_median": t_median,
    "t_sum": t_sum,
    "t_std": t_std,
    "t_skew": t_skew,
    "t_kurt": t_kurt,
    "t_amplitude": t_amplitude,
    "t_fslope": t_fslope,
    "t_mse": t_mse,
    "t_fqr": t_fqr,
    "t_tqr": t_tqr,
    "t_iqr": t_iqr,
    "t_p95": t_p95,
}


def lower_median(m: np.ndarray) -> np.ndarray:
    """NaN-aware NEAREST-RANK lower median per row:
    ``sorted_finite[ceil(0.5*n_finite)-1]`` (== SQL ``quantile_disc(x,0.5)``
    over non-NULL values — selection-only, so bit-exact cross-engine).
    Rows with no finite value return NaN."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    s = np.sort(m, axis=1)  # NaNs sort last
    n_fin = np.sum(~np.isnan(m), axis=1)
    idx = np.maximum(np.ceil(0.5 * n_fin).astype(np.int64) - 1, 0)
    out = s[np.arange(m.shape[0]), idx]
    return np.where(n_fin > 0, out, np.nan)
