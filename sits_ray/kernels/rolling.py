"""Rolling window kernels ``w_*`` — the 1-D (time axis) analog of the
reference's Moore-neighborhood kernels (``src/kernel.cpp:62-124``, used by
``sits_apply`` kernel functions ``w_median/w_mean/w_sd/w_min/w_max/w_var/
w_modal``, ``R/sits_apply.R:155-248``).

Edge handling matches the reference's ``locus_mirror`` (``src/kernel.cpp:8-20``)
== numpy ``pad(mode="symmetric")``: the window is mirrored at both ends so
output length equals input length. ``edge="clip"`` is also offered for
SQL-window parity (SQL ``ROWS BETWEEN k PRECEDING AND k FOLLOWING`` clips).

All kernels take a (series x time) matrix and an odd ``window_size`` and
return a same-shape matrix.
"""

from __future__ import annotations

import numpy as np

from sits_ray.kernels.reduce import nearest_rank  # noqa: F401  (re-export convenience)


def _windows(m: np.ndarray, window_size: int, edge: str) -> np.ndarray:
    """Return array of shape (rows, time, window_size) of sliding windows."""
    if window_size % 2 != 1 or window_size < 1:
        raise ValueError("window_size must be odd and >= 1")
    leg = window_size // 2
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    if edge == "mirror":
        pad = np.pad(m, ((0, 0), (leg, leg)), mode="symmetric")
        return np.lib.stride_tricks.sliding_window_view(pad, window_size, axis=1)
    if edge == "clip":
        pad = np.pad(m, ((0, 0), (leg, leg)), mode="constant", constant_values=np.nan)
        return np.lib.stride_tricks.sliding_window_view(pad, window_size, axis=1)
    raise ValueError(f"edge must be 'mirror' or 'clip', got {edge!r}")


def w_mean(m, window_size=3, edge="mirror"):
    return np.nanmean(_windows(m, window_size, edge), axis=2)


def w_median(m, window_size=3, edge="mirror"):
    return np.nanmedian(_windows(m, window_size, edge), axis=2)


def w_min(m, window_size=3, edge="mirror"):
    return np.nanmin(_windows(m, window_size, edge), axis=2)


def w_max(m, window_size=3, edge="mirror"):
    return np.nanmax(_windows(m, window_size, edge), axis=2)


def w_sd(m, window_size=3, edge="mirror"):
    w = _windows(m, window_size, edge)
    n = np.sum(~np.isnan(w), axis=2)
    with np.errstate(invalid="ignore", divide="ignore"):
        mu = np.nanmean(w, axis=2, keepdims=True)
        var = np.nansum((w - mu) ** 2, axis=2) / np.maximum(n - 1, 1)
        var = np.where(n > 1, var, np.nan)
    return np.sqrt(var)


def w_var(m, window_size=3, edge="mirror"):
    return w_sd(m, window_size, edge) ** 2


def w_modal(m, window_size=3, edge="mirror"):
    """Window mode; any NaN in the window -> NaN (reference ``src/kernel.cpp:44-62``).

    Ties broken by the smallest value (std::map iteration order +
    max_element keeping the first maximum)."""
    w = _windows(m, window_size, edge)
    out = np.empty(w.shape[:2], dtype=np.float64)
    for i in range(w.shape[0]):
        for j in range(w.shape[1]):
            win = w[i, j]
            if np.isnan(win).any():
                out[i, j] = np.nan
                continue
            vals, counts = np.unique(win, return_counts=True)
            out[i, j] = vals[np.argmax(counts)]
    return out


ROLLING_KERNELS = {
    "w_mean": w_mean,
    "w_median": w_median,
    "w_min": w_min,
    "w_max": w_max,
    "w_sd": w_sd,
    "w_var": w_var,
    "w_modal": w_modal,
}
