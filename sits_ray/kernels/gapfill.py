"""Linear gap-fill — exact semantics of the reference kernel
``src/linear_interp.cpp:25-85``:

* leading NaNs  <- first valid value;
* trailing NaNs <- last valid value;
* interior NaN runs <- linear: ``first + i * (next - first) / gaps`` where
  ``gaps`` = index distance between the surrounding valid values and ``i``
  the 1-based offset into the run;
* all-NaN rows stay all-NaN.

``linear_interp`` is the vectorized (series x time) matrix version used in
the Ray stages; ``na_linear_vector_interp`` is the literal scalar twin used
as the pytest oracle.
"""

from __future__ import annotations

import numpy as np


def na_linear_vector_interp(x: np.ndarray) -> np.ndarray:
    """Scalar reference twin (oracle): one series, sequential rules."""
    x = np.asarray(x, dtype=np.float64).copy()
    n = x.size
    valid = np.flatnonzero(~np.isnan(x))
    if valid.size == 0:
        return x
    x[: valid[0]] = x[valid[0]]
    x[valid[-1] + 1 :] = x[valid[-1]]
    for a, b in zip(valid[:-1], valid[1:]):
        gaps = b - a
        if gaps > 1:
            base, target = x[a], x[b]
            for i in range(1, gaps):
                x[a + i] = base + (i * (target - base) / gaps)
    return x


def linear_interp(mtx: np.ndarray) -> np.ndarray:
    """Vectorized matrix gap-fill: one row per series, one column per step."""
    m = np.atleast_2d(np.asarray(mtx, dtype=np.float64)).copy()
    nrows, ncols = m.shape
    isnan = np.isnan(m)
    if not isnan.any():
        return m
    col = np.arange(ncols)

    # index of previous valid column (or -1), per cell
    prev = np.where(isnan, -1, col[None, :])
    prev = np.maximum.accumulate(prev, axis=1)
    # index of next valid column (or ncols), per cell
    nxt = np.where(isnan, ncols, col[None, :])
    nxt = np.minimum.accumulate(nxt[:, ::-1], axis=1)[:, ::-1]

    rows = np.arange(nrows)[:, None]
    has_prev = prev >= 0
    has_next = nxt < ncols

    first_val = np.where(has_prev, m[rows, np.clip(prev, 0, ncols - 1)], np.nan)
    next_val = np.where(has_next, m[rows, np.clip(nxt, 0, ncols - 1)], np.nan)

    out = m.copy()
    # interior: first + i * (next - first) / gaps  (exact formula order)
    interior = isnan & has_prev & has_next
    gaps = (nxt - prev).astype(np.float64)
    i_off = (col[None, :] - prev).astype(np.float64)
    with np.errstate(invalid="ignore"):
        interp = first_val + (i_off * (next_val - first_val) / gaps)
    out[interior] = interp[interior]
    # leading run <- first valid; trailing run <- last valid
    lead = isnan & ~has_prev & has_next
    out[lead] = next_val[lead]
    trail = isnan & has_prev & ~has_next
    out[trail] = first_val[trail]
    return out


def mask_na(mtx: np.ndarray) -> np.ndarray:
    """Row-has-NaN mask (reference ``src/linear_interp.cpp:92-99``)."""
    return np.isnan(np.atleast_2d(mtx)).any(axis=1)


def fill_na(mtx: np.ndarray, fill: float) -> np.ndarray:
    """Fill whole NaN-containing rows with a constant
    (reference ``src/linear_interp.cpp:101-113``)."""
    m = np.atleast_2d(np.asarray(mtx, dtype=np.float64)).copy()
    m[mask_na(m)] = fill
    return m
