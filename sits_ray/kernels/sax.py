"""SAX — Symbolic Aggregate approXimation (Lin, Keogh et al., DMKD 2007).

The symbolic member of the downsampling family (LTTB selects points, M4
selects extremes, SAX compresses a series into a short word over a small
alphabet): z-normalize, Piecewise Aggregate Approximation into ``w``
segments, then quantize each segment mean through Gaussian-quantile
breakpoints. The reference's temporal-pattern operators (sits_patterns /
DTW matching) consume exactly this kind of reduced representation.

Cross-engine float contract (the repo's sequential-fold discipline):
* series mean  = LEFT FOLD of the values in time order, starting at 0.0,
  divided once by n (SQL twin: ``list_reduce(list_prepend(0.0, xs), +)``);
* sum of squared deviations = left fold of ``(x - mu) * (x - mu)`` in time
  order (same literal ops both sides);
* z value      = ``(x - mu) / sqrt(ss / n)`` — sqrt is IEEE
  correctly-rounded, identical cross-engine; all-constant series (ss == 0)
  define z = 0;
* PAA segment j (0-based, ``n >= w``) covers positions
  ``[floor(j*n/w), floor((j+1)*n/w))`` — integer boundaries, never empty —
  and its value is the left fold of the segment's z values divided once by
  the segment length;
* symbol index = number of breakpoints strictly below the PAA value, with
  the breakpoints emitted as shared literals (stdlib ``NormalDist`` —
  computed once driver-side, no per-element special functions).
Every step is either integer, a selection, or a pinned-order float op, so
the DuckDB twin replays it bit-exactly.
"""

from __future__ import annotations

from statistics import NormalDist

import numpy as np


def sax_breakpoints(alphabet: int = 4) -> np.ndarray:
    """Gaussian-quantile breakpoints for ``alphabet`` symbols (a-1 cuts)."""
    nd = NormalDist()
    return np.array(
        [nd.inv_cdf((k + 1) / alphabet) for k in range(alphabet - 1)],
        dtype=np.float64,
    )


def _seq_fold(m: np.ndarray) -> np.ndarray:
    """Left-fold sum along time (columns), starting at 0.0 — one vector op
    per step, the exact order ``list_reduce(list_prepend(0.0, xs), +)``
    replays."""
    acc = np.zeros(m.shape[0], dtype=np.float64)
    for t in range(m.shape[1]):
        acc = acc + m[:, t]
    return acc


def sax_transform(m: np.ndarray, w: int = 8, alphabet: int = 4):
    """SAX over a (series x time) matrix with ``T >= w``: returns
    ``(paa, sym)`` — PAA z-means (r, w) float64 and symbol indices (r, w)
    int64 (0 = lowest band)."""
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    r, T = m.shape
    if T < w:
        raise ValueError(f"series length {T} < word length {w}")
    n = float(T)
    mu = _seq_fold(m) / n
    dev = m - mu[:, None]
    ss = _seq_fold(dev * dev)
    std = np.sqrt(ss / n)
    safe = np.where(std == 0.0, 1.0, std)
    z = np.where(std[:, None] == 0.0, 0.0, dev / safe[:, None])
    paa = np.empty((r, w), dtype=np.float64)
    for j in range(w):
        lo = (j * T) // w
        hi = ((j + 1) * T) // w
        paa[:, j] = _seq_fold(z[:, lo:hi]) / float(hi - lo)
    bps = sax_breakpoints(alphabet)
    sym = (paa[:, :, None] > bps[None, None, :]).sum(axis=2).astype(np.int64)
    return paa, sym
