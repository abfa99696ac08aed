"""Bayesian post-processing kernels — 1-D (time axis) analogs of the
reference's spatial-neighborhood operators.

* :func:`bayes_smooth` — variance-weighted Bayesian shrinkage of logits
  over a centered rolling window: ``w*x0 + (1-w)*m0`` with
  ``w = s2/(s2 + smoothness)``, neighbors restricted to the top
  ``neigh_fraction`` by value (reference ``sits_smooth``
  ``R/sits_smooth.R:117-205`` defaults window 9(x9)/fraction 0.5/
  smoothness per band; kernel ``src/smooth_bayes.cpp:20-78``).
* :func:`bayts_change` — sequential Bayesian change-probability chain
  along time (reference bayts, ``src/bayts_fns.cpp``): carry
  P(change | obs_1..t) forward, flag when it exceeds ``chi`` and stays
  above for ``consecutive`` steps. State never crosses a series boundary
  (SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np


def bayes_smooth(
    x: np.ndarray,
    window: int = 9,
    neigh_fraction: float = 0.5,
    smoothness: float = 20.0,
) -> np.ndarray:
    """Rolling Bayesian shrinkage per series row (series x time)."""
    m = np.atleast_2d(np.asarray(x, dtype=np.float64))
    leg = window // 2
    pad = np.pad(m, ((0, 0), (leg, leg)), mode="symmetric")
    win = np.lib.stride_tricks.sliding_window_view(pad, window, axis=1)
    # top neigh_fraction neighbors by value (reference keeps the highest
    # half before computing the local statistics)
    k = max(1, int(round(window * neigh_fraction)))
    top = np.sort(win, axis=2)[:, :, -k:]
    m0 = top.mean(axis=2)
    s2 = top.var(axis=2, ddof=1) if k > 1 else np.zeros_like(m0)
    w = s2 / (s2 + smoothness)
    return w * m + (1.0 - w) * m0


def bayts_change(
    p_change_obs: np.ndarray,
    prior: float = 0.5,
    chi: float = 0.9,
    consecutive: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential Bayesian change chain for one series.

    ``p_change_obs[t]`` = P(change | observation at t) from a sensor model.
    Returns (posterior trajectory, first confirmed change index or -1).
    The posterior is updated with Bayes rule each step
    (``P = P_t*P_{t-1} / (P_t*P_{t-1} + (1-P_t)*(1-P_{t-1}))``, the bayts
    iterative form); a run of ``consecutive`` posteriors above ``chi``
    confirms the change.
    """
    p = np.asarray(p_change_obs, dtype=np.float64)
    post = np.empty_like(p)
    prev = prior
    run = 0
    flagged = -1
    for t in range(p.size):
        pt = p[t]
        num = pt * prev
        den = num + (1.0 - pt) * (1.0 - prev)
        cur = num / den if den > 0 else prev
        post[t] = cur
        if cur >= chi:
            run += 1
            if run >= consecutive and flagged < 0:
                flagged = t - consecutive + 1
        else:
            run = 0
        # the carried prior is floored/capped so the chain stays responsive
        # after long stable runs (the reference bayts bounds its carried
        # forest probability the same way)
        prev = min(max(cur, 0.1), 0.9)
    return post, flagged


def align_dates_circular(values: np.ndarray, shift: int) -> np.ndarray:
    """Circular shift of a series so its calendar aligns to a reference
    year (reference ``.tibble_align_dates``, ``R/api_tibble.R:176-224``)."""
    v = np.asarray(values)
    if v.size == 0:
        return v.copy()
    return np.roll(v, -int(shift) % v.size)


def bayts_change_matrix(
    p_change_obs: np.ndarray,
    prior: float = 0.5,
    chi: float = 0.9,
    consecutive: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-across-series twin of :func:`bayts_change`: one time loop,
    elementwise updates over all k series of a (k x T) matrix at once
    (identical float sequence per series; pinned vs the scalar twin in
    tests/test_similarity_bayes.py)."""
    p = np.atleast_2d(np.asarray(p_change_obs, dtype=np.float64))
    k, T = p.shape
    post = np.empty_like(p)
    prev = np.full(k, float(prior))
    run = np.zeros(k, dtype=np.int64)
    flagged = np.full(k, -1, dtype=np.int64)
    for t in range(T):
        pt = p[:, t]
        num = pt * prev
        den = num + (1.0 - pt) * (1.0 - prev)
        cur = np.where(den > 0, num / np.where(den > 0, den, 1.0), prev)
        post[:, t] = cur
        run = np.where(cur >= chi, run + 1, 0)
        newly = (run >= consecutive) & (flagged < 0)
        flagged[newly] = t - consecutive + 1
        prev = np.minimum(np.maximum(cur, 0.1), 0.9)
    return post, flagged


def bayts_posterior_medmad(
    m: np.ndarray,
    prior: float = 0.5,
    chi: float = 0.9,
    consecutive: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Full bayts pipeline over a (series x time) matrix with the
    median/MAD arithmetic sensor model:
    ``p_obs = clip(0.5 + (x - med) / (4*(mad + 1e-9)), 0.01, 0.99)`` with
    NEAREST-RANK lower medians (selection-only -> bit-exact cross-engine;
    the SQL twin lives in queries._bayts_sql). Returns (post, flagged)."""
    from sits_ray.kernels.reduce import lower_median

    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    with np.errstate(all="ignore"):
        med = lower_median(m)
        mad = lower_median(np.abs(m - med[:, None]))
        p_obs = np.clip(
            0.5 + (m - med[:, None]) / (4.0 * (mad[:, None] + 1e-9)), 0.01, 0.99
        )
    return bayts_change_matrix(
        np.nan_to_num(p_obs, nan=0.5), prior=prior, chi=chi, consecutive=consecutive
    )
