"""Gumbel weekly-maxima fit (drift.gumbel_weekly_maxima): hand moments
and method-of-moments identities."""

import math

import numpy as np
import pandas as pd


def _mk(day_counts):
    import ray.data as rd

    us = []
    for d, c in day_counts:
        us.extend([d * 86400_000_000 + i for i in range(c)])
    return rd.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(np.asarray(us, np.int64), unit="us")}))


def test_hand_weekly_maxima(ray_session):
    from sits_ray.stages.drift import gumbel_weekly_maxima

    # week 0 (days 0-6): max 9 ; week 1 (days 7-13): max 5 ;
    # week 2: max 7
    days = [(0, 3), (1, 9), (6, 2), (7, 5), (8, 1), (14, 7)]
    out = gumbel_weekly_maxima(_mk(days))
    r = out.iloc[0]
    assert (int(r.n_weeks), int(r.max_weekly)) == (3, 9)
    m = np.array([9, 5, 7], dtype=np.float64)
    assert float(r.mean_weekly) == 7.0
    var = float(3 * (81 + 25 + 49) - 21 * 21) / float(3 * 2)
    assert float(r.var_weekly) == var
    beta = math.sqrt(6.0 * var) / 3.141592653589793
    assert float(r.beta) == beta
    assert float(r.mu) == 7.0 - 0.5772156649015329 * beta


def test_moment_identities(ray_session):
    from sits_ray.stages.drift import gumbel_weekly_maxima

    rng = np.random.default_rng(9)
    days = [(d, int(10 + rng.integers(0, 50))) for d in range(35)]
    out = gumbel_weekly_maxima(_mk(days))
    r = out.iloc[0]
    assert int(r.n_weeks) == 5
    # Gumbel MoM identities hold exactly by construction
    assert float(r.beta) == math.sqrt(
        6.0 * float(r.var_weekly)) / 3.141592653589793
    assert float(r.mu) < float(r.mean_weekly)
