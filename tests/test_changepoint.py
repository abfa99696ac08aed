"""Least-squares change point (stages/outlier.changepoint_daily_volume):
planted shift recovery, hand-computed gain, flat-series behavior."""

import numpy as np
import pandas as pd


def _mk(day_counts):
    import ray.data as rd

    us = []
    for d, c in day_counts:
        us.extend([d * 86400_000_000 + i for i in range(c)])
    return rd.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(np.asarray(us, np.int64), unit="us")}))


def test_planted_shift_recovered(ray_session):
    from sits_ray.stages.outlier import changepoint_daily_volume

    # days 0-4 at 10/day, days 5-9 at 50/day -> break after day 4
    out = changepoint_daily_volume(
        _mk([(d, 10) for d in range(5)] + [(d, 50) for d in range(5, 10)]))
    r = out.iloc[0]
    assert int(r.break_day) == 4
    assert (int(r.n_left), int(r.n_right)) == (5, 5)
    assert float(r.mean_left) == 10.0
    assert float(r.mean_right) == 50.0
    # gain = between-SS = 5*(10-30)^2 + 5*(50-30)^2 = 4000
    assert abs(float(r.gain) - 4000.0) < 1e-9


def test_hand_gain_asymmetric(ray_session):
    from sits_ray.stages.outlier import changepoint_daily_volume

    # counts [1, 2, 9]: best split after day 1 (left {1,2}, right {9})
    out = changepoint_daily_volume(_mk([(0, 1), (1, 2), (2, 9)]))
    r = out.iloc[0]
    assert int(r.break_day) == 1
    f = (3.0 * 3.0) / 2.0 + 81.0 / 1.0
    gain = f - (12.0 * 12.0) / 3.0
    assert abs(float(r.gain) - gain) < 1e-12


def test_flat_series_zero_gain_tie_breaks_first_day(ray_session):
    from sits_ray.stages.outlier import changepoint_daily_volume

    out = changepoint_daily_volume(_mk([(d, 7) for d in range(6)]))
    r = out.iloc[0]
    # all splits tie at gain 0 -> strict > keeps the FIRST (day asc)
    assert int(r.break_day) == 0
    assert abs(float(r.gain)) < 1e-9
