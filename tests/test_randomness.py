"""Turning-point and Bartels RVN randomness tests (stages/drift):
hand-counted statistics on constructed calendars."""

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


def test_turning_points_hand(ray_session):
    from sits_ray.stages.drift import turning_points_daily

    # y = [1, 5, 2, 8, 3]: interior 5 (peak), 2 (trough), 8 (peak) -> 3
    out = turning_points_daily(_mk(list(enumerate([1, 5, 2, 8, 3]))))
    r = out.iloc[0]
    assert (int(r.n_days), int(r.n_turning)) == (5, 3)
    exp = 2.0 * 3 / 3.0
    var = (16 * 5 - 29) / 90.0
    assert float(r.z) == (3.0 - exp) / math.sqrt(var)


def test_turning_points_monotone_zero(ray_session):
    from sits_ray.stages.drift import turning_points_daily

    out = turning_points_daily(_mk(list(enumerate([1, 2, 3, 4, 5, 6]))))
    assert int(out.n_turning.iloc[0]) == 0
    assert float(out.z.iloc[0]) < 0


def test_turning_points_plateau_not_counted(ray_session):
    from sits_ray.stages.drift import turning_points_daily

    # strict comparisons: [1, 5, 5, 1] has no STRICT interior extremum
    out = turning_points_daily(_mk(list(enumerate([1, 5, 5, 1]))))
    assert int(out.n_turning.iloc[0]) == 0


def test_bartels_hand(ray_session):
    from sits_ray.stages.drift import bartels_rvn_daily

    # y = [10, 30, 20]: ranks [1, 3, 2] -> doubled [2, 6, 4], mean 4
    # num = (2-6)^2 + (6-4)^2 = 20 ; den = 4 + 4 + 0 = 8
    out = bartels_rvn_daily(_mk(list(enumerate([10, 30, 20]))))
    r = out.iloc[0]
    assert (int(r.rvn_num), int(r.rvn_den)) == (20, 8)
    assert float(r.rvn) == 20.0 / 8.0


def test_bartels_ties_midrank(ray_session):
    from sits_ray.stages.drift import bartels_rvn_daily

    # y = [5, 5, 9]: doubled midranks [3, 3, 6] (tie pair shares 1.5x2)
    out = bartels_rvn_daily(_mk(list(enumerate([5, 5, 9]))))
    r = out.iloc[0]
    # num = 0 + 9 = 9 ; den = (3-4)^2*2 + (6-4)^2 = 6
    assert (int(r.rvn_num), int(r.rvn_den)) == (9, 6)


def test_bartels_trend_below_two(ray_session):
    from sits_ray.stages.drift import bartels_rvn_daily

    out = bartels_rvn_daily(_mk(list(enumerate(range(10, 100, 10)))))
    assert float(out.rvn.iloc[0]) < 1.0    # strong trend -> small RVN
    assert float(out.z.iloc[0]) < 0
