"""Cox-Stuart and Pettitt calendar trend/change tests (stages/drift):
hand statistics on constructed calendars."""

import math

import numpy as np
import pandas as pd


def _mk(counts):
    import ray.data as rd

    us = []
    for d, c in enumerate(counts):
        us.extend([d * 86400_000_000 + i for i in range(int(c))])
    return rd.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(np.asarray(us, np.int64), unit="us")}))


def test_cox_stuart_hand(ray_session):
    from sits_ray.stages.drift import cox_stuart_daily

    # y = [1, 2, 3, 9, 1, 4] (n=6, h=3): pairs (1,9)+, (2,1)-, (3,4)+
    out = cox_stuart_daily(_mk([1, 2, 3, 9, 1, 4]))
    r = out.iloc[0]
    assert (int(r.n_pairs), int(r.n_up), int(r.n_down)) == (3, 2, 1)
    assert float(r.z) == (2 * 2 - 3) / math.sqrt(3.0)


def test_cox_stuart_odd_middle_dropped_and_ties(ray_session):
    from sits_ray.stages.drift import cox_stuart_daily

    # n=5, h=2: pairs (1 vs 4th day) etc.; middle day index 2 unused;
    # a tie pair drops from m
    out = cox_stuart_daily(_mk([5, 3, 7, 5, 9]))
    r = out.iloc[0]
    # pairs: (5, 5) tie, (3, 9) up -> m=1, up=1
    assert (int(r.n_pairs), int(r.n_up), int(r.n_down)) == (1, 1, 0)


def test_pettitt_planted_shift(ray_session):
    from sits_ray.stages.drift import pettitt_daily

    # low regime days 0-4 (counts ~3), high regime days 5-9 (~30)
    out = pettitt_daily(_mk([3, 4, 3, 5, 3, 30, 31, 30, 32, 30]))
    r = out.iloc[0]
    assert int(r.break_day) == 4        # split after the last low day
    assert int(r.k_stat) == 25          # 5*5 discordant pairs, all -1
    assert float(r.k_norm) == 1.0
    assert int(r.u_stat) == -25         # early < late


def test_pettitt_flat_zero(ray_session):
    from sits_ray.stages.drift import pettitt_daily

    out = pettitt_daily(_mk([7] * 8))
    r = out.iloc[0]
    assert int(r.k_stat) == 0
    assert int(r.break_day) == 0        # tie -> earliest day
