"""Generalized ESD (stages/outlier.esd_daily_volume): hand-replayed
removal order, masking resistance, r_stat float tree."""

import math

import numpy as np
import pandas as pd


def _mk(day_counts):
    import ray.data as rd

    days, counts = zip(*day_counts)
    us = []
    for d, c in zip(days, counts):
        us.extend([d * 86400_000_000 + i for i in range(c)])
    return rd.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(np.asarray(us, np.int64), unit="us")}))


def test_two_spikes_unmasked(ray_session):
    from sits_ray.stages.outlier import esd_daily_volume

    # two spikes (100, 90) over a flat background of 10s: round 1
    # removes day 5 (100), round 2 removes day 7 (90) — a one-shot
    # z-score with both spikes in the mean could miss the second
    base = [(d, 10) for d in range(5)] + [(5, 100), (6, 10), (7, 90)]
    out = esd_daily_volume(_mk(base), rounds=3)
    assert out.day_removed.tolist()[:2] == [5, 7]
    assert out.n_before.tolist() == [8, 7, 6]


def test_hand_round1_stats(ray_session):
    from sits_ray.stages.outlier import esd_daily_volume

    # days 0..3 counts [1, 2, 3, 10]: n=4, s=16, q=114
    # |n*y - s|: day0 12, day1 8, day2 4, day3 24 -> remove day 3
    out = esd_daily_volume(_mk([(0, 1), (1, 2), (2, 3), (3, 10)]),
                           rounds=1)
    r = out.iloc[0]
    assert (int(r.day_removed), int(r.n_before), int(r.d_num)) == (3, 4, 24)
    var = float(4 * 114 - 16 * 16) / float(4 * 3)
    assert float(r.r_stat) == (24.0 / 4.0) / math.sqrt(var)


def test_tie_breaks_day_asc(ray_session):
    from sits_ray.stages.outlier import esd_daily_volume

    # symmetric counts [1, 5, 5, 9]: |n*y-s| = 16, 0, 0, 16 ->
    # tie between day 0 and day 3 -> day 0 removed first
    out = esd_daily_volume(_mk([(0, 1), (1, 5), (2, 5), (3, 9)]),
                           rounds=1)
    assert int(out.day_removed.iloc[0]) == 0


def test_stops_below_three_days(ray_session):
    from sits_ray.stages.outlier import esd_daily_volume

    out = esd_daily_volume(_mk([(0, 1), (1, 2), (2, 3)]), rounds=5)
    assert len(out) == 1          # after one removal only 2 days remain
