"""Runs test and McNemar (stages/drift): hand-computed statistics on
tiny constructed calendars/user tables."""

import math

import numpy as np
import pandas as pd


def _mk_days(day_counts):
    import ray.data as rd

    us = []
    for d, c in day_counts:
        us.extend([d * 86400_000_000 + i for i in range(c)])
    return rd.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(np.asarray(us, np.int64), unit="us")}))


def test_runs_hand(ray_session):
    from sits_ray.stages.drift import runs_test_daily

    # counts by day: [1, 9, 1, 9, 1, 9] -> median (lower) = 1 -> the
    # three 1s drop (equal to median); above-days = three 9s -> n2 = 0
    # degenerate; use [1, 9, 2, 9, 2, 9]: sorted [1,2,2,9,9,9],
    # median = ys[2] = 2 -> drops the two 2s; seq = [1, 9, 9, 9] signs
    # [B, A, A, A] -> runs 2, n1=3, n2=1, n=4
    out = runs_test_daily(_mk_days(
        [(0, 1), (1, 9), (2, 2), (3, 9), (4, 2), (5, 9)]))
    r = out.iloc[0]
    assert (int(r.n_days), int(r.n_above), int(r.n_below),
            int(r.n_runs)) == (4, 3, 1, 2)
    two = 2 * 3 * 1
    mu = 1.0 + two / 4.0
    var = float(two * (two - 4)) / float(4 * 4 * 3)
    assert float(r.z) == (2.0 - mu) / math.sqrt(var)


def test_runs_alternating_positive_runs(ray_session):
    from sits_ray.stages.drift import runs_test_daily

    # alternating around a distinct median value: counts 1/9 with one
    # median-2 day dropped -> near-maximal runs -> z > 0
    days = [(d, 1 if d % 2 == 0 else 9) for d in range(10)] + [(10, 2)]
    out = runs_test_daily(_mk_days(days))
    assert int(out.n_runs.iloc[0]) == 10
    assert float(out.z.iloc[0]) > 0


def test_runs_one_sided_guard(ray_session):
    from sits_ray.stages.drift import runs_test_daily

    # all above-median after tie-drop -> z = 0 by the guard
    out = runs_test_daily(_mk_days(
        [(d, 1 if d % 2 == 0 else 9) for d in range(10)]))
    assert float(out.z.iloc[0]) == 0.0


def _mk_users(rows):
    import ray.data as rd

    # rows: (user, sec, type)
    u, s, t = zip(*rows)
    return rd.from_pandas(pd.DataFrame({
        "user_id": np.asarray(u, np.int64),
        "ts": pd.to_datetime(np.asarray(s, np.int64) * 1_000_000,
                             unit="us"),
        "event_type": list(t),
    }))


def test_mcnemar_hand(ray_session):
    from sits_ray.stages.drift import mcnemar_tool_halves

    # span 0..100 -> mid 50
    # user 1: click at 10 only          -> (1, 0) n10
    # user 2: click at 90 only          -> (0, 1) n01
    # user 3: clicks at 10 and 90       -> (1, 1) both
    # user 4: views only                -> (0, 0) neither
    # user 5: click at 80               -> (0, 1) n01
    rows = [(1, 10, "click"), (1, 90, "view"),
            (2, 10, "view"), (2, 90, "click"),
            (3, 10, "click"), (3, 90, "click"),
            (4, 0, "view"), (4, 100, "view"),
            (5, 20, "view"), (5, 80, "click")]
    out = mcnemar_tool_halves(_mk_users(rows))
    r = out.iloc[0]
    assert (int(r.n_users), int(r.n_both), int(r.n_neither),
            int(r.n10), int(r.n01)) == (5, 1, 1, 1, 2)
    assert float(r.chi2) == ((2 - 1) ** 2) / 3.0


def test_mcnemar_no_discordance_zero(ray_session):
    from sits_ray.stages.drift import mcnemar_tool_halves

    rows = [(1, 0, "click"), (1, 100, "click"),
            (2, 0, "view"), (2, 100, "view")]
    out = mcnemar_tool_halves(_mk_users(rows))
    assert float(out.chi2.iloc[0]) == 0.0
    assert int(out.n10.iloc[0]) == 0 and int(out.n01.iloc[0]) == 0
