"""Entropy rate (eventops.entropy_rate) and Brown-Forsythe
(drift.brown_forsythe): hand-computed information quantities and a
textbook spread test."""

import math

import numpy as np
import pandas as pd


def _mk_events(rows):
    import ray.data as rd

    u, i, t = zip(*rows)
    return rd.from_pandas(pd.DataFrame({
        "user_id": np.asarray(u, np.int64),
        "event_id": np.asarray(i, np.int64),
        "ts": pd.to_datetime(np.asarray(i, np.int64) * 1_000_000,
                             unit="us"),
        "event_type": list(t),
    }))


def test_entropy_deterministic_chain_zero(ray_session):
    from sits_ray.stages.eventops import entropy_rate

    # a->b->a->b...: H(next|prev) = 0 (fully predictable)
    rows = [(1, k, "a" if k % 2 == 0 else "b") for k in range(10)]
    out = entropy_rate(_mk_events(rows))
    r = out.iloc[0]
    assert int(r.n_transitions) == 9
    assert abs(float(r.h_cond)) < 1e-12
    assert float(r.mutual_info) == float(r.h_next) - float(r.h_cond)
    assert float(r.h_next) > 0


def test_entropy_hand_counts(ray_session):
    from sits_ray.stages.eventops import entropy_rate

    # transitions: a->a, a->b, b->a, a->a  (C=4; r_a=3, r_b=1;
    # counts: aa=2, ab=1, ba=1; m_a=3, m_b=1)
    rows = [(1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
            (1, 4, "a")]
    out = entropy_rate(_mk_events(rows))
    r = out.iloc[0]
    h_cond = -((2 / 4) * math.log(2 / 3) + (1 / 4) * math.log(1 / 3)
               + (1 / 4) * math.log(1 / 1))
    h_next = -((3 / 4) * math.log(3 / 4) + (1 / 4) * math.log(1 / 4))
    assert abs(float(r.h_cond) - h_cond) < 1e-12
    assert abs(float(r.h_next) - h_next) < 1e-12


def _mk_vals(groups, values):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "event_type": groups, "value": np.asarray(values, np.float64)}))


def test_bf_equal_spread_zero(ray_session):
    from sits_ray.stages.drift import brown_forsythe

    # same |dev-from-median| multiset in both groups -> ssb = 0
    out = brown_forsythe(_mk_vals(["a"] * 3 + ["b"] * 3,
                                  [1, 2, 3, 11, 12, 13]))
    assert abs(float(out.ssb.iloc[0])) < 1e-9
    assert float(out.f_stat.iloc[0]) == 0.0


def test_bf_hand_f(ray_session):
    from sits_ray.stages.drift import brown_forsythe

    # a: [1, 2, 3] (med 2, cents devs [100, 0, 100])
    # b: [10, 30, 50] (med 30, cents devs [2000, 0, 2000])
    out = brown_forsythe(_mk_vals(["a"] * 3 + ["b"] * 3,
                                  [1, 2, 3, 10, 30, 50]))
    za = np.array([100, 0, 100], dtype=np.float64)
    zb = np.array([2000, 0, 2000], dtype=np.float64)
    allz = np.r_[za, zb]
    ssb = 3 * (za.mean() - allz.mean()) ** 2 + 3 * (zb.mean()
                                                    - allz.mean()) ** 2
    ssw = ((za - za.mean()) ** 2).sum() + ((zb - zb.mean()) ** 2).sum()
    r = out.iloc[0]
    assert abs(float(r.ssb) - ssb) < 1e-6
    assert abs(float(r.ssw) - ssw) < 1e-6
    f = (ssb / 1) / (ssw / 4)
    assert abs(float(r.f_stat) - f) < 1e-9 * f
