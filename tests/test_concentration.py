"""Exact no-global-sort Gini / Lorenz concentration
(stages/concentration.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from sits_ray.stages.concentration import gini_concentration


def _events_of_counts(counts):
    """One event row per unit of volume: conv k appears counts[k] times."""
    uid = np.repeat(np.arange(1, len(counts) + 1), counts)
    return rd.from_pandas(pd.DataFrame({"user_id": uid.astype(np.int64)}))


def _brute_gini(counts):
    x = np.sort(np.asarray(counts, dtype=np.int64))
    n = len(x)
    i = np.arange(1, n + 1)
    s = int(x.sum())
    s1 = int((i * x).sum())
    return float(2 * s1 - (n + 1) * s) / float(n * s)


def test_gini_matches_brute_force_sorted_formula(ray_session):
    rng = np.random.default_rng(23)
    counts = rng.integers(1, 40, 200)
    out = gini_concentration(_events_of_counts(counts))
    assert out.loc[0, "n_convs"] == 200
    assert out.loc[0, "n_events"] == counts.sum()
    assert out.loc[0, "gini"] == _brute_gini(counts)  # bit-exact
    x = np.sort(counts)[::-1]
    assert out.loc[0, "top10_share"] == int(x[:20].sum()) / int(x.sum())
    assert out.loc[0, "top1_share"] == int(x[:2].sum()) / int(x.sum())


def test_gini_bounds_and_extremes(ray_session):
    # perfectly equal volumes -> gini 0
    eq = gini_concentration(_events_of_counts([5] * 50))
    assert eq.loc[0, "gini"] == 0.0
    assert eq.loc[0, "top10_share"] == 5 * 5 / 250
    # one conv carries almost everything -> gini near 1
    skew = gini_concentration(_events_of_counts([1] * 99 + [10000]))
    assert skew.loc[0, "gini"] > 0.95
    assert skew.loc[0, "top1_share"] == 10000 / 10099


def test_gini_batching_invariance(ray_session):
    rng = np.random.default_rng(5)
    counts = rng.integers(1, 25, 300)
    one = gini_concentration(_events_of_counts(counts))
    many = gini_concentration(_events_of_counts(counts).repartition(19),
                              n_parts=7)
    pd.testing.assert_frame_equal(one, many)
