"""Rank-Biased Overlap (stages/retrieval.rbo_type_rankings): identical
rankings -> truncated-RBO closed form, disjoint prefixes, hand overlap."""

import numpy as np
import pandas as pd


def _mk(rows):
    import ray.data as rd

    t, s = zip(*rows)
    return rd.from_pandas(pd.DataFrame({
        "event_type": list(t),
        "ts": pd.to_datetime(np.asarray(s, np.int64) * 1_000_000,
                             unit="us")}))


def test_identical_rankings(ray_session):
    from sits_ray.stages.retrieval import rbo_type_rankings

    # same mix in both halves: a twice as frequent as b
    rows = ([("a", 0)] * 4 + [("b", 1)] * 2
            + [("a", 100)] * 4 + [("b", 99)] * 2)
    out = rbo_type_rankings(_mk(rows))
    r = out.iloc[0]
    assert int(r.depth) == 2
    assert int(r.overlap_at_depth) == 2
    # identical rankings: X_d = d -> rbo = (1-p) * sum p^(d-1)
    p = 0.9
    want = (1.0 - p) * (1.0 + p)
    assert abs(float(r.rbo) - want) < 1e-15


def test_swapped_top_two(ray_session):
    from sits_ray.stages.retrieval import rbo_type_rankings

    # first half: a > b; second half: b > a -> X_1 = 0, X_2 = 2
    rows = ([("a", 0)] * 4 + [("b", 1)] * 2
            + [("a", 99)] * 2 + [("b", 100)] * 4)
    out = rbo_type_rankings(_mk(rows))
    r = out.iloc[0]
    p = 0.9
    want = (1.0 - p) * (1.0 * 0.0 + p * (2.0 / 2.0))
    assert abs(float(r.rbo) - want) < 1e-15
    assert int(r.overlap_at_depth) == 2


def test_type_missing_from_one_half(ray_session):
    from sits_ray.stages.retrieval import rbo_type_rankings

    # c only in the first half -> depth limited by the shorter ranking
    rows = ([("a", 0)] * 3 + [("c", 1)] * 2
            + [("a", 100)] * 3)
    out = rbo_type_rankings(_mk(rows))
    assert int(out.depth.iloc[0]) == 1
