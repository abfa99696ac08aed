"""Kruskal-Wallis (stages/drift.kruskal_wallis): textbook H on a tiny
table (scipy-free hand computation), midrank/tie handling."""

import numpy as np
import pandas as pd


def _mk(groups, values):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "event_type": groups, "value": np.asarray(values, np.float64)}))


def test_hand_h_no_ties(ray_session):
    from sits_ray.stages.drift import kruskal_wallis

    # groups a: {1, 3}, b: {2, 4} (cents 100,300 / 200,400), no ties
    # ranks: 1,3 / 2,4 -> Ra=4, Rb=6, N=4
    # H = 12/(N(N+1)) * (Ra^2/2 + Rb^2/2) - 3(N+1)
    #   = 12/20 * (8 + 18) - 15 = 0.6*26 - 15 = 0.6
    out = kruskal_wallis(_mk(["a", "a", "b", "b"], [1, 3, 2, 4]))
    assert int(out.n_total.iloc[0]) == 4
    assert int(out.k_groups.iloc[0]) == 2
    assert abs(float(out.h_stat.iloc[0]) - 0.6) < 1e-9
    assert float(out.tie_correction.iloc[0]) == 1.0
    assert abs(float(out.h_corrected.iloc[0]) - 0.6) < 1e-9


def test_ties_midranks_and_correction(ray_session):
    from sits_ray.stages.drift import kruskal_wallis

    # a: {1, 2}, b: {2, 3}; the two 2s tie -> midrank 2.5
    # ranks: a = 1 + 2.5 = 3.5, b = 2.5 + 4 = 6.5, N=4
    # H = 12/20 * (3.5^2/2 + 6.5^2/2) - 15 = 0.6*(6.125+21.125) - 15
    #   = 16.35 - 15 = 1.35
    # tie correction: one group of t=2 -> 1 - (8-2)/(64-4) = 0.9
    out = kruskal_wallis(_mk(["a", "a", "b", "b"], [1, 2, 2, 3]))
    assert abs(float(out.h_stat.iloc[0]) - 1.35) < 1e-9
    assert abs(float(out.tie_correction.iloc[0]) - 0.9) < 1e-12
    assert abs(float(out.h_corrected.iloc[0]) - 1.5) < 1e-9


def test_identical_groups_h_zero(ray_session):
    from sits_ray.stages.drift import kruskal_wallis

    out = kruskal_wallis(_mk(["a", "b", "a", "b"], [5, 5, 7, 7]))
    assert abs(float(out.h_stat.iloc[0])) < 1e-9
