"""One-way ANOVA (stages/drift.anova_oneway): hand-computed F on a tiny
grid, scipy-free textbook cross-check, group-fold order contract."""

import numpy as np
import pandas as pd


def _mk(groups, values):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "event_type": groups, "value": np.asarray(values, np.float64)}))


def test_hand_f(ray_session):
    from sits_ray.stages.drift import anova_oneway

    # cents-exact values; groups a: [1, 2, 3], b: [2, 3, 4], c: [5, 6, 7]
    ds = _mk(["a"] * 3 + ["b"] * 3 + ["c"] * 3,
             [1, 2, 3, 2, 3, 4, 5, 6, 7])
    out = anova_oneway(ds)
    assert int(out.k_groups.iloc[0]) == 3
    assert int(out.n_total.iloc[0]) == 9
    # textbook on cents scale (x100): means 200, 300, 600; grand 366.66..
    xs = np.array([1, 2, 3, 2, 3, 4, 5, 6, 7], dtype=np.int64) * 100
    gs = [xs[0:3], xs[3:6], xs[6:9]]
    grand = xs.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in gs)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in gs)
    assert abs(out.ssb.iloc[0] - ssb) < 1e-6 * ssb
    assert abs(out.ssw.iloc[0] - ssw) < 1e-6 * ssw
    f = (ssb / 2) / (ssw / 6)
    assert abs(out.f_stat.iloc[0] - f) < 1e-9 * f
    assert abs(out.eta_sq.iloc[0] - ssb / (ssb + ssw)) < 1e-12


def test_identical_groups_zero_ssb(ray_session):
    from sits_ray.stages.drift import anova_oneway

    ds = _mk(["a", "a", "b", "b"], [1.0, 3.0, 1.0, 3.0])
    out = anova_oneway(ds)
    assert out.ssb.iloc[0] == 0.0
    assert out.f_stat.iloc[0] == 0.0


def test_negative_values_floor_bin(ray_session):
    from sits_ray.stages.drift import anova_oneway

    # floor(-0.015/0.01) = -2 on both engine and SQL; ensure no crash
    # and exact integer moments with negative bins
    ds = _mk(["a", "a", "b", "b"], [-0.015, -0.005, 0.005, 0.015])
    out = anova_oneway(ds)
    assert int(out.n_total.iloc[0]) == 4
    assert np.isfinite(out.f_stat.iloc[0])
