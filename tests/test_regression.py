"""Two-factor OLS (stages/regression.py): numpy lstsq cross-check,
three-limb cast contract, known-fit recovery."""

import numpy as np
import pandas as pd


def _mk(hours, tools, values):
    import ray.data as rd

    ts = pd.to_datetime(np.asarray(hours, np.int64) * 3600_000_000,
                        unit="us")
    et = np.where(np.asarray(tools, bool), "click", "view")
    return rd.from_pandas(pd.DataFrame({
        "ts": ts, "event_type": et,
        "value": np.asarray(values, np.float64)}))


def test_i3d_matches_float_on_small_ints():
    from sits_ray.stages.regression import i3d

    for x in [0, 1, -1, 2**52, -(2**52), 10**15, -(10**15)]:
        assert i3d(x) == float(x)


def test_i3d_big_reconstruction():
    from sits_ray.stages.regression import i3d

    # value chosen so the two-add tree differs from nothing observable
    # here; just pin the limb-tree definition against a manual replay
    x = 343547322941760997908268683853704101
    h, r = divmod(x, 1 << 64)
    m, lo = divmod(r, 1 << 32)
    want = (float(h) * 2.0**64 + float(m) * 2.0**32) + float(lo)
    assert i3d(x) == want
    assert i3d(-x) == -want


def test_recovers_exact_linear_fit(ray_session):
    from sits_ray.stages.regression import ols_two_factor

    # y_cents = 100 + 2*hour + 50*tool exactly -> betas exact, r2 = 1.
    # The engine's y is floor(value/0.01) of the DOUBLE value — replay
    # that (cents/100.0 then /0.01 can land just below the integer).
    rng = np.random.default_rng(3)
    hours = rng.integers(0, 24, 200)
    tools = rng.integers(0, 2, 200)
    cents = 100 + 2 * hours + 50 * tools
    y = np.floor((cents / 100.0) / 0.01)
    out = ols_two_factor(_mk(hours, tools, cents / 100.0))
    assert int(out.n_obs.iloc[0]) == 200
    X = np.column_stack([np.ones(200), hours, tools])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(out.beta0.iloc[0] - beta[0]) < 1e-6
    assert abs(out.beta_hour.iloc[0] - beta[1]) < 1e-7
    assert abs(out.beta_tool.iloc[0] - beta[2]) < 1e-7
    assert out.r2.iloc[0] > 0.999


def test_matches_numpy_lstsq(ray_session):
    from sits_ray.stages.regression import ols_two_factor

    rng = np.random.default_rng(11)
    hours = rng.integers(0, 24, 500)
    tools = rng.integers(0, 2, 500)
    noise = rng.integers(-300, 300, 500)
    cents = 1000 + 7 * hours - 30 * tools + noise
    y = np.floor((cents / 100.0) / 0.01)    # the engine's exact y
    out = ols_two_factor(_mk(hours, tools, cents / 100.0))
    X = np.column_stack([np.ones(500), hours, tools])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(out.beta0.iloc[0] - beta[0]) < 1e-6
    assert abs(out.beta_hour.iloc[0] - beta[1]) < 1e-7
    assert abs(out.beta_tool.iloc[0] - beta[2]) < 1e-7
    assert 0.0 < out.r2.iloc[0] < 1.0
