"""QQ decile drift and value moments (stages/drift): hand deciles and
scipy-free moment checks."""

import numpy as np
import pandas as pd


def _mk(values, secs):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "value": np.asarray(values, np.float64),
        "ts": pd.to_datetime(np.asarray(secs, np.int64) * 1_000_000,
                             unit="us")}))


def test_qq_shift_hand(ray_session):
    from sits_ray.stages.drift import qq_drift_deciles

    # first half: values 1..10 ; second half: values 101..110
    vals = list(range(1, 11)) + list(range(101, 111))
    secs = [0] * 10 + [100] * 10
    out = qq_drift_deciles(_mk(vals, secs))
    assert out.decile.tolist() == list(range(1, 10))
    # every decile shifts by exactly 100.00 = 10000 cents
    assert (out["shift"].to_numpy() == 10000).all()
    # decile d of 1..10 (lower nearest rank) = value d -> cents d*100
    assert out.v_a.tolist() == [d * 100 for d in range(1, 10)]


def test_qq_identical_halves_zero_shift(ray_session):
    from sits_ray.stages.drift import qq_drift_deciles

    vals = list(range(1, 21)) * 2
    secs = [0] * 20 + [100] * 20
    out = qq_drift_deciles(_mk(vals, secs))
    assert (out["shift"].to_numpy() == 0).all()


def test_moments_symmetric_zero_skew(ray_session):
    from sits_ray.stages.drift import value_moments

    # symmetric two-point mass -> skew 0, kurtosis -2 (Bernoulli 1/2)
    out = value_moments(_mk([1.0, 3.0] * 50, [0] * 100))
    r = out.iloc[0]
    assert abs(float(r.g1_skew)) < 1e-9
    assert abs(float(r.g2_kurt) + 2.0) < 1e-9
    assert float(r.mean_cents) == 200.0


def test_moments_match_numpy(ray_session):
    from sits_ray.stages.drift import value_moments

    rng = np.random.default_rng(4)
    cents = rng.integers(100, 10000, 500)
    out = value_moments(_mk(cents / 100.0, [0] * 500))
    y = np.floor((cents / 100.0) / 0.01)      # the engine's exact grid
    mu = y.mean()
    m2 = ((y - mu) ** 2).mean()
    m3 = ((y - mu) ** 3).mean()
    m4 = ((y - mu) ** 4).mean()
    r = out.iloc[0]
    assert abs(float(r.g1_skew) - m3 / m2 ** 1.5) < 1e-6
    assert abs(float(r.g2_kurt) - (m4 / m2 ** 2 - 3.0)) < 1e-6
