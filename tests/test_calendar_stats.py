"""Calendar diagnostics (drift.seasonality_strength_dow,
drift.dispersion_daily): hand-computed eta^2 and dispersion."""

import numpy as np
import pandas as pd


def _mk(day_counts):
    import ray.data as rd

    us = []
    for d, c in day_counts:
        us.extend([d * 86400_000_000 + i for i in range(c)])
    return rd.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(np.asarray(us, np.int64), unit="us")}))


def test_pure_weekly_pattern_strength_one(ray_session):
    from sits_ray.stages.drift import seasonality_strength_dow

    # counts depend ONLY on weekday -> SSB == SST -> strength 1
    counts = {0: 10, 1: 20, 2: 30, 3: 10, 4: 20, 5: 30, 6: 5}
    days = [(d, counts[(d + 4) % 7]) for d in range(14)]
    out = seasonality_strength_dow(_mk(days))
    assert int(out.n_days.iloc[0]) == 14
    assert abs(float(out.strength.iloc[0]) - 1.0) < 1e-12


def test_flat_calendar_strength_zero(ray_session):
    from sits_ray.stages.drift import seasonality_strength_dow

    out = seasonality_strength_dow(_mk([(d, 9) for d in range(14)]))
    assert abs(float(out.ssb.iloc[0])) < 1e-9


def test_dispersion_hand(ray_session):
    from sits_ray.stages.drift import dispersion_daily

    # counts [2, 4, 6]: n=3, s=12, q=56; mean=4
    # var = (3*56 - 144)/6 = 4; D = 1; chi2 = 2
    out = dispersion_daily(_mk([(0, 2), (1, 4), (2, 6)]))
    r = out.iloc[0]
    assert float(r.mean_daily) == 4.0
    assert float(r.var_daily) == 4.0
    assert float(r.dispersion) == 1.0
    assert float(r.chi2) == 2.0


def test_dispersion_overdispersed(ray_session):
    from sits_ray.stages.drift import dispersion_daily

    out = dispersion_daily(_mk([(0, 1), (1, 1), (2, 100)]))
    assert float(out.dispersion.iloc[0]) > 10.0


def test_isotonic_minimax_matches_pava():
    """The minimax closed form used by isotonic_calibration equals the
    classical pool-adjacent-violators fit on hand-checked weighted
    sequences (monotone input untouched; one violation pools; all-equal
    untouched)."""
    import numpy as np

    def minimax(c, n):
        B = len(n)
        cn = np.concatenate([[0], np.cumsum(n)])
        cc = np.concatenate([[0], np.cumsum(c)])
        A = {}
        for j in range(B):
            for k in range(j, B):
                A[j, k] = (cc[k + 1] - cc[j]) / (cn[k + 1] - cn[j])
        return [max(min(A[j, k] for k in range(i, B))
                    for j in range(i + 1)) for i in range(B)]

    def pava(c, n):
        blocks = []  # (sum_c, sum_n, width)
        for ci, ni in zip(c, n):
            blocks.append([ci, ni, 1])
            while (len(blocks) > 1 and
                   blocks[-2][0] * blocks[-1][1]
                   > blocks[-1][0] * blocks[-2][1]):
                b2 = blocks.pop()
                blocks[-1][0] += b2[0]
                blocks[-1][1] += b2[1]
                blocks[-1][2] += b2[2]
            # keep pooling transitively
        out = []
        for sc, sn, w in blocks:
            out.extend([sc / sn] * w)
        return out

    rng = np.random.default_rng(9)
    for _ in range(50):
        B = int(rng.integers(1, 11))
        n = rng.integers(1, 50, size=B)
        c = np.array([rng.integers(0, ni + 1) for ni in n])
        assert np.allclose(minimax(c, n), pava(c, n), rtol=0, atol=1e-12)
        assert (np.diff(minimax(c, n)) >= -1e-12).all()
