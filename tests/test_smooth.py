import numpy as np

from sits_ray.kernels.smooth import sgolay, sgolay_coef, whittaker


def _whittaker_dense_oracle(y, lam):
    """Solve (I + lam*D'D) z = y with dense linear algebra (2nd-order D)."""
    n = y.size
    D = np.diff(np.eye(n), n=2, axis=0)
    return np.linalg.solve(np.eye(n) + lam * D.T @ D, y)


def test_whittaker_matches_dense_solver():
    rng = np.random.default_rng(3)
    y = rng.normal(0, 1, size=30).cumsum()
    for lam in (0.5, 2.0, 25.0):
        got = whittaker(y.reshape(1, -1), lam)[0]
        np.testing.assert_allclose(got, _whittaker_dense_oracle(y, lam), rtol=1e-8)


def test_whittaker_smooths():
    rng = np.random.default_rng(4)
    clean = np.sin(np.linspace(0, 4 * np.pi, 50))
    noisy = clean + rng.normal(0, 0.3, 50)
    sm = whittaker(noisy.reshape(1, -1), 10.0)[0]
    assert np.mean((sm - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_whittaker_vectorized_rows_match_single():
    rng = np.random.default_rng(5)
    m = rng.normal(size=(6, 23))
    full = whittaker(m, 0.5)
    for i in range(6):
        np.testing.assert_allclose(full[i], whittaker(m[i : i + 1], 0.5)[0])


def test_sgolay_coef_properties():
    f = sgolay_coef(3, 5)
    assert f.shape == (5, 5)
    # each filter row must preserve constants (weights sum to 1)
    np.testing.assert_allclose(f.sum(axis=1), np.ones(5), atol=1e-12)
    # and reproduce polynomials up to the order exactly
    x = np.arange(1.0, 6.0)
    poly = 2 + 3 * x - 0.5 * x**2 + 0.1 * x**3
    # central row evaluates the fit at the middle point
    np.testing.assert_allclose(f[2] @ poly, poly[2], rtol=1e-10)
    np.testing.assert_allclose(f[0] @ poly, poly[0], rtol=1e-10)
    np.testing.assert_allclose(f[4] @ poly, poly[4], rtol=1e-10)


def test_sgolay_polynomial_invariance():
    # an order-3 polynomial series passes through an order-3 S-G filter unchanged
    x = np.linspace(0, 1, 23)
    poly = 1 + x - 2 * x**2 + 0.3 * x**3
    got = sgolay(poly.reshape(1, -1), order=3, length=5)[0]
    np.testing.assert_allclose(got, poly, rtol=1e-9)


def test_sgolay_matrix_rows_independent():
    rng = np.random.default_rng(6)
    m = rng.normal(size=(4, 23))
    full = sgolay(m)
    for i in range(4):
        np.testing.assert_allclose(full[i], sgolay(m[i : i + 1])[0])


def test_ewma_recursion_and_vectorization():
    import numpy as np

    from sits_ray.kernels.smooth import ewma

    m = np.array([[1.0, 2.0, 4.0], [0.0, 0.0, 9.0]])
    out = ewma(m, alpha=0.3)
    assert np.allclose(out[0], [1.0, 1.3, 2.11])
    # row-wise independence: batch result == single-row result bit-for-bit
    assert (ewma(m[1:2], alpha=0.3) == out[1:2]).all()
    # alpha=1 reproduces the input exactly
    assert (ewma(m, alpha=1.0) == m).all()


def test_cusum_scalar_parity_and_median_ref():
    from sits_ray.kernels.smooth import cusum

    x = np.array([5.0, 9.0, 2.0, 14.0, 5.0, 5.0])
    hi, lo = cusum(x[None, :], k=1.0, ref="median")
    # scalar walk: ref = nearest-rank median (sorted[ceil(0.5*6)-1] = 5.0)
    ref, sh, sl, ehi, elo = 5.0, 0.0, 0.0, [0.0], [0.0]
    for t in range(1, 6):
        sh = max((sh + (x[t] - ref)) - 1.0, 0.0)
        sl = max((sl + (ref - x[t])) - 1.0, 0.0)
        ehi.append(sh)
        elo.append(sl)
    assert hi[0].tolist() == ehi and lo[0].tolist() == elo
    # a pure level shift alarms on the hi side only
    y = np.concatenate([np.full(5, 1.0), np.full(5, 10.0)])
    hi2, lo2 = cusum(y[None, :], k=1.0, ref="median")
    assert hi2[0, -1] > 0 and lo2[0].max() == 0.0


def test_cusum_rows_independent():
    from sits_ray.kernels.smooth import cusum

    a = np.array([[1.0, 5.0, 1.0], [100.0, 100.0, 100.0]])
    hi, _ = cusum(a, k=0.5, ref="first")
    single, _ = cusum(a[:1], k=0.5, ref="first")
    assert np.array_equal(hi[0], single[0])
    assert (hi[1] == 0).all()


def test_mann_kendall_known_trends():
    from sits_ray.kernels.smooth import mann_kendall

    m = np.array(
        [[1.0, 2.0, 3.0, 4.0],        # strictly increasing: S = 6, slope 1
         [4.0, 3.0, 2.0, 1.0],        # strictly decreasing
         [1.0, 1.0, 1.0, 1.0],        # flat: all ties
         [1.0, 3.0, 2.0, 4.0]]        # mixed
    )
    s, slope = mann_kendall(m)
    assert s.tolist() == [6, -6, 0, 4]
    assert slope[0] == 1.0 and slope[1] == -1.0 and slope[2] == 0.0
    # mixed row: brute-force nearest-rank median of the 6 pairwise slopes
    pairs = []
    x = m[3]
    for i in range(4):
        for j in range(i + 1, 4):
            pairs.append((x[j] - x[i]) / (j - i))
    pairs.sort()
    assert slope[3] == pairs[int(np.ceil(0.5 * 6)) - 1]
    # short series: no pairs -> S=0, NaN slope
    s1, sl1 = mann_kendall(np.array([[5.0]]))
    assert s1[0] == 0 and np.isnan(sl1[0])


def test_holt_matches_scalar_recursion():
    from sits_ray.kernels.smooth import holt

    rng = np.random.default_rng(6)
    m = rng.normal(size=(4, 25))
    got = holt(m, alpha=0.3, beta=0.1)
    for r in range(4):
        x = m[r]
        s, b = x[0], x[1] - x[0]
        assert got[r, 0] == s
        for t in range(1, x.size):
            s_new = 0.3 * x[t] + 0.7 * (s + b)
            b = 0.1 * (s_new - s) + 0.9 * b
            s = s_new
            assert got[r, t] == s, (r, t)


def test_holt_tracks_linear_trend():
    from sits_ray.kernels.smooth import holt

    x = (3.0 * np.arange(60) + 5.0)[None, :]
    out = holt(x, alpha=0.3, beta=0.1)
    # on an exact line with b_1 = slope the smoother reproduces the line
    np.testing.assert_allclose(out, x, rtol=1e-12)


def test_holt_singleton_series():
    from sits_ray.kernels.smooth import holt

    out = holt(np.array([[4.2]]))
    assert out.tolist() == [[4.2]]


def test_hampel_replaces_planted_spike():
    from sits_ray.kernels.smooth import hampel

    x = np.array([[1.0, 1.0, 1.0, 50.0, 1.0, 1.0, 1.0]])
    filt, flags = hampel(x)
    assert filt.tolist() == [[1.0] * 7]
    assert flags.tolist() == [[0, 0, 0, 1, 0, 0, 0]]


def test_hampel_scalar_parity():
    from sits_ray.kernels.smooth import hampel

    rng = np.random.default_rng(7)
    m = rng.normal(size=(4, 23))
    m[1, 10] += 30.0
    filt, flags = hampel(m, h=2, k=3.0 * 1.4826)
    for r in range(m.shape[0]):
        for t in range(m.shape[1]):
            if t < 2 or t >= m.shape[1] - 2:
                assert filt[r, t] == m[r, t] and flags[r, t] == 0.0
                continue
            w = m[r, t - 2 : t + 3]
            med = np.sort(w)[2]
            mad = np.sort(np.abs(w - med))[2]
            spike = abs(m[r, t] - med) > (3.0 * 1.4826) * mad
            assert flags[r, t] == float(spike)
            assert filt[r, t] == (med if spike else m[r, t])


def test_hampel_short_and_constant_series():
    from sits_ray.kernels.smooth import hampel

    short = np.array([[3.0, 9.0, 1.0]])
    f, fl = hampel(short)
    assert f.tolist() == short.tolist() and fl.sum() == 0
    # constant window: mad == 0 so ANY deviation flags, equality does not
    const = np.array([[2.0] * 9])
    f, fl = hampel(const)
    assert f.tolist() == const.tolist() and fl.sum() == 0


def test_holt_winters_scalar_parity():
    from sits_ray.kernels.smooth import holt_winters

    rng = np.random.default_rng(3)
    m = rng.normal(size=(3, 20))
    got = holt_winters(m, period=7, alpha=0.3, beta=0.1, gamma=0.2)
    for r in range(3):
        x = m[r]
        s, b = x[0], 0.0
        seas = [0.0] * 7
        assert got[r, 0] == s + seas[0]
        for t in range(1, 20):
            j = t % 7
            s_new = 0.3 * (x[t] - seas[j]) + 0.7 * (s + b)
            b = 0.1 * (s_new - s) + 0.9 * b
            seas[j] = 0.2 * (x[t] - s_new) + 0.8 * seas[j]
            s = s_new
            assert got[r, t] == s + seas[j], (r, t)


def test_holt_winters_learns_weekly_pattern():
    from sits_ray.kernels.smooth import holt_winters

    pat = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    x = np.tile(pat, 30)[None, :]
    out = holt_winters(x)
    # after enough cycles the fitted value tracks the pattern closely
    err = np.abs(out[0, -7:] - x[0, -7:])
    assert err.max() < 0.75, err


def test_holt_winters_singleton():
    from sits_ray.kernels.smooth import holt_winters

    assert holt_winters(np.array([[4.2]])).tolist() == [[4.2]]


def test_goertzel_detects_matching_period():
    from sits_ray.kernels.smooth import goertzel_power

    t = np.arange(70, dtype=np.float64)
    weekly = np.sin(2 * np.pi * t / 7.0)[None, :]
    flat = np.ones((1, 70))
    p_weekly = goertzel_power(weekly)[0]
    p_flat_at7 = goertzel_power(flat)[0]
    # pure 7-day sine carries much more 1/7-bin power than a constant
    assert p_weekly > 100.0 * max(p_flat_at7, 1e-12)
    # and the weekly bin beats a far-off (period 2.3) probe on the same data
    assert p_weekly > 10.0 * goertzel_power(weekly, period=2.3)[0]


def test_goertzel_scalar_parity_and_empty():
    import math

    from sits_ray.kernels.smooth import goertzel_power

    rng = np.random.default_rng(11)
    m = rng.normal(size=(3, 17))
    got = goertzel_power(m, period=7.0)
    co = 2.0 * math.cos(2.0 * math.pi / 7.0)
    for r in range(3):
        s1 = s2 = 0.0
        for t in range(17):
            s1, s2 = (m[r, t] + co * s1) - s2, s1
        assert got[r] == (s1 * s1 + s2 * s2) - co * (s1 * s2)
    assert goertzel_power(np.empty((2, 0))).tolist() == [0.0, 0.0]


# --- Croston intermittent-demand smoother ------------------------------------

def test_croston_scalar_walk_parity():
    from sits_ray.kernels.smooth import croston

    rng = np.random.default_rng(17)
    # sparse demand matrix: ~70% zeros
    m = rng.integers(0, 4, (40, 60)).astype(np.float64)
    m[rng.random((40, 60)) < 0.5] = 0.0
    z, p, nd = croston(m)
    a, oma = 0.2, 0.8
    for r in range(40):
        zz = pp = qq = 0.0
        started = False
        cnt = 0
        for t in range(60):
            y = m[r, t]
            if y > 0:
                if started:
                    zz = a * y + oma * zz
                    pp = a * qq + oma * pp
                else:
                    zz, pp, started = y, float(t + 1), True
                qq = 1.0
                cnt += 1
            else:
                qq += 1.0
        assert z[r] == zz and p[r] == pp and nd[r] == cnt  # bit-exact


def test_croston_edge_rows():
    from sits_ray.kernels.smooth import croston

    m = np.array([
        [0, 0, 0, 0],        # never demands -> nd 0, caller drops
        [0, 0, 0, 7],        # first demand at the last step
        [3, 3, 3, 3],        # constant demand: z stays 3, p stays 1
    ], dtype=np.float64)
    z, p, nd = croston(m)
    assert nd[0] == 0
    assert (z[1], p[1], nd[1]) == (7.0, 4.0, 1)
    # constant demand: z hovers at 3 (each step a*3 + (1-a)*z, IEEE
    # rounding keeps it within ulps), p exactly 1 (a*1 + (1-a)*1 folds
    # to 1.0 in doubles)
    assert abs(z[2] - 3.0) < 1e-12 and p[2] == 1.0 and nd[2] == 4
    # constant demand every other day: p converges toward 2
    z2, p2, nd2 = croston(np.array([[2, 0] * 20], dtype=np.float64))
    assert abs(p2[0] - 2.0) < 0.2 and abs(z2[0] - 2.0) < 1e-12


# --- Durbin-Levinson PACF -----------------------------------------------------

def test_pacf_ar1_cutoff():
    from sits_ray.kernels.smooth import pacf_durbin_levinson

    # AR(1): pacf lag 1 = r1; lags >= 2 ~ 0 (exact for the textbook
    # recursion when r_k = r1^k exactly)
    r1 = 0.6
    r = np.array([[r1, r1**2, r1**3, r1**4, r1**5]])
    p = pacf_durbin_levinson(r)[0]
    assert p[0] == r1
    assert np.all(np.abs(p[1:]) < 1e-12)


def test_pacf_matches_scalar_recursion():
    from sits_ray.kernels.smooth import pacf_durbin_levinson

    rng = np.random.default_rng(13)
    # random correlations (kept small so the recursion is stable)
    r = rng.uniform(-0.3, 0.3, size=(7, 5))
    got = pacf_durbin_levinson(r)

    def scalar(rr):
        K = len(rr)
        phi = [0.0] * K
        phi[0] = rr[0]
        out = [rr[0]]
        for k in range(1, K):
            acc_n = 0.0
            acc_d = 0.0
            for j in range(k):
                acc_n = acc_n + phi[j] * rr[k - 1 - j]
                acc_d = acc_d + phi[j] * rr[j]
            a = (rr[k] - acc_n) / (1.0 - acc_d)
            new = phi[:]
            for j in range(k):
                new[j] = phi[j] - a * phi[k - 1 - j]
            new[k] = a
            phi = new
            out.append(a)
        return out

    for i in range(7):
        exp = scalar(list(r[i]))
        assert got[i].tolist() == exp  # bit-exact: same fold order


def test_pacf_nan_rows_propagate():
    from sits_ray.kernels.smooth import pacf_durbin_levinson

    r = np.array([[np.nan] * 5, [0.5, 0.25, 0.125, 0.0625, 0.03125]])
    p = pacf_durbin_levinson(r)
    assert np.all(np.isnan(p[0]))
    assert not np.any(np.isnan(p[1]))


def test_page_hinkley_scalar_walk_and_drift():
    """Matrix kernel == scalar recursion; a mean step trips the alarm
    gap while a flat series never leaves zero."""
    import numpy as np

    from sits_ray.kernels.smooth import page_hinkley

    rng = np.random.default_rng(8)
    x = rng.normal(10.0, 1.0, size=24)
    x[12:] += 8.0                       # upward mean shift
    ph, gap = page_hinkley(x, delta=0.5, lam=5.0)

    # scalar replay, identical operand order
    S = mt = Mt = 0.0
    for t, v in enumerate(x):
        S = S + v
        mt = mt + (v - S / float(t + 1) - 0.5)
        Mt = min(Mt, mt)
        assert ph[0, t] == mt and gap[0, t] == mt - Mt   # bit-exact

    assert gap[0, -1] > 5.0             # drift detected
    flat = np.full(30, 3.0)
    _, g2 = page_hinkley(flat, delta=0.1, lam=1.0)
    assert (g2 <= 1e-12).all()          # no drift on a constant series
