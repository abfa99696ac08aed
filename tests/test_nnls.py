import numpy as np
import pytest

from sits_ray.kernels.nnls import nnls, unmix


def test_nnls_matches_unconstrained_when_interior():
    rng = np.random.default_rng(7)
    A = rng.random((10, 3)) + 0.1
    x_true = np.array([0.5, 1.2, 0.3])
    b = A @ x_true
    x, rn = nnls(A, b)
    np.testing.assert_allclose(x, x_true, rtol=1e-8)
    assert rn < 1e-9


def test_nnls_clips_negative_components():
    # b constructed so the unconstrained solution has a negative coefficient
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    b = np.array([1.0, -0.5])
    x, rn = nnls(A, b)
    assert (x >= 0).all()
    # optimal nonneg solution: x = [1, 0] -> residual (0, -0.5)
    np.testing.assert_allclose(x, [1.0, 0.0], atol=1e-10)
    assert rn == pytest.approx(0.5)


def test_nnls_kkt_optimality_random():
    rng = np.random.default_rng(8)
    for _ in range(25):
        A = rng.normal(size=(12, 5))
        b = rng.normal(size=12)
        x, _ = nnls(A, b)
        g = A.T @ (A @ x - b)  # gradient
        assert (x >= -1e-12).all()
        # KKT: gradient >= 0 where x == 0; ~0 where x > 0
        assert (g[x <= 1e-10] >= -1e-7).all()
        np.testing.assert_allclose(g[x > 1e-10], 0.0, atol=1e-7)


def test_unmix_recovers_fractions():
    rng = np.random.default_rng(9)
    E = rng.random((3, 8))  # 3 endmembers x 8 bands
    fr_true = rng.dirichlet(np.ones(3), size=50)
    vals = fr_true @ E
    fr, rmse = unmix(vals, E)
    np.testing.assert_allclose(fr, fr_true, atol=1e-8)
    assert (rmse < 1e-9).all()


def test_unmix2_pinned_matches_general_nnls():
    import numpy as np

    from sits_ray.kernels.nnls import nnls, unmix2_pinned

    rng = np.random.default_rng(7)
    e1, e2 = rng.random(16), rng.random(16)
    # mix of interior solutions and boundary (clamped) cases
    ys = np.vstack([
        2.0 * e1 + 0.5 * e2,            # feasible unconstrained
        3.0 * e1 - 1.0 * e2,            # forces x2 -> 0
        -1.0 * e1 + 2.0 * e2,           # forces x1 -> 0
        -e1 - e2,                       # both clamp to 0
        rng.normal(size=16),
    ])
    fr, rmse = unmix2_pinned(ys, e1, e2)
    A = np.stack([e1, e2], axis=1)
    for i, y in enumerate(ys):
        x_ref = nnls(A, y)[0] if isinstance(nnls(A, y), tuple) else nnls(A, y)
        x_ref = np.asarray(x_ref, dtype=float).ravel()[:2]
        assert np.allclose(fr[i], x_ref, atol=1e-9), (i, fr[i], x_ref)
        r = y - A @ fr[i]
        assert np.isclose(rmse[i], np.sqrt((r @ r) / 16.0), atol=1e-9)
        assert (fr[i] >= 0).all()
