import duckdb
import numpy as np
import pytest

from sits_ray.kernels import reduce as R


@pytest.fixture(scope="module")
def mtx():
    rng = np.random.default_rng(7)
    return rng.normal(10, 3, size=(20, 23))


def test_basic_reducers(mtx):
    np.testing.assert_allclose(R.t_max(mtx), mtx.max(axis=1))
    np.testing.assert_allclose(R.t_amplitude(mtx), mtx.max(axis=1) - mtx.min(axis=1))
    np.testing.assert_allclose(
        R.t_fslope(mtx), np.abs(np.diff(mtx, axis=1)).max(axis=1)
    )
    np.testing.assert_allclose(R.t_iqr(mtx), R.t_tqr(mtx) - R.t_fqr(mtx))


def test_against_duckdb_semantics(mtx):
    """Reducers must agree with the SQL the oracle uses (DuckDB aggregates)."""
    con = duckdb.connect()
    row = mtx[3]
    con.execute("create table t as select x::double as x from (values " +
                ",".join(f"({v!r})" for v in row) + ") v(x)")
    sql = con.execute(
        "select max(x), min(x), avg(x), median(x), stddev(x), "
        "quantile_cont(x, 0.25), quantile_cont(x, 0.75), quantile_disc(x, 0.95), "
        "skewness(x), kurtosis(x) from t"
    ).fetchone()
    np.testing.assert_allclose(R.t_max(mtx[None, 3])[0], sql[0])
    np.testing.assert_allclose(R.t_min(mtx[None, 3])[0], sql[1])
    np.testing.assert_allclose(R.t_mean(mtx[None, 3])[0], sql[2])
    np.testing.assert_allclose(R.t_median(mtx[None, 3])[0], sql[3])
    np.testing.assert_allclose(R.t_std(mtx[None, 3])[0], sql[4])
    np.testing.assert_allclose(R.t_fqr(mtx[None, 3])[0], sql[5])
    np.testing.assert_allclose(R.t_tqr(mtx[None, 3])[0], sql[6])
    np.testing.assert_allclose(R.t_p95(mtx[None, 3])[0], sql[7])
    np.testing.assert_allclose(R.t_skew(mtx[None, 3])[0], sql[8], rtol=1e-9)
    # DuckDB kurtosis is sample EXCESS kurtosis; ours is Pearson (normal->3).
    n = mtx.shape[1]
    g2 = R.t_kurt(mtx[None, 3])[0] - 3.0
    sample_excess = ((n - 1.0) / ((n - 2.0) * (n - 3.0))) * ((n + 1.0) * g2 + 6.0)
    np.testing.assert_allclose(sample_excess, sql[9], rtol=1e-9)


def test_nearest_rank_is_quantile_disc():
    con = duckdb.connect()
    for n in (1, 2, 3, 4, 10, 17):
        v = np.random.default_rng(n).normal(size=n)
        lst = ",".join(f"({x!r})" for x in v)
        (exp,) = con.execute(
            f"select quantile_disc(x::double, 0.95) from (values {lst}) t(x)"
        ).fetchone()
        assert R.nearest_rank(v, 0.95) == pytest.approx(exp)


def test_mse_fft(mtx):
    exp = np.mean(np.abs(np.fft.fft(mtx[5])) ** 2)
    np.testing.assert_allclose(R.t_mse(mtx[None, 5])[0], exp)
