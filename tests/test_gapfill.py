import numpy as np
from hypothesis import given, settings, strategies as st

from sits_ray.kernels.gapfill import (
    fill_na,
    linear_interp,
    mask_na,
    na_linear_vector_interp,
)

nan = np.nan


def test_rules_exact():
    # rules from reference src/linear_interp.cpp:25-73
    x = np.array([nan, nan, 2.0, nan, nan, nan, 6.0, nan])
    got = na_linear_vector_interp(x)
    # leading <- first valid; interior linear: 2 + i*(6-2)/4; trailing <- last
    np.testing.assert_allclose(got, [2, 2, 2, 3, 4, 5, 6, 6])


def test_all_nan_stays_nan():
    x = np.array([nan, nan, nan])
    assert np.isnan(na_linear_vector_interp(x)).all()
    assert np.isnan(linear_interp(x.reshape(1, -1))).all()


def test_no_nan_identity():
    x = np.array([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(linear_interp(x.reshape(1, -1))[0], x)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
def test_matrix_matches_scalar_oracle(vals):
    x = np.array([np.nan if v is None else v for v in vals], dtype=np.float64)
    exp = na_linear_vector_interp(x.copy())
    got = linear_interp(x.reshape(1, -1))[0]
    np.testing.assert_array_equal(np.isnan(exp), np.isnan(got))
    np.testing.assert_allclose(got, exp, rtol=0, atol=0, equal_nan=True)


def test_mask_and_fill():
    m = np.array([[1.0, nan], [1.0, 2.0]])
    np.testing.assert_array_equal(mask_na(m), [True, False])
    np.testing.assert_array_equal(fill_na(m, 0.0), [[0.0, 0.0], [1.0, 2.0]])
