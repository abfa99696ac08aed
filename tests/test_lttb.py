"""LTTB downsampling: batch kernel == textbook scalar twin, endpoint and
bucket invariants, shape preservation on a known series."""

import numpy as np
import pandas as pd

from sits_ray.kernels.lttb import (
    _bucket_bounds,
    lttb_indices_batch,
    lttb_indices_scalar,
)


def test_bucket_bounds_cover_interior():
    s, e = _bucket_bounds(100, 12)
    assert s[0] == 1 and e[-1] == 99
    assert (s[1:] == e[:-1]).all()
    assert (e > s).all()


def test_batch_matches_scalar():
    rng = np.random.default_rng(8)
    for n, n_out in ((50, 12), (101, 20), (30, 3), (10, 10), (9, 20)):
        X = np.sort(rng.uniform(0, 1000, size=(6, n)), axis=1)
        Y = rng.normal(size=(6, n))
        got = lttb_indices_batch(X, Y, n_out)
        for r in range(6):
            want = lttb_indices_scalar(X[r], Y[r], n_out)
            np.testing.assert_array_equal(got[r], want), (n, n_out, r)


def test_endpoints_and_one_per_bucket():
    rng = np.random.default_rng(3)
    X = np.arange(200, dtype=np.float64)[None, :].repeat(2, axis=0)
    Y = rng.normal(size=(2, 200))
    idx = lttb_indices_batch(X, Y, 14)
    assert (idx[:, 0] == 0).all() and (idx[:, -1] == 199).all()
    assert (np.diff(idx, axis=1) > 0).all()  # strictly increasing picks
    s, e = _bucket_bounds(200, 14)
    for b in range(12):
        assert ((idx[:, b + 1] >= s[b]) & (idx[:, b + 1] < e[b])).all()


def test_spike_is_kept():
    # a single huge spike must survive downsampling
    X = np.arange(500, dtype=np.float64)[None, :]
    Y = np.zeros((1, 500))
    Y[0, 333] = 100.0
    idx = lttb_indices_batch(X, Y, 10)
    assert 333 in idx[0]


def test_lttb_to_long_stage(ray_session):
    import pyarrow as pa

    from sits_ray.stages.series_ops import lttb_to_long

    ts = np.arange(0, 100 * 3_600_000_000, 3_600_000_000, dtype=np.int64)
    vals = np.sin(np.arange(100) / 5.0)
    batch = pa.table(
        {
            "conv_id": pa.array([7], pa.int64()),
            "bucket_ts": pa.array([ts.astype("datetime64[us]")]),
            "mean_latency": pa.array([vals.tolist()], pa.list_(pa.float64())),
        }
    )
    out = lttb_to_long(batch, n_out=12).to_pandas()
    assert len(out) == 12
    assert out["conv_id"].unique().tolist() == [7]
    want = lttb_indices_scalar(ts.astype(np.float64), vals, 12)
    np.testing.assert_array_equal(
        out["value"].to_numpy(), vals[want]
    )
import numpy as np
import pytest


def test_sax_scalar_parity():
    from sits_ray.kernels.sax import sax_breakpoints, sax_transform

    rng = np.random.default_rng(5)
    m = rng.normal(size=(4, 19))
    paa, sym = sax_transform(m, w=8, alphabet=4)
    bps = sax_breakpoints(4)
    for r in range(4):
        x = m[r]
        n = 19
        mu = 0.0
        for v in x:
            mu = mu + v
        mu /= n
        ss = 0.0
        for v in x:
            ss = ss + (v - mu) * (v - mu)
        std = np.sqrt(ss / n)
        z = (x - mu) / std
        for j in range(8):
            lo, hi = (j * n) // 8, ((j + 1) * n) // 8
            acc = 0.0
            for v in z[lo:hi]:
                acc = acc + v
            p = acc / (hi - lo)
            assert paa[r, j] == p
            assert sym[r, j] == int((p > bps).sum())


def test_sax_shape_and_bands():
    from sits_ray.kernels.sax import sax_transform

    # strictly increasing ramp: symbols must be non-decreasing, low->high
    x = np.arange(64, dtype=np.float64)[None, :]
    paa, sym = sax_transform(x, w=8, alphabet=4)
    assert paa.shape == sym.shape == (1, 8)
    assert (np.diff(sym[0]) >= 0).all()
    assert sym[0, 0] == 0 and sym[0, -1] == 3


def test_sax_constant_series_and_short_raise():
    from sits_ray.kernels.sax import sax_transform

    paa, sym = sax_transform(np.full((2, 16), 7.5))
    assert (paa == 0.0).all() and (sym == 1).all()  # z=0 lands in band 'b'
    with pytest.raises(ValueError):
        sax_transform(np.ones((1, 5)), w=8)
