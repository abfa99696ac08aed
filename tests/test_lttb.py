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
