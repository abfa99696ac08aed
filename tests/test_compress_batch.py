import numpy as np
from hypothesis import given, settings, strategies as st

from sits_ray.kernels.compress import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
)
from sits_ray.kernels.compress_batch import (
    encode_timestamps_batch,
    encode_values_batch,
)


def _series(*arrs, dtype):
    flat = np.concatenate([np.asarray(a, dtype=dtype) for a in arrs]) if arrs else np.array([], dtype=dtype)
    offs = np.concatenate([[0], np.cumsum([len(a) for a in arrs])]).astype(np.int64)
    return flat, offs


def test_values_roundtrip_mixed_series():
    rng = np.random.default_rng(0)
    series = [
        rng.normal(100, 5, 37),
        np.full(20, 42.5),
        np.array([1.5]),
        np.array([]),
        np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300, 1e300]),
        rng.lognormal(3, 1.6, 200),
    ]
    flat, offs = _series(*series, dtype=np.float64)
    blobs = encode_values_batch(flat, offs)
    assert len(blobs) == len(series)
    for blob, src in zip(blobs, series):
        dec = decode_values(blob)
        np.testing.assert_array_equal(
            dec.view(np.uint64), np.asarray(src, dtype=np.float64).view(np.uint64)
        )


def test_timestamps_roundtrip_and_byte_parity_with_scalar():
    rng = np.random.default_rng(1)
    series = [
        np.arange(50, dtype=np.int64) * 60_000_000 + 1_748_736_000_000_000,
        np.cumsum((rng.lognormal(np.log(20), 1.6, 80) * 1e6).astype(np.int64)),
        np.array([123456789], dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([5, 7], dtype=np.int64),
        np.array([-(10**17), 10**17], dtype=np.int64),
    ]
    flat, offs = _series(*series, dtype=np.int64)
    blobs = encode_timestamps_batch(flat, offs)
    for blob, src in zip(blobs, series):
        np.testing.assert_array_equal(decode_timestamps(blob), src)
        # the ts path has no sequential window state: byte-identical to
        # the scalar encoder
        assert blob == encode_timestamps(np.asarray(src, dtype=np.int64))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(allow_nan=False, width=64), min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_values_roundtrip_property(groups):
    flat, offs = _series(*[np.array(g, dtype=np.float64) for g in groups], dtype=np.float64)
    blobs = encode_values_batch(flat, offs)
    for blob, src in zip(blobs, groups):
        dec = decode_values(blob)
        np.testing.assert_array_equal(
            dec.view(np.uint64), np.array(src, dtype=np.float64).view(np.uint64)
        )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2**40), min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_timestamps_roundtrip_property(groups):
    series = [np.cumsum(np.array([1_700_000_000_000_000] + g, dtype=np.int64)) for g in groups]
    flat, offs = _series(*series, dtype=np.int64)
    blobs = encode_timestamps_batch(flat, offs)
    for blob, src in zip(blobs, series):
        np.testing.assert_array_equal(decode_timestamps(blob), src)


def test_bit_length_exactness_near_powers_of_two():
    from sits_ray.kernels.compress_batch import _bit_length_u64

    vals = []
    for k in range(1, 64):
        for d in (-1, 0, 1):
            v = (1 << k) + d
            if 0 < v < 2**64:
                vals.append(v)
    vals.append(2**64 - 1)
    x = np.array(vals, dtype=np.uint64)
    got = _bit_length_u64(x)
    exp = np.array([int(v).bit_length() for v in vals])
    np.testing.assert_array_equal(got, exp)
