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


# --- batch decoders: both encoder dialects ---------------------------------
def _ragged_fixture():
    rng = np.random.default_rng(7)
    ts_series = [
        np.array([], np.int64),
        np.array([1_700_000_000_000_000], np.int64),
        np.cumsum(rng.integers(1, 10**7, 64)).astype(np.int64) + 1_700_000_000_000_000,
        np.array([0, 86_400_000_000, 86_400_000_001, 10**15], np.int64),
    ]
    v_series = [
        np.array([], np.float64),
        np.array([3.14]),
        rng.normal(size=64),
        np.array([1.0, 1.0, np.nan, -0.0, 0.0, 2.0**-1040, 1e300]),
    ]
    return ts_series, v_series


def test_batch_decode_scalar_dialect():
    from sits_ray.kernels.compress import encode_timestamps, encode_values
    from sits_ray.kernels.compress_batch import (
        decode_timestamps_batch,
        decode_values_batch,
    )

    ts_series, v_series = _ragged_fixture()
    ft, ot = decode_timestamps_batch([encode_timestamps(s) for s in ts_series])
    fv, ov = decode_values_batch([encode_values(s) for s in v_series])
    for i, s in enumerate(ts_series):
        assert np.array_equal(ft[ot[i]:ot[i + 1]], s)
    for i, s in enumerate(v_series):
        assert np.array_equal(
            fv[ov[i]:ov[i + 1]].view(np.uint64), s.view(np.uint64)
        )


def test_batch_decode_batch_dialect():
    from sits_ray.kernels.compress_batch import (
        decode_timestamps_batch,
        decode_values_batch,
        encode_timestamps_batch,
        encode_values_batch,
    )

    ts_series, v_series = _ragged_fixture()
    tf = np.concatenate(ts_series).astype(np.int64)
    to = np.concatenate([[0], np.cumsum([len(s) for s in ts_series])])
    vf = np.concatenate(v_series).astype(np.float64)
    vo = np.concatenate([[0], np.cumsum([len(s) for s in v_series])])
    ft, _ = decode_timestamps_batch(encode_timestamps_batch(tf, to))
    fv, _ = decode_values_batch(encode_values_batch(vf, vo))
    assert np.array_equal(ft, tf)
    assert np.array_equal(fv.view(np.uint64), vf.view(np.uint64))


def test_batch_decode_matches_scalar_random():
    from sits_ray.kernels.compress import decode_values, encode_values
    from sits_ray.kernels.compress_batch import decode_values_batch

    rng = np.random.default_rng(11)
    series = [
        np.round(rng.normal(10, 2, int(rng.integers(1, 80))), 3) for _ in range(50)
    ]
    blocks = [encode_values(s) for s in series]
    flat, offs = decode_values_batch(blocks)
    for i, b in enumerate(blocks):
        assert np.array_equal(
            flat[offs[i]:offs[i + 1]].view(np.uint64),
            decode_values(b).view(np.uint64),
        )
