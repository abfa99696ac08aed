import numpy as np
from hypothesis import given, settings, strategies as st

from sits_ray.kernels.compress import (
    decode_block,
    decode_timestamps,
    decode_values,
    encode_block,
    encode_timestamps,
    encode_values,
)


def test_timestamps_roundtrip_regular():
    ts = np.arange(0, 600_000_000, 60_000_000, dtype=np.int64) + 1_748_736_000_000_000
    enc = encode_timestamps(ts)
    np.testing.assert_array_equal(decode_timestamps(enc), ts)
    # regular grid compresses to ~1 bit/point after header + first delta
    assert len(enc) <= 8 * 2 + 9 + len(ts) // 8 + 1


def test_timestamps_roundtrip_irregular():
    rng = np.random.default_rng(1)
    gaps = (rng.lognormal(np.log(20), 1.6, 500) * 1e6).astype(np.int64)
    ts = 1_748_736_000_000_000 + np.cumsum(gaps)
    np.testing.assert_array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_timestamps_edge_sizes():
    for arr in ([], [5], [5, 7], [5, 7, 9], [-(10**17), 10**17]):
        ts = np.array(arr, dtype=np.int64)
        np.testing.assert_array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_values_roundtrip_bit_exact():
    rng = np.random.default_rng(2)
    v = rng.normal(100, 5, size=1000)
    v[::7] = v[::8][: v[::7].size] if False else v[::7]  # noqa - keep variety
    dec = decode_values(encode_values(v))
    np.testing.assert_array_equal(dec.view(np.uint64), v.view(np.uint64))


def test_values_special():
    v = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300, 1e300, 3.14, 3.14])
    dec = decode_values(encode_values(v))
    np.testing.assert_array_equal(dec.view(np.uint64), v.view(np.uint64))


def test_constant_values_compress_well():
    v = np.full(10_000, 42.5)
    enc = encode_values(v)
    assert len(enc) < 8 * 3 + 10_000 // 8 + 16  # ~1 bit per repeated value


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), min_size=0, max_size=60))
def test_values_roundtrip_property(vals):
    v = np.array(vals, dtype=np.float64)
    dec = decode_values(encode_values(v))
    np.testing.assert_array_equal(dec.view(np.uint64), v.view(np.uint64))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=60)
)
def test_timestamps_roundtrip_property(gaps):
    ts = np.cumsum(np.array([1_700_000_000_000_000] + gaps, dtype=np.int64))
    np.testing.assert_array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_block_roundtrip():
    ts = np.arange(10, dtype=np.int64) * 60_000_000
    vals = {"mean_latency": np.random.default_rng(3).normal(size=10),
            "turn_count": np.arange(10, dtype=np.float64)}
    blocks = encode_block(ts, vals)
    ts2, vals2 = decode_block(blocks)
    np.testing.assert_array_equal(ts, ts2)
    for k in vals:
        np.testing.assert_array_equal(
            vals[k].view(np.uint64), vals2[k].view(np.uint64)
        )
