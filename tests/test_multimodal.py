"""Real pure-numpy media codecs (PPM/WAV) + the feature actor stage."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.stages.multimodal import (
    MediaFeatures,
    audio_features,
    decode_ppm,
    decode_stub,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    resize_bilinear,
    synth_media_table,
)


def test_ppm_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    back = decode_ppm(encode_ppm(img))
    np.testing.assert_array_equal(back, img)
    # header with comment line
    payload = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    assert decode_ppm(payload).shape == (2, 2, 3)
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n aaa")


def test_wav_roundtrip():
    rng = np.random.default_rng(2)
    s = (rng.normal(0, 0.3, 1000) * 32767).clip(-32768, 32767).astype(np.int16)
    samples, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    np.testing.assert_allclose(samples * 32768.0, s, atol=0.5)
    with pytest.raises(ValueError):
        decode_wav(b"nope")


def test_resize_bilinear():
    # constant image stays constant at any size
    img = np.full((10, 12), 7.0)
    out = resize_bilinear(img, (4, 5))
    np.testing.assert_allclose(out, 7.0)
    # identity resize returns the same values
    rng = np.random.default_rng(3)
    img = rng.random((6, 6))
    np.testing.assert_allclose(resize_bilinear(img, (6, 6)), img, atol=1e-6)
    # 3-channel shape preserved
    img3 = rng.random((8, 8, 3))
    assert resize_bilinear(img3, (4, 4)).shape == (4, 4, 3)


def test_audio_features_bands():
    t = np.arange(4000) / 16000.0
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    f = audio_features(tone, 16000, n_bands=8)
    assert f.shape == (8,)
    assert f.argmax() == 0  # 440 Hz lands in the lowest band of 0..8k
    tone_hi = np.sin(2 * np.pi * 7600 * t).astype(np.float32)
    assert audio_features(tone_hi, 16000, 8).argmax() == 7


def test_real_decode_through_actor_stage(ray_session):
    tbl = synth_media_table(n=16)
    out = extract_features(rd.from_arrow(tbl), batch_size=4, concurrency=1).to_pandas()
    assert len(out) == 16
    assert out["feature"].map(len).eq(64).all()
    # image features are real resized pixels: reconstruct row 0 by hand
    mf = MediaFeatures()
    exp = mf._one(tbl["payload"][0].as_py(), tbl["mime"][0].as_py())
    got = np.array(out.sort_values("media_id")["feature"].iloc[0], dtype=np.float32)
    np.testing.assert_allclose(got, exp, rtol=1e-6)
    # strict mode raises on compressed formats
    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "image/png")


def test_png_roundtrip_all_channel_counts():
    """encode_png -> decode_png is identity for gray/GA/RGB/RGBA."""
    from sits_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(9)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        if c == 1:
            got = decode_png(encode_png(img[:, :, 0]))
            np.testing.assert_array_equal(got, img[:, :, 0])
        else:
            got = decode_png(encode_png(img))
            np.testing.assert_array_equal(got, img)


def test_png_all_five_filters_decode():
    """Hand-assemble a PNG whose rows use filters 0..4 and compare the
    decode against a straightforward scalar reference unfilter."""
    import struct
    import zlib

    from sits_ray.stages.multimodal import _PNG_SIG, decode_png

    rng = np.random.default_rng(10)
    h, w, c = 5, 7, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.int32)

    # scalar reference FILTER (encode side), one filter type per row
    def filt(y, f):
        row = img[y].reshape(-1)
        prev = img[y - 1].reshape(-1) if y else np.zeros(w * c, np.int32)
        out = np.zeros(w * c, np.int32)
        for i in range(w * c):
            a = row[i - c] if i >= c else 0      # left (recon == raw here)
            b = prev[i]                           # up
            cc = prev[i - c] if i >= c else 0     # upper-left
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
            out[i] = (row[i] - pred) % 256
        return bytes([f]) + bytes(out.astype(np.uint8))

    raw = b"".join(filt(y, y % 5) for y in range(h))

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    np.testing.assert_array_equal(got, img.astype(np.uint8))


def test_media_features_png_path(ray_session):
    """PNG rows flow through the actor feature stage for real."""
    import ray.data as rd

    from sits_ray.stages.multimodal import extract_features, synth_media_table

    t = synth_media_table(n=24)
    assert "image/png" in set(t["mime"].to_pylist())
    out = extract_features(rd.from_arrow(t), batch_size=8).to_pandas()
    assert len(out) == 24
    png_rows = out[out["mime"] == "image/png"]
    assert len(png_rows) > 0 and png_rows["std_intensity"].gt(0).all()


def test_video_roundtrip_and_offsets():
    import numpy as np

    from sits_ray.stages.multimodal import (
        decode_video_frame,
        encode_ppm_video,
        video_frame_offsets,
    )

    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
              for h, w in ((8, 10), (8, 10), (5, 7))]
    payload = encode_ppm_video(frames)
    offs = video_frame_offsets(payload)
    assert len(offs) == 3
    for f, o in zip(frames, offs):
        np.testing.assert_array_equal(decode_video_frame(payload, o), f)


def test_sample_frame_indices_rules():
    import numpy as np

    from sits_ray.stages.multimodal import sample_frame_indices

    np.testing.assert_array_equal(sample_frame_indices(3, 4), [0, 1, 2])
    idx = sample_frame_indices(11, 4)
    assert idx[0] == 0 and idx[-1] == 10 and len(idx) == 4
    assert (np.diff(idx) > 0).all()


def test_frame_sampler_actor_pool(ray_session):
    import numpy as np
    import ray.data as rd

    from sits_ray.stages.multimodal import sample_frames, synth_video_table

    tbl = synth_video_table(n=10, seed=9)
    out = sample_frames(rd.from_arrow(tbl), n_sample=3).to_pandas()
    # per clip: min(n_frames, 3) rows, frame 0 always present, idx < n
    exp = dict(zip(tbl["media_id"].to_pylist(), tbl["n_frames"].to_pylist()))
    for mid, g in out.groupby("media_id"):
        n = exp[mid]
        assert len(g) == min(n, 3)
        assert 0 in set(g.frame_idx)
        assert (g.frame_idx < n).all()
        assert (g.n_frames == n).all()
        assert (g.feature.str.len() == 64).all()


# --- aHash perceptual near-dup --------------------------------------------------

def test_ahash_invariant_to_brightness_shift():
    from sits_ray.stages.multimodal import ahash64

    rng = np.random.default_rng(3)
    img = rng.integers(30, 200, size=(24, 20, 3), dtype=np.uint8)
    up = np.clip(img.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    # uniform brightness shift preserves which cells beat the mean
    assert ahash64(img) == ahash64(up)


def test_ahash_planted_dups_found_no_cross_pairs(ray_session):
    import ray.data as rd
    from sits_ray.stages.multimodal import (ahash_image_dups,
                                            synth_image_dup_table)

    tbl = synth_image_dup_table(n=48, seed=17)
    out = ahash_image_dups(rd.from_arrow(tbl))
    planted = {(i - 1, i) for i in range(2, 48, 3)}
    got = set(zip(out["media_a"], out["media_b"]))
    # every planted noised copy is recovered
    assert planted <= got
    # planted pairs sit at tiny Hamming distance
    pl = out[[(a, b) in planted for a, b in zip(out["media_a"],
                                                out["media_b"])]]
    assert (pl["hamming"] <= 6).all()
    # random independent rasters never collide at <= 10 bits here
    assert got - planted == set()


def test_ahash_dups_batching_invariance(ray_session):
    import ray.data as rd
    from sits_ray.stages.multimodal import (ahash_image_dups,
                                            synth_image_dup_table)

    tbl = synth_image_dup_table(n=30, seed=5)
    one = ahash_image_dups(rd.from_arrow(tbl))
    many = ahash_image_dups(rd.from_arrow(tbl).repartition(7))
    pd.testing.assert_frame_equal(one, many)
