"""sits_cube_copy analog (pipelines/cube_copy.py): verbatim copy, time-ROI
crop of long + block stores, per-partition resume and invalidation."""

import os

import numpy as np
import pandas as pd
import pytest

from sits_ray.pipelines.cube_copy import cube_copy
from sits_ray.pipelines.flagship import read_tier, read_tier_blocks, run_flagship
from sits_ray.state.manifest import Manifest

TIERS = ("1m", "1h")


@pytest.fixture(scope="module")
def store(ray_session, transcripts_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("copy_src"))
    run_flagship(transcripts_dir, out, tiers=TIERS, n_parts=4)
    return out


def _tier_df(store_dir, tier):
    return (
        read_tier(store_dir, tier)
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_full_copy_identical_and_resumable(store, tmp_path):
    dst = str(tmp_path / "dst")
    res = cube_copy(store, dst)
    assert res["parts_copied"] > 0 and res["parts_skipped"] == 0
    for tier in TIERS:
        pd.testing.assert_frame_equal(_tier_df(store, tier), _tier_df(dst, tier))
    # second run: everything already copied
    res2 = cube_copy(store, dst)
    assert res2["parts_copied"] == 0
    assert res2["parts_skipped"] == res["parts_copied"]
    # one lost manifest entry -> exactly that partition re-copies
    man = Manifest(dst)
    e = man.entries()[0]
    os.remove(man._path(e.tier, e.part_id))
    res3 = cube_copy(store, dst)
    assert res3["parts_copied"] == 1


def test_time_roi_crop_long_and_blocks(store, tmp_path):
    src_df = _tier_df(store, "1m")
    lo = src_df["bucket_ts"].quantile(0.25).floor("min")
    hi = src_df["bucket_ts"].quantile(0.75).floor("min")
    dst = str(tmp_path / "crop")
    cube_copy(store, dst, tiers=("1m",),
              time_range=(np.datetime64(lo, "us"), np.datetime64(hi, "us")))

    got = _tier_df(dst, "1m")
    exp = src_df[(src_df["bucket_ts"] >= lo) & (src_df["bucket_ts"] < hi)]
    exp = exp.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

    # block store decodes to exactly the cropped long rows
    blk = read_tier_blocks(dst, "1m").to_pandas()
    cols = ["conv_id", "bucket_ts", "mean_latency", "turn_count"]
    a = blk[cols].sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    b = exp[cols].sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # a different window invalidates (config_fp mismatch) and re-copies
    res = cube_copy(store, dst, tiers=("1m",),
                    time_range=(np.datetime64(lo, "us"), None))
    assert res["parts_copied"] > 0 and res["parts_skipped"] == 0
    got2 = _tier_df(dst, "1m")
    exp2 = src_df[src_df["bucket_ts"] >= lo].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, exp2)


def test_tier_selection(store, tmp_path):
    dst = str(tmp_path / "one_tier")
    cube_copy(store, dst, tiers=("1h",))
    assert os.path.isdir(os.path.join(dst, "long", "tier=1h"))
    assert not os.path.isdir(os.path.join(dst, "long", "tier=1m"))
