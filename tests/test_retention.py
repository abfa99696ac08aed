import glob
import os

import numpy as np
import pandas as pd
import pytest

from sits_ray.pipelines.flagship import read_tier, read_tier_blocks, run_flagship
from sits_ray.pipelines.retention import retention_expire
from sits_ray.state.manifest import Manifest

TIERS = ("1m", "1h", "1d")


@pytest.fixture(scope="module")
def store(ray_session, transcripts_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("retention_store"))
    run_flagship(transcripts_dir, out, tiers=TIERS, n_parts=4)
    return out


def _median_ts(out, tier):
    pdf = read_tier(out, tier).to_pandas()
    return pdf, pdf["bucket_ts"].quantile(0.5).floor("min")


def test_expire_drops_old_points_long_and_blocks(store):
    pdf_before, cutoff = _median_ts(store, "1m")
    res = retention_expire(store, {"1m": np.datetime64(cutoff, "us")})
    assert res["parts_expired"] > 0
    assert res["tiers"]["1m"]["rows_dropped"] > 0

    pdf_after = read_tier(store, "1m").to_pandas()
    assert (pdf_after["bucket_ts"] >= cutoff).all()
    exp = pdf_before[pdf_before["bucket_ts"] >= cutoff]
    assert len(pdf_after) == len(exp)

    # block store stays bit-consistent with the long store
    blk = read_tier_blocks(store, "1m").to_pandas()
    cols = ["conv_id", "bucket_ts", "mean_latency", "turn_count"]
    a = blk[cols].sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    b = pdf_after[cols].sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # untouched tiers keep everything
    assert (read_tier(store, "1d").to_pandas()["bucket_ts"] < cutoff).any()


def test_expire_idempotent_and_watermarked(store):
    pdf, _ = _median_ts(store, "1m")
    cutoff = np.datetime64(pdf["bucket_ts"].min(), "us")  # older than watermark
    man = Manifest(store)
    wm_before = {(e.tier, e.part_id): e.expired_to_us for e in man.entries()}
    res = retention_expire(store, {"1m": cutoff})
    # every 1m partition already expired past this cutoff -> all skipped
    assert res["parts_expired"] == 0 and res["parts_skipped"] > 0
    wm_after = {(e.tier, e.part_id): e.expired_to_us for e in man.entries()}
    assert wm_after == wm_before


def test_expire_advances_with_newer_cutoff(store):
    pdf = read_tier(store, "1m").to_pandas()
    # move the cutoff forward past another slice of buckets
    cutoff = np.datetime64(pdf["bucket_ts"].quantile(0.6).floor("min"), "us")
    res = retention_expire(store, {"1m": cutoff})
    assert res["parts_expired"] > 0
    after = read_tier(store, "1m").to_pandas()
    assert (after["bucket_ts"].to_numpy().astype("datetime64[us]") >= cutoff).all()
    # manifests record the new watermark and row counts
    man = Manifest(store)
    ents = [e for e in man.entries() if e.tier == "1m"]
    assert all(e.expired_to_us == int(cutoff.astype(np.int64)) for e in ents)
    assert sum(e.output_rows for e in ents) == len(after)
