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


# --- tier demotion (cascade-then-expire) --------------------------------------

@pytest.fixture(scope="module")
def demote_store(ray_session, transcripts_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("demote_store"))
    run_flagship(transcripts_dir, out, tiers=("1m",), n_parts=4, gapfill=False)
    return out


def _hour_cutoff(out):
    pdf = read_tier(out, "1m").to_pandas()
    return pdf, pdf["bucket_ts"].quantile(0.5).floor("h")


def test_demote_moves_history_and_matches_cascade(demote_store):
    from sits_ray.pipelines.retention import retention_demote

    before, cutoff = _hour_cutoff(demote_store)
    res = retention_demote(demote_store, np.datetime64(cutoff, "us"))
    assert res["parts_demoted"] == 4 and res["rows_dropped"] > 0

    after_1m = read_tier(demote_store, "1m").to_pandas()
    assert (after_1m["bucket_ts"] >= cutoff).all()
    assert len(after_1m) == (before["bucket_ts"] >= cutoff).sum()

    got_1h = read_tier(demote_store, "1h").to_pandas()
    assert (got_1h["bucket_ts"] < cutoff).all()
    # cascade semantics: per (conv, hour) turn_count = sum of minute counts
    old = before[before["bucket_ts"] < cutoff]
    want = (
        old.groupby(["conv_id", old["bucket_ts"].dt.floor("h")])["turn_count"]
        .sum().reset_index()
    )
    g = got_1h.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    w = want.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    assert g["turn_count"].tolist() == w["turn_count"].tolist()
    assert (g["conv_id"].to_numpy() == w["conv_id"].to_numpy()).all()
    # blocks stay consistent with long after the expiry half
    blocks_1m = read_tier_blocks(demote_store, "1m").to_pandas()
    assert len(blocks_1m) == len(after_1m)


def test_demote_idempotent_and_watermarked(demote_store):
    from sits_ray.pipelines.retention import retention_demote

    # the cutoff the first demotion used = every 1m entry's watermark
    marks = {e.expired_to_us for e in Manifest(demote_store).entries()
             if e.tier == "1m"}
    assert len(marks) == 1 and marks != {0}
    cutoff = np.datetime64(marks.pop(), "us")
    before_1h = read_tier(demote_store, "1h").to_pandas()
    res = retention_demote(demote_store, cutoff)
    # every partition already watermarked at this cutoff -> all skipped
    assert res["parts_demoted"] == 0 and res["parts_skipped"] == 4
    after_1h = read_tier(demote_store, "1h").to_pandas()
    assert len(after_1h) == len(before_1h)


def test_demote_rejects_unaligned_and_built_target(
        ray_session, transcripts_dir, tmp_path_factory):
    from sits_ray.pipelines.retention import retention_demote

    out = str(tmp_path_factory.mktemp("demote_guard"))
    run_flagship(transcripts_dir, out, tiers=("1m", "1h"), n_parts=2,
                 gapfill=False)
    pdf = read_tier(out, "1m").to_pandas()
    cutoff = pdf["bucket_ts"].quantile(0.5).floor("h")
    with pytest.raises(ValueError, match="aligned"):
        retention_demote(
            out, np.datetime64(cutoff, "us") + np.timedelta64(61, "s")
        )
    with pytest.raises(ValueError, match="already has a built"):
        retention_demote(out, np.datetime64(cutoff, "us"))
