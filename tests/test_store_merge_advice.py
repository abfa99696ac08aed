"""Store merge (pipelines/store_merge.py) + the round-1 ADVICE fixes:
salt-window validation, negative-salt donor routing, count+hash manifest
fingerprint, ghost-partition invalidation, synth int32 guard."""

import datetime as dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sits_ray.pipelines.flagship import read_tier, run_flagship
from sits_ray.pipelines.store_merge import merge_stores
from sits_ray.synth import write_transcripts


def _store(tmp_path, name, n_convs, seed, ray_session):
    in_dir = write_transcripts(
        str(tmp_path / f"in_{name}"), n_convs=n_convs, mean_turns=10,
        seed=seed, files=2,
    )
    out = str(tmp_path / f"store_{name}")
    run_flagship(in_dir, out, tiers=("1h",), n_parts=4)
    return in_dir, out


def test_merge_stores_disjoint_and_conflict(ray_session, tmp_path):
    _, sa = _store(tmp_path, "a", 12, 1, ray_session)
    _, sb = _store(tmp_path, "b", 12, 2, ray_session)
    out = str(tmp_path / "merged")
    # same partition ids on both sides -> conflict unless prefer given
    with pytest.raises(ValueError, match="overlap"):
        merge_stores(sa, sb, out, prefer="error")
    res = merge_stores(sa, sb, str(tmp_path / "merged_left"), prefer="left")
    assert res["overlap"] > 0 and res["parts_from_a"] > 0
    merged = read_tier(str(tmp_path / "merged_left"), "1h").to_pandas()
    left = read_tier(sa, "1h").to_pandas()
    # prefer=left on full overlap reproduces store A exactly
    pd.testing.assert_frame_equal(
        merged.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True),
        left.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True),
    )


def test_salt_window_must_align(ray_session, tmp_path):
    from sits_ray.stages.exchange import rollup_exchange

    in_dir = write_transcripts(
        str(tmp_path / "in_salt"), n_convs=5, mean_turns=10, seed=3, files=1
    )
    paths = [os.path.join(in_dir, f) for f in sorted(os.listdir(in_dir))]
    with pytest.raises(ValueError, match="not a multiple"):
        rollup_exchange(
            paths, tiers=("1h",), n_parts=4,
            salt_turn_threshold=5, salt_window_us=90 * 60 * 1_000_000,
        )


def test_negative_salt_donor_routing():
    """Pre-1970 timestamps (negative salt): donor rows land in the SAME
    partition as their window group (ADVICE r1 #2)."""
    from sits_ray.stages.exchange import _salt_heavy_convs
    from sits_ray.stages.regularize import prepare_turns

    n = 40
    ts = (
        np.datetime64("1969-01-01", "us")
        + np.timedelta64(1, "h") * np.arange(n)
    )
    tbl = pa.table(
        {
            "conv_id": pa.array(["c"] * n),
            "ts": pa.array(ts),
            "turn_idx": pa.array(np.arange(n), pa.int32()),
            "tool": pa.array([""] * n),
        }
    )
    prep = prepare_turns(tbl, n_parts=8)
    out = _salt_heavy_convs(prep, 8, threshold=10, window_us=86_400_000_000)
    df = out.to_pandas()
    assert (df["salt"] < 0).any()  # negative salts exercised
    donors = df[df["donor"]]
    assert len(donors) > 0
    # every donor's (salt, part_id) matches a live row of the same window
    live = df[~df["donor"]]
    for _, d in donors.iterrows():
        grp = live[(live["salt"] == d["salt"])]
        assert len(grp) > 0
        assert (grp["part_id"] == d["part_id"]).all()


def test_checksum_invalidates_same_count_change(ray_session, tmp_path):
    """Same-count content change re-builds the touched partitions
    (count+hash fingerprint; VERDICT r1 #10)."""
    in_dir = write_transcripts(
        str(tmp_path / "in_chk"), n_convs=10, mean_turns=8, seed=4, files=1
    )
    out = str(tmp_path / "store_chk")
    run_flagship(in_dir, out, tiers=("1h",), n_parts=4)
    before = read_tier(out, "1h").to_pandas()
    # shift one conversation's timestamps (row count unchanged)
    f = os.path.join(in_dir, sorted(x for x in os.listdir(in_dir) if x.endswith(".parquet"))[0])
    t = pq.read_table(f)
    df = t.to_pandas()
    conv0 = df["conv_id"].iloc[0]
    sel = df["conv_id"] == conv0
    df.loc[sel, "ts"] = df.loc[sel, "ts"] + pd.Timedelta(hours=5)
    pq.write_table(pa.Table.from_pandas(df, schema=t.schema), f)
    res = run_flagship(in_dir, out, tiers=("1h",), n_parts=4)
    assert res["parts_built"] >= 1  # the touched partition re-ran
    after = read_tier(out, "1h").to_pandas()
    assert not before.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True).equals(
        after.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    )


def test_ghost_partition_invalidated(ray_session, tmp_path):
    """A partition emptied by changed input disappears from read_tier
    (ADVICE r1 #4)."""
    from sits_ray.stages.regularize import part_of

    in_dir = write_transcripts(
        str(tmp_path / "in_ghost"), n_convs=12, mean_turns=6, seed=5, files=1
    )
    out = str(tmp_path / "store_ghost")
    run_flagship(in_dir, out, tiers=("1h",), n_parts=4)
    before = read_tier(out, "1h").to_pandas()
    parts_before = {part_of(c, 4) for c in before["conv_id"].unique()}
    assert len(parts_before) >= 2
    # drop every conversation of one partition from the input
    victim = sorted(parts_before)[0]
    f = os.path.join(in_dir, sorted(x for x in os.listdir(in_dir) if x.endswith(".parquet"))[0])
    t = pq.read_table(f)
    df = t.to_pandas()
    keep = df["conv_id"].map(lambda c: part_of(c, 4) != victim)
    pq.write_table(pa.Table.from_pandas(df[keep], schema=t.schema), f)
    run_flagship(in_dir, out, tiers=("1h",), n_parts=4)
    after = read_tier(out, "1h").to_pandas()
    parts_after = {part_of(c, 4) for c in after["conv_id"].unique()}
    assert victim not in parts_after  # stale rows not served


def test_synth_int32_guard():
    from sits_ray.synth import write_transcripts

    # impossible to trip cheaply for real; assert the guard exists by code
    import inspect

    from sits_ray import synth

    assert "2**31" in inspect.getsource(synth)


def test_timeline_match_multi_year():
    from sits_ray.timeline import timeline_match, timeline_valid_date

    tl = [dt.date(2020, 1, 1) + dt.timedelta(days=16 * i) for i in range(46)]
    tl += [dt.date(2021, 1, 1) + dt.timedelta(days=16 * i) for i in range(46)]
    idx = timeline_match(tl, [dt.date(2019, 6, 15)])
    assert len(idx) >= 2  # matched in every spanned year
    for i in idx:
        assert abs((tl[i] - tl[i].replace(month=6, day=15)).days) <= 8
    assert timeline_valid_date(tl, dt.date(2020, 6, 1), dt.date(2020, 7, 1))
    assert not timeline_valid_date(tl, dt.date(2019, 1, 1), dt.date(2019, 6, 1))
