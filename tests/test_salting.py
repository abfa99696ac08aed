import glob

import numpy as np
import pandas as pd
import pytest

from sits_ray.stages.exchange import rollup_exchange
from sits_ray.stages.regularize import nested_to_long
from sits_ray.synth import write_transcripts_scaled

SORT = ["conv_id", "tier", "bucket_ts"]
HOUR_US = 3_600_000_000


@pytest.fixture(scope="module")
def sharded_dir(ray_session, tmp_path_factory):
    # conversation-sharded files (each conv fully inside one file) with a
    # mega-conversation in file 0 — the salting assumption holds
    d = str(tmp_path_factory.mktemp("salt_in"))
    write_transcripts_scaled(d, n_convs=60, mean_turns=30, seed=42, files=6)
    return d


def _long(paths, gapfill, salt):
    nested, counts = rollup_exchange(
        paths,
        tiers=("1m", "1h"),
        gapfill=gapfill,
        n_parts=16,
        salt_turn_threshold=(100 if salt else None),
        salt_window_us=HOUR_US,  # multiple of the coarsest tier used here (1h)
    )
    df = nested_to_long(nested).to_pandas()
    return df.sort_values(SORT).reset_index(drop=True), counts


def test_salting_splits_mega_conv(ray_session, sharded_dir):
    paths = sorted(glob.glob(sharded_dir + "/*.parquet"))
    _, counts_plain = _long(paths, False, salt=False)
    _, counts_salted = _long(paths, False, salt=True)
    # salting spreads the mega conversation across more partitions and
    # shrinks the biggest partition
    assert max(counts_salted.values()) < max(counts_plain.values())
    assert len(counts_salted) >= len(counts_plain)


def test_salted_equals_unsalted_observed(ray_session, sharded_dir):
    """No gap-fill: salted output must equal the unsalted output exactly
    (windows align to bucket edges; donors carry exact predecessor ts)."""
    paths = sorted(glob.glob(sharded_dir + "/*.parquet"))
    plain, _ = _long(paths, False, salt=False)
    salted, _ = _long(paths, False, salt=True)
    salted = salted.drop(columns=["part_id"])
    plain = plain.drop(columns=["part_id"])
    pd.testing.assert_frame_equal(plain, salted)


def test_salted_gapfill_observed_rows_exact(ray_session, sharded_dir):
    """Gap-fill: observed (non-filled) rows identical; filled rows may
    differ only where a silence crosses a salt-window boundary (per-window
    grids; documented)."""
    paths = sorted(glob.glob(sharded_dir + "/*.parquet"))
    plain, _ = _long(paths, True, salt=False)
    salted, _ = _long(paths, True, salt=True)
    po = plain[~plain.filled].drop(columns=["part_id"]).reset_index(drop=True)
    so = salted[~salted.filled].drop(columns=["part_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(po, so)
    # every salted filled row also exists in the plain filled set
    key = ["conv_id", "tier", "bucket_ts"]
    pf = set(map(tuple, plain[plain.filled][key].itertuples(index=False)))
    sf = set(map(tuple, salted[salted.filled][key].itertuples(index=False)))
    assert sf <= pf


def _write_crossfile(tmpdir):
    """One mega-conv ALTERNATING between two files (per-file counts below
    the global threshold), with a 3-window silence, plus a conv heavy in
    file0 alone that also has a few turns in file1 (the round-2 hazard:
    per-file salting would split it inconsistently)."""
    rng = np.random.default_rng(7)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    rows0, rows1 = [], []
    # mega: 120 turns over ~10h, then a 3h silence, then 20 more turns
    t = base
    for i in range(140):
        t = t + np.timedelta64(int(rng.integers(60, 360)), "s")
        if i == 120:
            t = t + np.timedelta64(3, "h")  # silence spanning >1 salt window
        (rows0 if i % 2 == 0 else rows1).append(("mega", i, t, ""))
    # spread: 60 turns in file0 (heavy there), 5 stragglers in file1
    t = base
    for i in range(65):
        t = t + np.timedelta64(int(rng.integers(120, 600)), "s")
        (rows0 if i < 60 else rows1).append(("spread", i, t, "tool" if i % 7 == 0 else ""))
    # background convs, one per file
    for j, rows in enumerate((rows0, rows1)):
        t = base
        for i in range(20):
            t = t + np.timedelta64(int(rng.integers(300, 900)), "s")
            rows.append((f"bg{j}", i, t, ""))
    paths = []
    for j, rows in enumerate((rows0, rows1)):
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "tool"])
        p = f"{tmpdir}/part-{j}.parquet"
        df.to_parquet(p)
        paths.append(p)
    return paths


def test_detect_heavy_convs_global(ray_session, tmp_path):
    from sits_ray.stages.exchange import detect_heavy_convs

    paths = _write_crossfile(str(tmp_path))
    heavy, succ = detect_heavy_convs(paths, 100, window_us=HOUR_US)
    # mega: 70 turns/file -> only globally heavy; spread: 60+5; bg: 20
    assert heavy == frozenset({"mega"})
    ws = sorted(set(succ["mega"]) | set(succ["mega"].values()))
    assert len(ws) >= 5  # spans many hourly windows
    # succession skips the silent windows
    assert all(succ["mega"][a] > a for a in succ["mega"])


def test_crossfile_mega_conv_salted_exact(ray_session, tmp_path):
    """VERDICT r2 next #5: a conv split across two parquet files salts
    consistently (global detection) and matches the unsalted output
    EXACTLY, including latencies across window boundaries whose
    predecessor turn lives in the other file and across a multi-window
    silence (donor routed via the global window-succession map)."""
    paths = _write_crossfile(str(tmp_path))

    def run(salt, threshold=100):
        nested, counts = rollup_exchange(
            paths, tiers=("1m", "1h"), gapfill=False, n_parts=8,
            salt_turn_threshold=(threshold if salt else None),
            salt_window_us=HOUR_US,
        )
        df = nested_to_long(nested).to_pandas()
        return df.drop(columns=["part_id"]).sort_values(SORT).reset_index(drop=True), counts

    plain, _ = run(False)
    salted, counts = run(True)
    pd.testing.assert_frame_equal(plain, salted)
    # and the mega conv was indeed split across partitions
    from sits_ray.stages.exchange import detect_heavy_convs
    heavy, _ = detect_heavy_convs(paths, 100, window_us=HOUR_US)
    assert "mega" in heavy


def test_crossfile_straggler_rows_consistent(ray_session, tmp_path):
    """The round-2 hazard: a conv heavy in ONE file with stragglers in
    another must not emit duplicate (conv, bucket) rows. With global
    detection at threshold 50 both files salt 'spread' identically."""
    paths = _write_crossfile(str(tmp_path))

    def run(salt):
        nested, _ = rollup_exchange(
            paths, tiers=("1h",), gapfill=False, n_parts=8,
            salt_turn_threshold=(50 if salt else None),
            salt_window_us=HOUR_US,
        )
        return nested_to_long(nested).to_pandas()

    plain = run(False)
    salted = run(True)
    key = ["conv_id", "tier", "bucket_ts"]
    assert not salted.duplicated(subset=key).any()
    pd.testing.assert_frame_equal(
        plain.drop(columns=["part_id"]).sort_values(SORT).reset_index(drop=True),
        salted.drop(columns=["part_id"]).sort_values(SORT).reset_index(drop=True),
    )


def test_dedup_never_drops_live_row_shadowed_by_donor(ray_session, tmp_path):
    """A live replay sharing the donor's turn_idx in a salted window must
    survive dedup=True — only live-vs-live byte-identical replays dedup
    (r4 review: the donor would otherwise shadow-delete the live turn)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "in"
    d.mkdir()
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(HOUR_US, "us")
    # conv c0: 120 turns in hour-window 0 (heavy at threshold 100), then
    # in window 1 a REPLAY of the last turn (turn_idx 119) at a NEW ts
    # plus one normal turn
    ts = [base + np.timedelta64(i * 20, "s") for i in range(120)]
    idx = list(range(120))
    ts += [base + h + np.timedelta64(60, "s"), base + h + np.timedelta64(120, "s")]
    idx += [119, 120]  # replayed turn_idx at a new ts, then a new turn
    tbl = pa.table(
        {
            "conv_id": pa.array(["c0"] * len(ts)),
            "turn_idx": pa.array(idx, pa.int32()),
            "tool": pa.array([""] * len(ts)),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(d / "f0.parquet"))
    nested, _ = rollup_exchange(
        [str(d / "f0.parquet")],
        tiers=("1h",),
        gapfill=False,
        dedup=True,
        n_parts=4,
        salt_turn_threshold=100,
        salt_window_us=HOUR_US,
    )
    out = nested_to_long(nested).to_pandas()
    w1 = out[out.bucket_ts == pd.Timestamp("2024-01-01 01:00:00")]
    # both live rows of window 1 must be counted (the donor is weighted out)
    assert int(w1["turn_count"].iloc[0]) == 2
