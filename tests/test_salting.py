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
