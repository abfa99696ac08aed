"""Stage-1 ref fan-out coalescing (VERDICT r4 next-round item #2):
grouping input files into fewer stage-1 tasks must be invisible in the
output — byte-identical tiers with and without grouping, with and
without salting — and the grouping arithmetic must respect both the
ref budget and the parallelism floor."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from sits_ray.stages.exchange import (
    _coalesce_paths,
    rollup_exchange,
    rollup_exchange_fused,
)

TIERS = ("1m", "1h", "1d")


def test_coalesce_arithmetic():
    paths = [f"f{i:03d}" for i in range(64)]
    # under budget: identity grouping
    g = _coalesce_paths(paths, n_parts=16, max_stage1_refs=64 * 16)
    assert [len(x) for x in g] == [1] * 64
    # over budget: groups = max_refs // n_parts, contiguous, disjoint,
    # order-preserving, covering
    g = _coalesce_paths(paths, n_parts=16, max_stage1_refs=256,
                        min_groups=4)
    assert len(g) == 16
    flat = [p for grp in g for p in grp]
    assert flat == paths
    # parallelism floor wins over the ref budget
    g = _coalesce_paths(paths, n_parts=16, max_stage1_refs=16,
                        min_groups=8)
    assert len(g) == 8
    # None disables
    g = _coalesce_paths(paths, n_parts=16, max_stage1_refs=None)
    assert len(g) == 64


def _nested_to_df(nested):
    df = nested.to_pandas()
    keys = [c for c in ("tier", "part_id", "conv_id", "salt")
            if c in df.columns]
    return df.sort_values(keys).reset_index(drop=True)


def test_grouped_exchange_identical_nested(ray_session, transcripts_dir):
    paths = sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))
    assert len(paths) == 4
    a, rows_a = rollup_exchange(paths, tiers=TIERS, n_parts=8,
                                max_stage1_refs=None)
    b, rows_b = rollup_exchange(paths, tiers=TIERS, n_parts=8,
                                max_stage1_refs=8, )  # forces 2 tasks min_groups=cpus=4
    assert rows_a == rows_b
    da, db = _nested_to_df(a), _nested_to_df(b)
    pd.testing.assert_frame_equal(da, db)


def test_grouped_exchange_identical_salted(ray_session, transcripts_dir):
    """Global heavy detection + succession map make donor routing
    independent of which task read which file."""
    paths = sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))
    kw = dict(tiers=TIERS, n_parts=8, salt_turn_threshold=40,
              salt_window_us=7 * 86_400_000_000)
    a, _ = rollup_exchange(paths, max_stage1_refs=None, **kw)
    b, _ = rollup_exchange(paths, max_stage1_refs=8, **kw)
    da, db = _nested_to_df(a), _nested_to_df(b)
    pd.testing.assert_frame_equal(da, db)


def test_grouped_fused_identical_files(ray_session, transcripts_dir,
                                       tmp_path):
    """Fused path: written tier files byte-identical grouped vs not."""
    paths = sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    rollup_exchange_fused(paths, out_a, tiers=TIERS, n_parts=8,
                          max_stage1_refs=None)
    rollup_exchange_fused(paths, out_b, tiers=TIERS, n_parts=8,
                          max_stage1_refs=8)
    fa = sorted(glob.glob(os.path.join(out_a, "**", "*.parquet"),
                          recursive=True))
    fb = sorted(glob.glob(os.path.join(out_b, "**", "*.parquet"),
                          recursive=True))
    rel_a = [os.path.relpath(p, out_a) for p in fa]
    rel_b = [os.path.relpath(p, out_b) for p in fb]
    assert rel_a == rel_b and len(rel_a) > 0
    for pa_, pb_ in zip(fa, fb):
        with open(pa_, "rb") as f1, open(pb_, "rb") as f2:
            assert f1.read() == f2.read(), os.path.relpath(pa_, out_a)
