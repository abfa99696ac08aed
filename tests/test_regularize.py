import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.reference_impl import rollup_reference
from sits_ray.stages.regularize import nested_to_long, rollup_tiers
from sits_ray.synth import generate_transcripts

TIERS = ("1m", "1h", "1d")
SORT = ["conv_id", "tier", "bucket_ts"]


@pytest.fixture(scope="module")
def table():
    return generate_transcripts(n_convs=40, mean_turns=20, seed=42)


def _long_df(tbl, **kw):
    ds = rd.from_arrow(tbl)
    nested = rollup_tiers(ds, tiers=TIERS, **kw)
    return (
        nested_to_long(nested)
        .to_pandas()
        .sort_values(SORT)
        .reset_index(drop=True)
    )


def test_bit_for_bit_vs_reference(ray_session, table):
    """Distributed rollup == single-process oracle at every tier (SURVEY.md §5)."""
    got = _long_df(table)
    exp = rollup_reference(table, tiers=TIERS).sort_values(SORT).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ("conv_id", "tier", "bucket_ts", "turn_count", "tool_calls", "filled", "part_id"):
        pd.testing.assert_series_equal(got[c], exp[c], check_names=False, check_dtype=False)
    for c in ("sum_latency", "mean_latency", "p95_latency", "min_latency", "max_latency"):
        # bit-for-bit: identical float bit patterns, NaNs aligned
        g = got[c].to_numpy()
        e = exp[c].to_numpy()
        np.testing.assert_array_equal(np.isnan(g), np.isnan(e), err_msg=c)
        np.testing.assert_allclose(g, e, rtol=0, atol=0, equal_nan=True, err_msg=c)


def test_parity_across_parallelism(ray_session, table):
    """Same result regardless of input block layout (SURVEY.md §7.5)."""
    a = _long_df(table)
    ds = rd.from_arrow(table).repartition(13)
    nested = rollup_tiers(ds, tiers=TIERS)
    b = nested_to_long(nested).to_pandas().sort_values(SORT).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_regular_spacing_and_no_na_after_gapfill(ray_session, table):
    """Invariants from reference test-regularize.R:190-201: regular bucket
    spacing per tier and no NA after gap-fill (for series with >=1 valid value)."""
    got = _long_df(table)
    for (conv, tier), g in got.groupby(["conv_id", "tier"]):
        ts = g["bucket_ts"].astype("int64").to_numpy()
        w = {"1m": 60e6, "1h": 3.6e9, "1d": 86.4e9}[tier]
        assert (np.diff(np.sort(ts)) == w).all(), (conv, tier)
        if g["mean_latency"].notna().any():
            assert g["mean_latency"].notna().all(), (conv, tier)


def test_filled_rows_have_zero_counts(ray_session, table):
    got = _long_df(table)
    f = got[got["filled"]]
    assert len(f) > 0  # the injected >1h gap guarantees empty 1m buckets
    assert (f["turn_count"] == 0).all()
    assert (f["tool_calls"] == 0).all()


def test_dedup_drops_replayed_turns(ray_session):
    tbl = generate_transcripts(n_convs=10, mean_turns=8, seed=42, dup_turns=25)
    base = generate_transcripts(n_convs=10, mean_turns=8, seed=42)
    got = _long_df(tbl, dedup=True)
    exp = _long_df(base)
    pd.testing.assert_frame_equal(got, exp)


def test_tier_consistency(ray_session, table):
    """Coarser tiers must re-aggregate the finer ones: per conv,
    sum(turn_count at 1m) == sum at 1h == sum at 1d == raw turns."""
    got = _long_df(table)
    raw = table.to_pandas().groupby("conv_id").size()
    per_tier = got.groupby(["conv_id", "tier"])["turn_count"].sum().unstack()
    for tier in TIERS:
        pd.testing.assert_series_equal(
            per_tier[tier], raw, check_names=False, check_dtype=False
        )


def test_compress_roundtrip_through_ray(ray_session, table):
    from sits_ray.stages.compressor import compress, decompress

    ds = rd.from_arrow(table)
    nested = rollup_tiers(ds, tiers=("1m",))
    # concurrency=1: two actor pools at the test's num_cpus=4 must not
    # reserve every CPU or the upstream tasks starve (see ray_guide.md)
    blocks = compress(nested, concurrency=1).materialize()
    back = decompress(blocks, concurrency=1)
    a = nested_to_long(nested).to_pandas().sort_values(SORT).reset_index(drop=True)
    b = nested_to_long(back).to_pandas().sort_values(SORT).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # compression actually compresses the regular grids
    bl = blocks.to_pandas()
    raw_bytes = (a.groupby(["conv_id", "tier"]).size() * (8 * 8)).sum()
    comp_bytes = sum(
        bl[c].map(len).sum() for c in bl.columns if c.endswith("_block") or c.startswith("val_")
    )
    assert comp_bytes < raw_bytes
