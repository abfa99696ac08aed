"""Resumable block classification store (pipelines/classify_store.py =
sits_classify.raster_cube block resume, R/api_classify.R:120-122) and the
mosaic / re-grid ops (pipelines/mosaic.py)."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sits_ray.pipelines.classify_store import read_probs, run_classify_store
from sits_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def vec_store(tmp_path_factory):
    """3-file partitioned embedding store."""
    rng = np.random.default_rng(11)
    d = str(tmp_path_factory.mktemp("vecs"))
    for i in range(3):
        n = 40 + 10 * i
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n) + 1000 * i),
                "embedding": pa.array(list(rng.normal(size=(n, 8)).astype(np.float32))),
            }
        )
        pq.write_table(t, os.path.join(d, f"f{i}.parquet"))
    return d


@pytest.fixture(scope="module")
def model():
    from sits_ray.stages.classify import make_linear_model

    return make_linear_model(n_features=8, n_labels=3, seed=5)


def test_classify_store_builds_and_matches_direct(ray_session, vec_store, model, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("probs"))
    res = run_classify_store(vec_store, out, model)
    assert res == {"blocks_total": 3, "blocks_built": 3, "blocks_skipped": 0}

    got = read_probs(out).to_pandas().sort_values("vec_id").reset_index(drop=True)
    # direct scoring parity
    from sits_ray.stages.classify import SeriesScorer

    direct = pa.concat_tables(
        SeriesScorer(model)(pq.read_table(p))
        for p in sorted(glob.glob(os.path.join(vec_store, "*.parquet")))
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[direct.columns.tolist()], direct, check_dtype=False
    )


def test_classify_store_resume_and_invalidate(ray_session, vec_store, model, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("probs2"))
    run_classify_store(vec_store, out, model)
    files = sorted(glob.glob(os.path.join(out, "probs", "*", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in files}

    # unchanged input -> everything skipped, bytes untouched
    res2 = run_classify_store(vec_store, out, model)
    assert res2["blocks_built"] == 0 and res2["blocks_skipped"] == 3
    assert {f: os.path.getmtime(f) for f in files} == mtimes

    # drop one ledger entry -> exactly that block rebuilt
    Manifest(out).invalidate({1}, ("probs",))
    res3 = run_classify_store(vec_store, out, model)
    assert res3["blocks_built"] == 1

    # changed input content (same row count) -> fingerprint mismatch
    p0 = sorted(glob.glob(os.path.join(vec_store, "*.parquet")))[0]
    t = pq.read_table(p0)
    t = t.set_column(0, "vec_id", pa.array(t["vec_id"].to_numpy() + 7))
    pq.write_table(t, p0)
    res4 = run_classify_store(vec_store, out, model)
    assert res4["blocks_built"] == 1 and res4["blocks_skipped"] == 2


def test_mosaic_and_regrid(ray_session, transcripts_dir, tmp_path_factory):
    from sits_ray.pipelines.flagship import read_tier, run_flagship
    from sits_ray.pipelines.mosaic import mosaic_tier, read_regridded, regrid_store

    out = str(tmp_path_factory.mktemp("tiers"))
    run_flagship(transcripts_dir, out, tiers=("1h",), n_parts=8)
    full = read_tier(out, "1h").to_pandas()

    # mosaic: cropped consolidation equals a pandas crop of the tier
    lo = full["bucket_ts"].quantile(0.25)
    dest = str(tmp_path_factory.mktemp("mosaic"))
    n = mosaic_tier(out, dest, "1h", ts_lo=lo.to_pydatetime(), target_blocks=2)
    exp = full[full["bucket_ts"] >= lo]
    assert n == len(exp)
    files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 2

    # regrid: same rows, new partitioning, manifests written
    dest2 = str(tmp_path_factory.mktemp("regrid"))
    res = regrid_store(out, dest2, tiers=("1h",), n_parts_new=3)
    assert res["1h"] == len(full)
    got = read_regridded(dest2, "1h").to_pandas()
    got["part_id"] = got["part_id"].astype(int)
    assert set(got["part_id"].unique()) <= {0, 1, 2}
    cols = [c for c in full.columns if c != "part_id"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True),
        full[cols].sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True),
        check_dtype=False,
    )
    m = Manifest(dest2)
    assert {e.part_id for e in m.entries()} == set(got["part_id"].unique())
