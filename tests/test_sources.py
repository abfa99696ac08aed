"""Local fileset catalog (sits_ray/sources.py = sits_cube local analog)."""

import datetime as dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sits_ray.sources import open_catalog, prune_files, read_cube


@pytest.fixture(scope="module")
def fileset(tmp_path_factory):
    """3 files with disjoint, known time extents."""
    d = str(tmp_path_factory.mktemp("cube"))
    base = dt.datetime(2024, 1, 1)
    for i in range(3):
        ts = [base + dt.timedelta(days=10 * i, hours=h) for h in range(24)]
        t = pa.table(
            {
                "conv_id": pa.array([f"c{i}"] * 24),
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array(np.arange(24, dtype=np.float64)),
            }
        )
        pq.write_table(t, os.path.join(d, f"f{i}.parquet"))
    return d


def test_catalog_extents(ray_session, fileset):
    cat = open_catalog(fileset)
    assert cat.num_rows == 3
    assert cat["n_rows"].to_pylist() == [24, 24, 24]
    mns = cat["ts_min"].to_pylist()
    mxs = cat["ts_max"].to_pylist()
    assert mns[0] == dt.datetime(2024, 1, 1)
    assert mxs[0] == dt.datetime(2024, 1, 1, 23)
    assert mns[1] == dt.datetime(2024, 1, 11)


def test_prune_and_read(ray_session, fileset):
    cat = open_catalog(fileset)
    # window covering only file 1's extent
    lo, hi = dt.datetime(2024, 1, 11), dt.datetime(2024, 1, 12)
    files = prune_files(cat, lo, hi)
    assert [os.path.basename(f) for f in files] == ["f1.parquet"]
    df = read_cube(cat, lo, hi).to_pandas()
    assert len(df) == 24 and set(df["conv_id"]) == {"c1"}
    # residual predicate trims inside the kept file
    df2 = read_cube(cat, lo, dt.datetime(2024, 1, 11, 6)).to_pandas()
    assert len(df2) == 6
    # empty window -> empty dataset, zero files opened
    assert prune_files(cat, dt.datetime(2030, 1, 1), None) == []
    assert read_cube(cat, dt.datetime(2030, 1, 1), None).count() == 0


def test_read_cube_column_pruning(ray_session, fileset):
    cat = open_catalog(fileset)
    df = read_cube(cat, columns=["conv_id", "ts"]).to_pandas()
    assert list(df.columns) == ["conv_id", "ts"] and len(df) == 72
