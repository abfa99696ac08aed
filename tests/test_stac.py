"""Static STAC catalog source (sits_ray/stac.py): publish from footers,
search by collection + time overlap, pruned reads."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sits_ray.stac import publish_stac, read_stac, stac_search


@pytest.fixture(scope="module")
def catalog(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("stac_src")
    for name, (d0, d1) in {
        "jan": ("2024-01-01", "2024-01-31"),
        "feb": ("2024-02-01", "2024-02-28"),
        "mar": ("2024-03-01", "2024-03-31"),
    }.items():
        ts = pd.date_range(d0, d1, freq="D")
        pq.write_table(
            pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                      "v": np.arange(len(ts), dtype=np.int64),
                      "conv": [name] * len(ts)}),
            str(d / f"{name}.parquet"),
        )
    ts2 = pd.date_range("2024-01-10", "2024-01-20", freq="D")
    other = tmp_path_factory.mktemp("stac_src2")
    pq.write_table(
        pa.table({"ts": pa.array(ts2, pa.timestamp("us")),
                  "v": np.arange(len(ts2), dtype=np.int64),
                  "conv": ["aux"] * len(ts2)}),
        str(other / "aux.parquet"),
    )
    root = str(tmp_path_factory.mktemp("stac_cat"))
    cpath = publish_stac(root, {"events": str(d), "aux": str(other)})
    return cpath


def test_catalog_structure(catalog):
    cat = json.load(open(catalog))
    assert cat["type"] == "Catalog" and cat["stac_version"] == "1.0.0"
    root = os.path.dirname(catalog)
    coll = json.load(open(os.path.join(root, "events", "collection.json")))
    assert coll["type"] == "Collection"
    assert coll["extent"]["temporal"]["interval"][0][0].startswith("2024-01-01")
    item = json.load(open(os.path.join(root, "events", "items", "jan.json")))
    assert item["type"] == "Feature"
    assert item["properties"]["table:row_count"] == 31
    assert os.path.exists(item["assets"]["data"]["href"])


def test_search_time_and_collection(catalog):
    allhits = stac_search(catalog)
    assert [i["id"] for i in allhits] == ["aux", "feb", "jan", "mar"]
    hits = stac_search(catalog, collections=["events"],
                       datetime=("2024-02-10", "2024-03-05"))
    assert [i["id"] for i in hits] == ["feb", "mar"]
    assert stac_search(catalog, datetime=(None, "2024-02-01"),
                       collections=["events"])[0]["id"] == "jan"
    assert len(stac_search(catalog, limit=2)) == 2


def test_read_stac_pruned(catalog):
    hits = stac_search(catalog, collections=["events"],
                       datetime=("2024-02-10", "2024-03-05"))
    ds = read_stac(hits, columns=["ts", "v"],
                   datetime=("2024-02-10", "2024-03-05"))
    pdf = ds.to_pandas()
    assert set(pdf.columns) == {"ts", "v"}
    assert pdf["ts"].min() >= pd.Timestamp("2024-02-10")
    assert pdf["ts"].max() < pd.Timestamp("2024-03-05")
    # only feb+mar assets were opened: jan rows can't appear even unfiltered
    ds_nofilter = read_stac(hits)
    assert set(ds_nofilter.to_pandas()["conv"]) == {"feb", "mar"}
