import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from sits_ray.pipelines.partition_store import (
    dataset_text_digest,
    partition_transcripts,
    verify_text_integrity,
)
from sits_ray.stages.cascade import cascade_tier
from sits_ray.stages.regularize import nested_to_long, rollup_tiers
from sits_ray.synth import generate_transcripts

SORT = ["conv_id", "bucket_ts"]


@pytest.fixture(scope="module")
def tiers(ray_session):
    tbl = generate_transcripts(n_convs=30, mean_turns=25, seed=42)
    nested = rollup_tiers(rd.from_arrow(tbl), tiers=("1m", "1h"))
    long = nested_to_long(nested).to_pandas()
    return long[long.tier == "1m"], long[long.tier == "1h"]


def test_cascade_matches_direct_for_associative_stats(ray_session, tiers):
    long_1m, direct_1h = tiers
    casc = (
        cascade_tier(rd.from_pandas(long_1m), "1h")
        .to_pandas()
        .sort_values(SORT)
        .reset_index(drop=True)
    )
    d = direct_1h.sort_values(SORT).reset_index(drop=True)
    assert len(casc) == len(d)
    for c in ("conv_id", "bucket_ts", "turn_count", "tool_calls", "n_latency", "filled"):
        pd.testing.assert_series_equal(
            casc[c], d[c], check_names=False, check_dtype=False
        )
    # min/max exact; sums/means to 1 ulp (association order differs)
    for c in ("min_latency", "max_latency"):
        np.testing.assert_array_equal(
            np.isnan(casc[c].to_numpy()), np.isnan(d[c].to_numpy())
        )
        np.testing.assert_allclose(casc[c], d[c], rtol=0, atol=0, equal_nan=True)
    for c in ("sum_latency", "mean_latency"):
        np.testing.assert_allclose(casc[c], d[c], rtol=1e-12, equal_nan=True)
    # p95 is approximate and flagged
    assert (~casc["p95_exact"]).all()


def test_cascade_deterministic(ray_session, tiers):
    long_1m, _ = tiers
    a = cascade_tier(rd.from_pandas(long_1m), "1h").to_pandas().sort_values(SORT)
    b = cascade_tier(rd.from_pandas(long_1m), "1h").to_pandas().sort_values(SORT)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_text_integrity_roundtrip(ray_session, transcripts_dir, tmp_path):
    store = str(tmp_path / "store")
    partition_transcripts(transcripts_dir, store, n_parts=8)
    res = verify_text_integrity(transcripts_dir, store)
    assert res["equal"], res
    assert res["rows_src"] > 0


def test_text_integrity_detects_corruption(ray_session, transcripts_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    store = str(tmp_path / "store2")
    partition_transcripts(transcripts_dir, store, n_parts=4)
    # corrupt one turn's text in the store
    f = sorted(glob.glob(store + "/part_id=*/*.parquet"))[0]
    t = pq.ParquetFile(f).read()
    txt = t["text"].to_pylist()
    txt[0] = txt[0] + "!"
    t = t.drop_columns(["text"]).append_column("text", pa.array(txt, pa.string()))
    pq.write_table(t, f)
    res = verify_text_integrity(transcripts_dir, store)
    assert not res["equal"]
    assert res["rows_src"] == res["rows_store"]  # same count, different content


def test_digest_order_insensitive(ray_session):
    tbl = generate_transcripts(n_convs=8, mean_turns=6, seed=1)
    ds1 = rd.from_arrow(tbl)
    # same rows, different block layout and order
    ds2 = rd.from_arrow(tbl).random_shuffle(seed=3).repartition(5)
    assert dataset_text_digest(ds1) == dataset_text_digest(ds2)
