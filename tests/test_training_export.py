"""Training-shard export (pipelines/training_export.py): round-robin
interleave, pos-ordered block files, fingerprint resume, byte-identical
re-runs."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


def _docs(n=60):
    import ray.data as rd

    rng = np.random.default_rng(2)
    words = ["the", "and", "for", "alpha", "beta", "gamma", "delta",
             "tool", "turn", "latency"]
    texts = [" ".join(rng.choice(words, size=50)) for _ in range(n)]
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "text": texts}))


def _all_rows(out_dir):
    frames = []
    for p in sorted(glob.glob(os.path.join(out_dir, "shard-*",
                                           "block-*.parquet"))):
        s = int(os.path.basename(os.path.dirname(p)).split("-")[1])
        df = pq.read_table(p).to_pandas()
        df["shard"] = s
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def test_export_roundrobin_and_order(ray_session, tmp_path):
    from sits_ray.pipelines.training_export import export_training_shards

    out = str(tmp_path / "exp")
    res = export_training_shards(_docs(), out, n_shards=4, block_rows=8,
                                 curate=False)
    rows = _all_rows(out)
    assert res["n_rows"] == 60 and len(rows) == 60
    # every pos exactly once; shard = pos % 4; blocks ordered by pos
    assert sorted(rows["pos"]) == list(range(60))
    assert (rows["pos"] % 4 == rows["shard"]).all()
    for p in glob.glob(os.path.join(out, "shard-*", "block-*.parquet")):
        pos = pq.read_table(p).to_pandas()["pos"].to_numpy()
        assert (np.diff(pos) > 0).all()


def test_export_resume_and_byte_identity(ray_session, tmp_path):
    from sits_ray.pipelines.training_export import export_training_shards

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    r1 = export_training_shards(_docs(), out_a, n_shards=4, block_rows=8,
                                curate=False)
    assert r1["blocks_built"] == r1["blocks_total"] > 0

    # full resume: everything skipped, files untouched
    mt_before = {p: os.path.getmtime(p) for p in
                 glob.glob(os.path.join(out_a, "shard-*", "*.parquet"))}
    r2 = export_training_shards(_docs(), out_a, n_shards=4, block_rows=8,
                                curate=False)
    assert r2["blocks_built"] == 0
    assert r2["blocks_skipped"] == r1["blocks_total"]
    for p, t in mt_before.items():
        assert os.path.getmtime(p) == t

    # kill one block: exactly it rebuilds, byte-identical to a fresh run
    victim = sorted(glob.glob(os.path.join(out_a, "shard-0000",
                                           "*.parquet")))[0]
    os.remove(victim)
    r3 = export_training_shards(_docs(), out_a, n_shards=4, block_rows=8,
                                curate=False)
    assert r3["blocks_built"] == 1

    export_training_shards(_docs(), out_b, n_shards=4, block_rows=8,
                           curate=False)
    fa = sorted(glob.glob(os.path.join(out_a, "shard-*", "*.parquet")))
    fb = sorted(glob.glob(os.path.join(out_b, "shard-*", "*.parquet")))
    assert [os.path.relpath(p, out_a) for p in fa] == \
           [os.path.relpath(p, out_b) for p in fb]
    for pa_, pb_ in zip(fa, fb):
        with open(pa_, "rb") as f1, open(pb_, "rb") as f2:
            assert f1.read() == f2.read()


def test_export_with_curation_drops_docs(ray_session, tmp_path):
    import ray.data as rd

    from sits_ray.pipelines.training_export import export_training_shards

    # 10 long keepable docs + 2 short ones the quality gate drops
    keep_texts = [" ".join(["the word and more for token"] * 10)
                  for _ in range(10)]
    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "text": keep_texts + ["tiny", "also tiny"],
    })
    out = str(tmp_path / "cur")
    res = export_training_shards(rd.from_pandas(df), out, n_shards=2,
                                 block_rows=4, curate=True)
    rows = _all_rows(out)
    # the short docs are gone; identical long docs dedupe to one rep
    assert res["n_rows"] == rows.shape[0] < 12
    assert not set(rows["doc_id"]) & {10, 11}
