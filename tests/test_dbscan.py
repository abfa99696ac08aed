"""Density-based clustering with explicit noise (stages/dbscan.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from sits_ray.stages.dbscan import dbscan_embeddings


def _ds(vecs):
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
    }))


def test_dbscan_two_blobs_never_merge_and_far_is_noise(ray_session):
    rng = np.random.default_rng(3)
    blob_a = rng.normal(0.0, 0.02, size=(20, 4))
    blob_b = rng.normal(5.0, 0.02, size=(20, 4))
    far = np.full((1, 4), 50.0)
    out = dbscan_embeddings(_ds(np.vstack([blob_a, blob_b, far])))
    lab = out.set_index("vec_id")
    a_cl = set(lab.loc[:19].loc[lab["cluster"] >= 0, "cluster"])
    b_cl = set(lab.loc[20:39].loc[lab["cluster"] >= 0, "cluster"])
    # each blob condenses to exactly one cluster; blobs never merge
    assert len(a_cl) == 1 and len(b_cl) == 1 and a_cl != b_cl
    # the median-kdist eps is conservative: interior points are cores,
    # some tails drop to border/noise, but every core is in a blob
    assert (lab.loc[lab["role"] == "core"].index < 40).all()
    assert lab.loc[40, "role"] == "noise"
    assert lab.loc[40, "cluster"] == -1


def test_dbscan_line_clump_roles(ray_session):
    # 1-D clump [0, 10, 20, 30, 40] (quantized units) + a gap point +
    # a 4-point clump; eps = lower-median 3rd-NN dist = 400
    pts = [[0.0], [0.001], [0.002], [0.003], [0.004], [0.02], [5.0], [5.001],
           [5.002], [5.003]]
    out = dbscan_embeddings(_ds(np.asarray(pts))).set_index("vec_id")
    assert out.loc[2, "role"] == "core"       # middle of the clump
    assert out.loc[0, "role"] == "border"     # end: only 2 within eps
    assert out.loc[5, "role"] == "noise"      # gap point: nothing in 400
    assert out.loc[0, "cluster"] == out.loc[2, "cluster"]
    # every non-noise point's label is one of the ids
    for _, row in out.iterrows():
        if row["cluster"] >= 0:
            assert row["cluster"] in out.index


def test_dbscan_batching_invariance(ray_session):
    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 1, size=(60, 6))
    one = dbscan_embeddings(_ds(vecs))
    many = dbscan_embeddings(_ds(vecs).repartition(7))
    pd.testing.assert_frame_equal(one.reset_index(drop=True),
                                  many.reset_index(drop=True))


def test_dbscan_labels_are_min_core_member(ray_session):
    rng = np.random.default_rng(1)
    vecs = rng.normal(0, 1, size=(50, 3))
    out = dbscan_embeddings(_ds(vecs))
    for cl, g in out[out["cluster"] >= 0].groupby("cluster"):
        members = g.loc[g["role"] == "core", "vec_id"]
        if len(members):
            assert cl == members.min()
