import numpy as np
import pandas as pd
import ray.data as rd

from sits_ray.stages.curriculum import (
    curriculum_order,
    nearest_rank_thresholds,
)


def test_nearest_rank_thresholds_from_histogram():
    # values: 1 x3, 5 x2, 9 x5  (N=10); ceil(q*N) ranks: 3 -> 1, 5 -> 5, 8 -> 9
    hist = pd.Series({1: 3, 5: 2, 9: 5})
    assert nearest_rank_thresholds(hist, [0.25, 0.5, 0.75]) == [1, 5, 9]
    assert nearest_rank_thresholds(hist, [0.0, 1.0]) == [1, 9]


def test_curriculum_order_interleaves(ray_session):
    """pos must be a permutation of 0..n-1 whose residue mod n_buckets
    equals the bucket, with (n_tokens, doc_id) order inside a bucket —
    the round-robin interleave contract."""
    rng = np.random.default_rng(9)
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(1, 40, size=80)]
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": texts})
    out = (
        curriculum_order(rd.from_pandas(df).repartition(5), n_buckets=4)
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    assert len(out) == 80
    assert sorted(out["pos"]) != list(out["pos"])[:0]  # non-empty
    # positions are unique and residues equal buckets
    assert out["pos"].is_unique
    assert (out["pos"] % 4 == out["bucket"]).all()
    # within a bucket, pos order == (n_tokens, doc_id) order
    for b, g in out.groupby("bucket"):
        gg = g.sort_values("pos")
        assert (
            gg[["n_tokens", "doc_id"]].values.tolist()
            == gg.sort_values(["n_tokens", "doc_id"])[["n_tokens", "doc_id"]]
            .values.tolist()
        )


def test_curriculum_all_ties_single_bucket(ray_session):
    """Identical lengths: everything lands in bucket 0 ordered by id."""
    df = pd.DataFrame(
        {"doc_id": np.arange(10, dtype=np.int64), "text": ["a b c"] * 10}
    )
    out = (
        curriculum_order(rd.from_pandas(df), n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["bucket"] == 0).all()
    assert out["pos"].tolist() == [i * 4 for i in range(10)]


def test_shuffle_order_is_permutation(ray_session):
    """pos must be a bijection onto 0..n-1, identical across batching
    shapes (reproducibility contract), and ordered by (mix, id)."""
    from sits_ray.stages.curriculum import mix_ids, shuffle_order

    ids = np.arange(1000, dtype=np.int64) * 7 + 3
    df = pd.DataFrame({"doc_id": ids})
    out1 = (
        shuffle_order(rd.from_pandas(df).repartition(9), bucket_bits=6)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    out2 = (
        shuffle_order(rd.from_pandas(df).repartition(2), bucket_bits=6)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out1, out2)  # batching-independent
    assert sorted(out1["pos"]) == list(range(1000))
    ordered = out1.sort_values("pos")
    key = list(zip(ordered["mix"], ordered["doc_id"]))
    assert key == sorted(key)
    # and it actually shuffles: not the identity order
    assert ordered["doc_id"].tolist() != sorted(ordered["doc_id"])
    assert (out1["mix"] == mix_ids(out1["doc_id"].to_numpy())).all()


def test_mix_ids_negative_ids_nonnegative():
    """numpy floored mod keeps negative ids non-negative — the SQL twin
    applies an explicit positive-mod fold to agree."""
    from sits_ray.stages.curriculum import mix_ids

    ids = np.array([-5, -1, 0, 7, -(1 << 40)], dtype=np.int64)
    m = mix_ids(ids)
    assert (m >= 0).all() and (m < (1 << 32)).all()
    # matches the explicit positive-mod formula the oracle uses
    pm = (((ids % (1 << 31)) + (1 << 31)) % (1 << 31))
    assert (m == (pm * 2654435761) % (1 << 32)).all()
