"""Distributed k-means: assignment parity vs brute force, Lloyd blob
recovery, empty-cluster stability, and the left-associated score contract
(the SQL-literal fold) staying within an ulp of the matmul scores."""

import numpy as np
import pandas as pd
import pytest

from sits_ray.stages.kmeans import (
    assign_clusters,
    half_norms,
    lloyd,
    make_centroids,
    seq_scores,
)


def _blobs(n_per=60, k=3, dim=8, seed=3, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 2.0, size=(k, dim))
    X = np.concatenate(
        [c + spread * rng.normal(size=(n_per, dim)) for c in centers]
    )
    y = np.repeat(np.arange(k), n_per)
    return X, y, centers


def test_seq_scores_match_bruteforce_argmin():
    rng = np.random.default_rng(5)
    V = rng.normal(size=(200, 16))
    C = make_centroids(16, 4, seed=41)
    a = np.argmax(seq_scores(V, C), axis=1)
    d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    np.testing.assert_array_equal(a, np.argmin(d2, axis=1))


def test_half_norms_sequential():
    C = make_centroids(7, 3, seed=2)
    want = np.array([0.5 * sum(float(c * c) for c in row) for row in C])
    np.testing.assert_array_equal(half_norms(C), want)


def test_assign_clusters_dataset(ray_session):
    import ray.data as rd

    X, _, _ = _blobs()
    C = make_centroids(8, 3, seed=41)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(X)), "embedding": list(X)})
    )
    got = (
        assign_clusters(ds, C)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    want = np.argmax(seq_scores(X, C), axis=1)
    np.testing.assert_array_equal(got, want)


def test_lloyd_recovers_blobs(ray_session):
    import ray.data as rd

    X, y, centers = _blobs()
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(X)), "embedding": list(X)})
    )
    C, sizes, inertia = lloyd(ds, k=3, iters=8, seed=11)
    assert sizes.sum() == len(X)
    # every learned centroid lands on one true center, all centers matched
    d = np.sqrt(((C[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2))
    nearest = d.min(axis=1)
    assert (nearest < 0.1).all(), nearest
    assert set(d.argmin(axis=1)) == {0, 1, 2}
    # inertia ~ n * dim * spread^2
    assert inertia < len(X) * 8 * 0.05**2 * 2


def test_lloyd_empty_cluster_keeps_centroid(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 4)) * 0.01  # one tight blob at origin
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(X)), "embedding": list(X)})
    )
    from sits_ray.stages.kmeans import farthest_point_init

    C, sizes, _ = lloyd(ds, k=4, iters=3, seed=5)
    init = farthest_point_init(X, 4)
    assert sizes.sum() == 40
    for j in np.flatnonzero(sizes == 0):
        np.testing.assert_array_equal(C[j], init[j])
    assert not np.isnan(C).any()


def test_lloyd_matches_scalar_lloyd(ray_session):
    """Distributed partial-sum Lloyd == single-process Lloyd (same init,
    same argmax rule): sizes identical, centroids allclose."""
    import ray.data as rd

    X, _, _ = _blobs(n_per=40, k=3, dim=6, seed=9)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(X)), "embedding": list(X)})
    )
    k, iters, seed = 3, 4, 13
    C, sizes, _ = lloyd(ds, k=k, iters=iters, seed=seed)

    from sits_ray.stages.kmeans import farthest_point_init

    Cs = farthest_point_init(X, k)
    cnt = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        a = np.argmax(seq_scores(X, Cs), axis=1)
        cnt = np.bincount(a, minlength=k)
        for j in range(k):
            if cnt[j]:
                Cs[j] = X[a == j].mean(axis=0)
    # sizes are the final round's assignment counts (pre-update centroids);
    # cluster indexing is shared (same init, same first-max rule)
    np.testing.assert_array_equal(sizes, cnt)
    np.testing.assert_allclose(C, Cs, rtol=1e-9)


def test_lloyd_int_matches_scalar_twin(ray_session):
    """Distributed integer Lloyd must equal a driver-side scalar replay
    (quantize -> exact int distances -> first-min -> int sums -> exact
    round-half-up division), independent of batching/parallelism —
    integer sums are order-free so this MUST hold exactly."""
    import ray.data as rd

    from sits_ray.stages.kmeans import (
        _fld,
        lloyd_int,
        make_int_centroids,
        quantize_batch,
    )

    rng = np.random.default_rng(3)
    V = rng.normal(0, 0.3, size=(60, 8)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(60), "embedding": list(V)})
    ds = rd.from_pandas(df).repartition(7)  # odd batching on purpose
    got = lloyd_int(ds, k=3, iters=4, seed=17)

    # scalar replay
    X = quantize_batch(np.asarray(V, dtype=np.float64))
    C = make_int_centroids(8, 3, 17)
    for _ in range(4):
        diff = X[:, None, :] - C[None, :, :]
        dd = (diff * diff).sum(axis=2)
        a = dd.argmin(axis=1)
        sizes = np.bincount(a, minlength=3)
        sums = np.zeros((3, 8), dtype=np.int64)
        for j in range(3):
            if (a == j).any():
                sums[j] = X[a == j].sum(axis=0)
        upd = _fld(2 * sums + sizes[:, None], 2 * np.maximum(sizes, 1)[:, None])
        C = np.where((sizes > 0)[:, None], upd, C)
    expect = pd.DataFrame(
        {
            "cluster": np.repeat(np.arange(3, dtype=np.int64), 8),
            "d": np.tile(np.arange(1, 9, dtype=np.int64), 3),
            "c": C.reshape(-1),
            "n": np.repeat(sizes.astype(np.int64), 8),
        }
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["cluster", "d"]).reset_index(drop=True), expect
    )


def test_fld_matches_floor_division():
    from sits_ray.stages.kmeans import _fld

    num = np.array([-7, 7, -8, 8, 0, -1, 5], dtype=np.int64)
    den = np.array([2, 2, 4, 4, 3, 3, 5], dtype=np.int64)
    assert (_fld(num, den) == num // den).all()  # numpy // is floor


def test_lloyd_int_empty_dataset(ray_session):
    import ray.data as rd

    from sits_ray.stages.kmeans import lloyd_int

    empty = rd.from_pandas(
        pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                      "embedding": pd.Series([], dtype=object)})
    )
    out = lloyd_int(empty, k=3, iters=2)
    assert len(out) == 0
    assert list(out.columns) == ["cluster", "d", "c", "n"]


def test_silhouette_int_properties(ray_session):
    """Well-separated blobs: own-cluster members score high positive sil;
    a2 <= b2 always (own centroid is the argmin); sil in [-1, 1]."""
    import ray.data as rd

    from sits_ray.stages.kmeans import silhouette_int

    rng = np.random.default_rng(11)
    A = rng.normal(0.4, 0.01, size=(30, 8)).astype(np.float32)
    B = rng.normal(-0.4, 0.01, size=(30, 8)).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(60, dtype=np.int64),
         "embedding": list(np.vstack([A, B]))}
    )
    out = silhouette_int(rd.from_pandas(df).repartition(4), k=2, iters=4).to_pandas()
    assert len(out) == 60
    assert (out["a2"] <= out["b2"]).all()
    assert out["sil"].between(-1.0, 1.0).all()
    assert (out["sil"] > 0.8).mean() > 0.9  # tight separated blobs
