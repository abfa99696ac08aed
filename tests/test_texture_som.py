import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.kernels.texture import FEATURES, glcm_features, quantize, series_texture
from sits_ray.stages.som import SOM, som_map


def test_quantize():
    v = np.array([0.0, 0.5, 1.0, np.nan])
    q = quantize(v, levels=4)
    assert q[0] == 0 and q[2] == 3 and q[3] == -1
    assert (quantize(np.full(5, 7.0), 4) == 0).all()
    assert (quantize(np.full(3, np.nan), 4) == -1).all()


def test_glcm_constant_series():
    f = series_texture(np.full(20, 5.0))
    # constant -> single cell at (0,0): no contrast, full homogeneity/ASM
    assert f["contrast"] == 0.0
    assert f["homogeneity"] == pytest.approx(1.0)
    assert f["asm"] == pytest.approx(1.0)


def test_glcm_alternating_vs_smooth():
    smooth = np.linspace(0, 1, 64)
    rough = np.tile([0.0, 1.0], 32)
    fs = series_texture(smooth, levels=8)
    fr = series_texture(rough, levels=8)
    assert fr["contrast"] > fs["contrast"]
    assert fs["homogeneity"] > fr["homogeneity"]


def test_glcm_probability_matrix_properties():
    rng = np.random.default_rng(3)
    f = glcm_features(quantize(rng.random(100), 8), 8)
    for k in FEATURES:
        assert np.isfinite(f[k])
    assert 0 <= f["asm"] <= 1
    assert -1.0001 <= f["correlation"] <= 1.0001


def test_som_clusters_separate_data():
    rng = np.random.default_rng(4)
    a = rng.normal(0, 0.1, size=(60, 8))
    b = rng.normal(5, 0.1, size=(60, 8))
    som = SOM(2, 2).fit(np.vstack([a, b]), epochs=10)
    ba, bb = som.bmu(a), som.bmu(b)
    # the two clusters map to disjoint BMUs
    assert set(ba) & set(bb) == set()
    # deterministic
    som2 = SOM(2, 2).fit(np.vstack([a, b]), epochs=10)
    np.testing.assert_array_equal(som.codebook, som2.codebook)


def test_som_map_dataset(ray_session):
    rng = np.random.default_rng(5)
    vecs = np.vstack([rng.normal(0, 0.2, (40, 6)), rng.normal(3, 0.2, (40, 6))])
    df = pd.DataFrame({"vec_id": np.arange(80), "embedding": list(vecs)})
    out = som_map(rd.from_pandas(df), xdim=2, ydim=2, sample_rows=80, epochs=5)[0].to_pandas()
    assert len(out) == 80
    assert out["bmu"].between(0, 3).all()
    assert (out["quant_err"] >= 0).all()


def test_cooccurrence_counts_match_scalar_pairs():
    """Integer co-occurrence core: counts equal a per-pair scalar tally."""
    from sits_ray.kernels.texture import cooccurrence_counts, quantize, quantize_matrix

    rng = np.random.default_rng(21)
    m = rng.normal(size=(6, 15))
    m[m > 1.2] = np.nan
    q = quantize_matrix(m, 8)
    # row-wise thresholds identical to the scalar quantizer
    for r in range(m.shape[0]):
        np.testing.assert_array_equal(q[r], quantize(m[r], 8))
    P = cooccurrence_counts(q, 8)
    for r in range(m.shape[0]):
        want = np.zeros((8, 8), dtype=np.int64)
        for a, b in zip(q[r, :-1], q[r, 1:]):
            if a >= 0 and b >= 0:
                want[a, b] += 1
                want[b, a] += 1
        np.testing.assert_array_equal(P[r], want)


def test_som_neuron_labeling_and_clean(ray_session):
    """Hand-checkable SOM quality chain: priors, Bayes posterior bounds,
    clean/analyze/remove outcomes."""
    import pyarrow as pa
    import ray.data as rd

    from sits_ray.stages.som import (
        SOM,
        bayes_neuron_posteriors,
        label_neurons,
        neuron_majority_labels,
        som_clean_samples,
        som_evaluate_cluster,
    )

    rng = np.random.default_rng(6)
    # two tight blobs -> separable neurons; a few mislabeled samples
    a = rng.normal(0, 0.05, size=(40, 4))
    b = rng.normal(3, 0.05, size=(40, 4))
    X = np.vstack([a, b])
    labels = np.array(["A"] * 40 + ["B"] * 40)
    labels[0] = "B"  # one impostor in blob a
    som = SOM(2, 2, seed=1).fit(X, epochs=10)
    bmu = som.bmu(X)
    df = pa.table(
        {
            "vec_id": pa.array(np.arange(80)),
            "label": pa.array(labels),
            "bmu": pa.array(bmu.astype(np.int64)),
        }
    )
    ds = rd.from_arrow(df)
    neurons = label_neurons(ds, 4)
    pdn = neurons.to_pydict()
    # priors per neuron sum to 1
    import collections

    sums = collections.defaultdict(float)
    for i, p in zip(pdn["id_neuron"], pdn["prior_prob"]):
        sums[i] += p
    for v in sums.values():
        assert abs(v - 1.0) < 1e-12
    post = bayes_neuron_posteriors(neurons, som.grid, radius=2)
    pp = post["post_prob"].to_numpy()
    assert ((pp >= 0) & (pp <= 1)).all()
    # majority labels recover the blobs; the impostor's neuron stays its blob's
    major = neuron_majority_labels(neurons)
    cleaned = som_clean_samples(
        ds, post, keep=("clean", "analyze", "remove")
    ).to_pandas()
    assert len(cleaned) == 80
    ev = cleaned.set_index("vec_id")["eval"]
    assert ev.loc[0] == "remove"            # impostor: prior ~1/40 in its neuron
    assert (ev.drop(0) != "remove").mean() > 0.9
    clusters = som_evaluate_cluster(ds, neurons).to_pandas()
    tot = clusters.groupby("cluster")["mixture_pct"].sum()
    assert np.allclose(tot.to_numpy(), 100.0)
    assert set(major.values()) <= {"A", "B"}


def test_glcm2d_one_row_matches_1d_series():
    # a 1-row grid's horizontal GLCM IS the 1-D lag-1 GLCM (global
    # quantization == the single row's min-max)
    from sits_ray.kernels.texture import (
        FEATURES,
        glcm2d_features,
        glcm_features,
        quantize,
    )

    from sits_ray.kernels.texture import texture_matrix

    rng = np.random.default_rng(7)
    v = rng.normal(0, 1, 40)
    f2 = glcm2d_features(v[None, :], levels=8)["h"]
    fm = texture_matrix(v[None, :], levels=8)  # same sequential float core
    f1 = glcm_features(quantize(v, 8), 8)  # scalar twin (pairwise np.sum)
    for f in FEATURES:
        assert f2[f] == fm[f][0] or (np.isnan(f2[f]) and np.isnan(fm[f][0]))
        assert np.isclose(f2[f], f1[f], rtol=1e-12, equal_nan=True)


def test_glcm2d_counts_hand_built():
    from sits_ray.kernels.texture import cooccurrence_counts_2d

    q = np.array([[0, 1], [1, 0]])
    c = cooccurrence_counts_2d(q, levels=2)
    # horizontal pairs: (0,1) and (1,0) -> symmetric counts 2+2
    assert c["h"][0, 1] == 2 and c["h"][1, 0] == 2 and c["h"].sum() == 4
    # vertical pairs: (0,1) and (1,0)
    assert c["v"][0, 1] == 2 and c["v"][1, 0] == 2 and c["v"].sum() == 4
    # invalid cells break pairs
    q2 = np.array([[0, -1, 1]])
    c2 = cooccurrence_counts_2d(q2, levels=2)
    assert c2["h"].sum() == 0 and c2["v"].sum() == 0


def test_quantize_global_vs_row():
    from sits_ray.kernels.texture import quantize, quantize_global

    m = np.array([[0.0, 1.0], [10.0, 11.0]])
    g = quantize_global(m, 4)
    # global thresholds: 0 and 11 -> second row lands in top levels
    assert g[0, 0] == 0 and g[1, 1] == 3
    # 1-row global == per-row quantize
    assert (quantize_global(m[:1], 4) == quantize(m[0], 4)).all()
    # all-NaN -> -1, constant -> 0
    assert (quantize_global(np.full((2, 2), np.nan), 4) == -1).all()
    assert (quantize_global(np.ones((2, 2)), 4) == 0).all()


def test_image_texture_stage(ray_session):
    import ray.data as rd

    from sits_ray.stages.multimodal import image_texture, synth_media_table

    tbl = synth_media_table(n=16, seed=11)
    out = image_texture(rd.from_arrow(tbl), levels=8, concurrency=(1, 2)).to_pandas()
    n_images = sum(1 for m in tbl["mime"].to_pylist() if m.startswith("image/"))
    assert len(out) == 2 * n_images  # h + v per image
    assert set(out["direction"]) == {"h", "v"}
    assert (out["asm"] > 0).all() and (out["asm"] <= 1).all()
    assert np.allclose(out["energy"], np.sqrt(out["asm"]))


def test_som_neighborhood_shapes():
    from sits_ray.stages.som import som_neighborhood

    H0 = som_neighborhood(3, 3, 0)
    assert (H0 == 2 * np.eye(9, dtype=np.int64)).all()  # radius 0 = self only
    H1 = som_neighborhood(3, 3, 1)
    # center unit (1,1) -> index 4: itself + 4 Manhattan-1 neighbors
    assert H1[4].sum() == 2 + 4
    # corner unit (0,0) -> index 0: itself + 2 neighbors
    assert H1[0].sum() == 2 + 2
    assert (H1 == H1.T).all()


def test_som_batch_int_matches_scalar_twin(ray_session):
    """Distributed integer batch-SOM must equal a driver-side scalar
    replay regardless of batching (order-free integer sums), and the
    shrinking-radius schedule must move non-BMU units early (radius>0)
    but only BMU-hit units in the final radius-0 round."""
    import ray.data as rd

    from sits_ray.stages.kmeans import _fld, make_int_centroids, quantize_batch
    from sits_ray.stages.som import som_batch_int, som_neighborhood

    rng = np.random.default_rng(5)
    V = rng.normal(0, 0.3, size=(50, 6)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(50), "embedding": list(V)})
    ds = rd.from_pandas(df).repartition(6)
    got = som_batch_int(ds, xdim=2, ydim=2, iters=3, seed=23)

    X = quantize_batch(np.asarray(V, dtype=np.float64))
    W = make_int_centroids(6, 4, 23)
    radii = (2, 1, 0)
    for it in range(3):
        diff = X[:, None, :] - W[None, :, :]
        dd = (diff * diff).sum(axis=2)
        a = dd.argmin(axis=1)
        sizes = np.bincount(a, minlength=4).astype(np.int64)
        S = np.zeros((4, 6), dtype=np.int64)
        for j in range(4):
            if (a == j).any():
                S[j] = X[a == j].sum(axis=0)
        H = som_neighborhood(2, 2, radii[it])
        NS, NN = H @ S, H @ sizes
        upd = _fld(2 * NS + NN[:, None], 2 * np.maximum(NN, 1)[:, None])
        W = np.where((NN > 0)[:, None], upd, W)
    expect = pd.DataFrame(
        {
            "unit": np.repeat(np.arange(4, dtype=np.int64), 6),
            "d": np.tile(np.arange(1, 7, dtype=np.int64), 4),
            "w": W.reshape(-1),
            "n": np.repeat(sizes.astype(np.int64), 6),
        }
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["unit", "d"]).reset_index(drop=True), expect
    )
