import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.kernels import ml
from sits_ray.kernels.dtw import dtw_distance, dtw_distance_ref
from sits_ray.stages.classify import SeriesScorer, classify, make_linear_model


def test_softmax_rows_sum_to_one():
    x = np.random.default_rng(1).normal(size=(10, 5)) * 10
    p = ml.softmax(x)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-12)
    assert (p > 0).all()


def test_label_max_prob_nan_rules():
    p = np.array([[0.2, 0.8], [np.nan, np.nan], [0.0, 0.0]])
    got = ml.label_max_prob(p)
    assert got[0] == 2.0
    assert np.isnan(got[1]) and np.isnan(got[2])


def test_uncertainty_bounds():
    p = ml.softmax(np.random.default_rng(2).normal(size=(20, 4)))
    ent = ml.entropy_probs(p)
    assert ((ent >= 0) & (ent <= 1 + 1e-12)).all()  # normalized by log(k)
    marg = ml.margin_probs(p)
    assert ((marg >= 0) & (marg <= 1)).all()
    lc = ml.least_probs(p)
    assert ((lc >= 0) & (lc <= 1)).all()
    uniform = np.full((1, 4), 0.25)
    np.testing.assert_allclose(ml.entropy_probs(uniform), [1.0])


def test_combine_average():
    a = np.array([[0.2, 0.8]]); b = np.array([[0.6, 0.4]])
    np.testing.assert_allclose(ml.combine_average([a, b]), [[0.4, 0.6]])
    np.testing.assert_allclose(
        ml.combine_average([a, b], weights=[3, 1]), [[0.3, 0.7]]
    )


def test_scorer_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 8))
    model = make_linear_model(8, 3, seed=13)
    df = pd.DataFrame({"vec_id": np.arange(50), "embedding": list(vecs)})
    out = (
        classify(rd.from_pandas(df), model, concurrency=1, batch_size=16)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    probs = ml.softmax(vecs @ model["W"] + model["b"])
    np.testing.assert_allclose(out["prob_label0"].to_numpy(), probs[:, 0], rtol=1e-12)
    exp_label = [model["labels"][i] for i in probs.argmax(axis=1)]
    assert list(out["pred_label"]) == exp_label
    np.testing.assert_allclose(
        out["entropy"].to_numpy(), ml.entropy_probs(probs), rtol=1e-12
    )


def test_dtw_matches_reference():
    rng = np.random.default_rng(4)
    for n, m in [(1, 1), (5, 7), (23, 23), (12, 3)]:
        a, b = rng.normal(size=n), rng.normal(size=m)
        assert dtw_distance(a, b) == pytest.approx(dtw_distance_ref(a, b), rel=1e-12)
    # identity: distance to itself is 0
    a = rng.normal(size=15)
    assert dtw_distance(a, a) == 0.0


def test_multimodal_plumbing(ray_session):
    import pyarrow as pa

    from sits_ray.stages.multimodal import (
        decode_stub,
        extract_features,
        synth_media_table,
    )

    tbl = synth_media_table(n=32)
    out = extract_features(rd.from_arrow(tbl), batch_size=8, concurrency=1).to_pandas()
    assert len(out) == 32
    assert out["feature"].map(len).eq(64).all()
    # deterministic across runs
    out2 = extract_features(rd.from_arrow(tbl), batch_size=8, concurrency=1).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True),
        out2.sort_values("media_id").reset_index(drop=True),
    )
    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "image/png")


def test_combine_uncertainty_weights():
    """Inverse-uncertainty weights, hand-computed: u=(0.2,0.8) ->
    w=(0.8,0.2); a near-certain model dominates the blend."""
    from sits_ray.kernels.ml import combine_uncertainty

    pa_ = np.array([[0.9, 0.1], [0.2, 0.8]])
    pb_ = np.array([[0.1, 0.9], [0.5, 0.5]])
    out = combine_uncertainty([pa_, pb_], [np.array([0.2, 0.2]), np.array([0.8, 0.8])])
    want = 0.8 * pa_ + 0.2 * pb_
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-15)
    # equal uncertainties reduce to the plain average
    out2 = combine_uncertainty([pa_, pb_], [np.array([0.5, 0.5])] * 2)
    np.testing.assert_allclose(out2, (pa_ + pb_) / 2, atol=1e-15)


# --- conformal prediction sets -------------------------------------------------

def test_conformal_sets_smallest_covering(ray_session):
    from sits_ray.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    out = QUERIES["conformal_sets"](sf_dir).to_pandas()
    assert set(out.columns) == {"vec_id", "rank", "label"}
    sizes = out.groupby("vec_id")["rank"].agg(["max", "count"])
    # ranks are 1..size contiguous and at least one label per vector
    assert (sizes["max"] == sizes["count"]).all()
    assert sizes["count"].between(1, 4).all()
    # recompute probs: every emitted set is the SMALLEST with mass >= tau
    import numpy as np
    import pyarrow.parquet as pq

    from sits_ray.kernels.ml import softmax
    from sits_ray.stages.classify import list_matrix, make_linear_model

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = make_linear_model(64, 4, seed=13)
    p = softmax(list_matrix(t["embedding"]) @ m["W"] + m["b"])
    ids = t["vec_id"].to_numpy()
    ps = np.sort(p, axis=1)[:, ::-1]
    by_id = sizes["count"].to_dict()
    for i in range(0, len(ids), max(1, len(ids) // 50)):
        k = by_id[ids[i]]
        assert ps[i, :k].sum() >= 0.9 - 1e-12          # covers tau
        if k > 1:
            assert ps[i, :k - 1].sum() < 0.9 + 1e-12   # and is smallest


def test_calibration_bins_counts_and_identities(ray_session):
    from sits_ray.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    out = QUERIES["calibration_bins"](sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    import pyarrow.parquet as pq

    n_vecs = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    assert out["n"].sum() == n_vecs              # every vector lands in a bin
    assert out["bin"].between(0, 9).all()
    assert (out["n_correct"] <= out["n"]).all()
    # identities hold exactly
    assert (out["acc"] == out["n_correct"] / out["n"]).all()
    assert (out["gap"] == (out["acc"] - out["avg_conf"]).abs()).all()
    # 4-class softmax confidence is > 0.25 -> bins 0/1 empty
    assert not set(out["bin"]) & {0, 1}


# --- confident-learning label noise -------------------------------------------

def test_confident_label_noise_scalar_parity(ray_session):
    """Brute-force CL replication on sf0.001 must match the distributed
    two-pass query row-for-row (thresholds as exact rationals)."""
    import pyarrow.parquet as pq
    from sits_ray.kernels.ml import softmax
    from sits_ray.queries import QUERIES
    from sits_ray.stages.classify import list_matrix, make_linear_model

    sf = "/root/testdata/sf0.001"
    got = QUERIES["confident_label_noise"](sf)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got) \
        .sort_values("vec_id").reset_index(drop=True)

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "label", "embedding"])
    model = make_linear_model(64, 4, seed=13)
    p = softmax(list_matrix(t["embedding"]) @ model["W"] + model["b"])
    q = np.floor(p * 1e6 + 0.5).astype(np.int64)
    g = t["label"].to_numpy().astype(np.int64) % 4
    rows = []
    for i in range(q.shape[0]):
        best = None
        for k in range(4):
            nk = int((g == k).sum())
            sk = int(q[g == k, k].sum())
            if nk and q[i, k] * nk >= sk:
                if best is None or q[i, k] > best[1]:
                    best = (k, int(q[i, k]))
        if best and best[0] != g[i]:
            rows.append((int(t["vec_id"][i].as_py()), int(g[i]),
                         best[0], int(q[i, g[i]]), best[1]))
    exp = pd.DataFrame(rows, columns=["vec_id", "given_label",
                                      "suggested_label", "q_given",
                                      "q_suggested"]).sort_values("vec_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert len(exp) > 0  # random labels vs seeded scorer: noise exists


def test_confident_label_noise_clean_labels_unflagged(ray_session):
    """If every given label equals the scorer's argmax, thresholds are
    the mean of the WINNING probabilities — no other class can reach its
    own threshold on a softmax winner-take-most geometry, so nothing is
    flagged on a strongly separated synthetic set."""
    from sits_ray.kernels.ml import softmax

    rng = np.random.default_rng(6)
    W = np.eye(4) * 8.0  # 4 features = 4 classes, strong separation
    X = np.zeros((80, 4))
    y = np.repeat(np.arange(4), 20)
    X[np.arange(80), y] = 1.0 + rng.random(80) * 0.1
    p = softmax(X @ W)
    q = np.floor(p * 1e6 + 0.5).astype(np.int64)
    flagged = 0
    for i in range(80):
        for k in range(4):
            nk = int((y == k).sum())
            sk = int(q[y == k, k].sum())
            if q[i, k] * nk >= sk and k != y[i]:
                flagged += 1
                break
    assert flagged == 0


# --- PAV isotonic blocks ------------------------------------------------------

def test_pav_textbook_merge():
    from sits_ray.kernels.ml import pav_blocks

    # rates 1.0, 0.0, 0.5 -> first two pool to 0.5, then NO strict
    # violation against the last block (0.5 == 0.5 stays separate)
    blocks = pav_blocks([10, 20, 30], [2, 2, 2], [2, 0, 1])
    assert blocks == [[10, 20, 4, 2], [30, 30, 2, 1]]


def test_pav_already_isotonic_untouched():
    from sits_ray.kernels.ml import pav_blocks

    blocks = pav_blocks([1, 2, 3], [4, 4, 4], [1, 2, 3])
    assert blocks == [[1, 1, 4, 1], [2, 2, 4, 2], [3, 3, 4, 3]]


def test_pav_cascading_merge_and_monotone_rates():
    from sits_ray.kernels.ml import pav_blocks

    rng = np.random.default_rng(7)
    n = rng.integers(1, 9, 50)
    nc = np.array([rng.integers(0, c + 1) for c in n])
    blocks = pav_blocks(np.arange(50), n, nc)
    rates = [c / t for (_, _, t, c) in blocks]
    assert all(rates[i] <= rates[i + 1] for i in range(len(rates) - 1))
    assert sum(b[2] for b in blocks) == int(n.sum())
    assert sum(b[3] for b in blocks) == int(nc.sum())
    # contiguous, ordered coverage
    assert blocks[0][0] == 0 and blocks[-1][1] == 49
