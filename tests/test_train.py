"""Trainable models (stages/train.py) + accuracy assessment: learning on
separable data, analytic-vs-numerical gradients, factory -> actor-pool
scoring end-to-end, hand-computed kappa."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.kernels.ml import accuracy_metrics, confusion_matrix, softmax
from sits_ray.stages.train import (
    forest_probs,
    logreg_loss,
    sits_mlr,
    sits_rfor_lite,
    train,
    train_logreg,
)


def _blobs(n_per=60, d=8, k=3, sep=4.0, seed=2):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, size=(k, d)) * sep
    X = np.vstack([c + rng.normal(0, 0.5, size=(n_per, d)) for c in centers])
    y = np.repeat(np.arange(k), n_per)
    labels = [f"class{i}" for i in range(k)]
    return X, y, labels


def test_logreg_learns_separable():
    X, y, labels = _blobs()
    model = train(X, np.array(labels)[y], sits_mlr(iters=200))
    probs = softmax(X @ model["W"] + model["b"])
    acc = (probs.argmax(axis=1) == y).mean()
    assert acc >= 0.98
    assert model["labels"] == labels  # sorted-unique, deterministic


def test_logreg_loss_decreases():
    X, y, _ = _blobs(seed=4)
    Xs = (X - X.mean(0)) / X.std(0)
    W0 = np.zeros((X.shape[1], 3))
    b0 = np.zeros(3)
    l0 = logreg_loss(Xs, y, W0, b0)
    W, b = train_logreg(Xs, y, 3, iters=50)
    assert logreg_loss(Xs, y, W, b) < l0 * 0.5


def test_logreg_gradient_check():
    rng = np.random.default_rng(8)
    X = rng.normal(size=(20, 4))
    y = rng.integers(0, 3, 20)
    W = rng.normal(0, 0.1, size=(4, 3))
    b = rng.normal(0, 0.1, size=3)
    reg = 1e-2
    # analytic gradient (as implemented in train_logreg)
    Y = np.zeros((20, 3))
    Y[np.arange(20), y] = 1.0
    P = softmax(X @ W + b)
    G = (P - Y) / 20
    gW = X.T @ G + reg * W
    eps = 1e-6
    for _ in range(10):
        i, j = rng.integers(0, 4), rng.integers(0, 3)
        Wp, Wm = W.copy(), W.copy()
        Wp[i, j] += eps
        Wm[i, j] -= eps
        num = (logreg_loss(X, y, Wp, b, reg) - logreg_loss(X, y, Wm, b, reg)) / (2 * eps)
        assert abs(num - gW[i, j]) < 1e-6


def test_rfor_lite_learns_separable():
    X, y, labels = _blobs(seed=6)
    model = train(X, np.array(labels)[y], sits_rfor_lite(n_trees=15, max_depth=4))
    probs = forest_probs(model, X)
    assert (probs.argmax(axis=1) == y).mean() >= 0.95


def test_trained_model_in_actor_pool(ray_session):
    from sits_ray.stages.classify import classify

    X, y, labels = _blobs(n_per=40)
    model = train(X, np.array(labels)[y], sits_mlr(iters=200))
    df = pd.DataFrame({"vec_id": np.arange(len(X)), "embedding": list(X)})
    out = classify(rd.from_pandas(df), model, concurrency=1).to_pandas()
    out = out.sort_values("vec_id")
    acc = (out["pred_label"].to_numpy() == np.array(labels)[y]).mean()
    assert acc >= 0.98
    # rfor model through the same scorer
    model_rf = train(X, np.array(labels)[y], sits_rfor_lite(n_trees=10, max_depth=3))
    out_rf = classify(rd.from_pandas(df), model_rf, concurrency=1).to_pandas()
    acc_rf = (
        out_rf.sort_values("vec_id")["pred_label"].to_numpy() == np.array(labels)[y]
    ).mean()
    assert acc_rf >= 0.9


def test_accuracy_metrics_hand_computed():
    # classic 2-class example: rows=pred, cols=ref
    cm = np.array([[20.0, 5.0], [10.0, 15.0]])
    m = accuracy_metrics(cm)
    assert abs(m["overall"] - 0.7) < 1e-12
    # pe = (25*30 + 25*20)/50^2 = 0.5 -> kappa = 0.4
    assert abs(m["kappa"] - 0.4) < 1e-12
    np.testing.assert_allclose(m["producer_acc"], [20 / 30, 15 / 20])
    np.testing.assert_allclose(m["user_acc"], [20 / 25, 15 / 25])


def test_accuracy_metrics_area_weighted():
    cm = np.array([[40.0, 10.0], [20.0, 30.0]])
    # equal mapped areas: p_ij = 0.5 * n_ij / n_i.
    m = accuracy_metrics(cm, area_weights=np.array([0.5, 0.5]))
    p = np.array([[0.4, 0.1], [0.2, 0.3]])
    assert abs(m["overall"] - (p[0, 0] + p[1, 1])) < 1e-12
    np.testing.assert_allclose(m["user_acc"], [0.8, 0.6])
    np.testing.assert_allclose(
        m["producer_acc"], [p[0, 0] / 0.6, p[1, 1] / 0.4]
    )


def test_confusion_matrix_counts():
    yt = np.array([0, 0, 1, 1, 2])
    yp = np.array([0, 1, 1, 1, 2])
    cm = confusion_matrix(yt, yp, 3)
    assert cm[0, 0] == 1 and cm[1, 0] == 1 and cm[1, 1] == 2 and cm[2, 2] == 1
    assert cm.sum() == 5


def test_kfold_validate_learns(ray_session):
    from sits_ray.stages.train import kfold_validate, sits_mlr

    rng = np.random.default_rng(2)
    n, d = 200, 6
    X = rng.normal(size=(n, d))
    y = np.where(X[:, 0] + X[:, 1] > 0, "pos", "neg")
    res = kfold_validate(X, y, ml_method=sits_mlr(iters=200), k=4)
    assert len(res["fold_accuracy"]) == 4
    assert res["accuracy"] > 0.85          # separable -> CV accuracy high
    assert res["kappa"] > 0.7
    assert res["confusion"].sum() == n     # every sample predicted once
    # deterministic across runs
    res2 = kfold_validate(X, y, ml_method=sits_mlr(iters=200), k=4)
    assert res2["fold_accuracy"] == res["fold_accuracy"]


def test_tuning_orders_by_val_accuracy(ray_session):
    from sits_ray.stages.train import loguniform, sits_mlr, tuning

    rng = np.random.default_rng(3)
    X = rng.normal(size=(150, 5))
    y = np.where(X[:, 0] > 0, "a", "b")
    res = tuning(
        X, y, lambda lr, reg: sits_mlr(iters=80, lr=lr, reg=reg),
        {"lr": loguniform(0.05, 1.0), "reg": loguniform(1e-5, 1e-2)},
        trials=5,
    )
    assert len(res) == 5
    accs = [r["val_accuracy"] for r in res]
    assert accs == sorted(accs, reverse=True)
    assert accs[0] > 0.8
    # same seed -> same params and ranking
    res2 = tuning(
        X, y, lambda lr, reg: sits_mlr(iters=80, lr=lr, reg=reg),
        {"lr": loguniform(0.05, 1.0), "reg": loguniform(1e-5, 1e-2)},
        trials=5,
    )
    assert [r["params"] for r in res2] == [r["params"] for r in res]


def _temporal_two_class(n_per=80, T=32, seed=9):
    """Classes distinguished by WHERE a bump sits in the series — linearly
    messy, trivially separable for a conv + pooling net."""
    rng = np.random.default_rng(seed)
    X, y = [], []
    for cls, lo, hi in ((0, 2, 8), (1, 20, 26)):
        for _ in range(n_per):
            v = rng.normal(0, 0.3, size=T)
            p = rng.integers(lo, hi)
            v[p:p + 4] += 3.0
            X.append(v)
            y.append(cls)
    return np.array(X), np.array(y), ["early", "late"]


def test_tempcnn_learns_and_loss_decreases():
    from sits_ray.stages.train import predict_probs, sits_tempcnn_lite, tempcnn_loss

    X, y, labels = _temporal_two_class()
    short = train(X, np.array(labels)[y], sits_tempcnn_lite(iters=10))
    model = train(X, np.array(labels)[y], sits_tempcnn_lite(iters=200))
    assert tempcnn_loss(model, X, y) < tempcnn_loss(short, X, y)
    acc = (predict_probs(model, X).argmax(axis=1) == y).mean()
    assert acc >= 0.95
    # deterministic across retrains
    again = train(X, np.array(labels)[y], sits_tempcnn_lite(iters=200))
    np.testing.assert_array_equal(model["conv_K"], again["conv_K"])


def test_tempcnn_gradient_check():
    """Analytic conv-filter gradient vs central differences."""
    from sits_ray.kernels.ml import softmax as _sm
    from sits_ray.stages.train import _conv_cols

    rng = np.random.default_rng(4)
    n, T, F, w, k = 6, 12, 3, 4, 2
    X = rng.normal(0, 1, size=(n, T))
    y = rng.integers(0, k, size=n)
    Tm = T - w + 1
    K = rng.normal(0, 0.5, size=(F, w))
    c = rng.normal(0, 0.1, size=F)
    W = rng.normal(0, 0.5, size=(F * Tm, k))
    b = np.zeros(k)
    Y = np.zeros((n, k)); Y[np.arange(n), y] = 1.0
    Xcol = _conv_cols(X, w)

    def loss(Kv):
        Z = np.einsum("ntw,fw->nft", Xcol, Kv) + c[None, :, None]
        g = np.maximum(Z, 0.0).reshape(n, F * Tm)
        P = _sm(g @ W + b)
        return -np.log(P[np.arange(n), y]).mean()

    Z = np.einsum("ntw,fw->nft", Xcol, K) + c[None, :, None]
    g = np.maximum(Z, 0.0).reshape(n, F * Tm)
    P = _sm(g @ W + b)
    dZ = (((P - Y) / n) @ W.T).reshape(n, F, Tm) * (Z > 0.0)
    dK = np.einsum("nft,ntw->fw", dZ, Xcol)
    eps = 1e-6
    for f in range(F):
        for j in range(w):
            Kp, Km = K.copy(), K.copy()
            Kp[f, j] += eps
            Km[f, j] -= eps
            num = (loss(Kp) - loss(Km)) / (2 * eps)
            assert abs(num - dK[f, j]) < 1e-6, (f, j, num, dK[f, j])


def test_tempcnn_in_actor_pool(ray_session):
    """Trained tempcnn dict scores identically through the broadcast
    actor pool and the direct forward."""
    from sits_ray.stages.classify import classify
    from sits_ray.stages.train import predict_probs, sits_tempcnn_lite

    X, y, labels = _temporal_two_class(n_per=30)
    model = train(X, np.array(labels)[y], sits_tempcnn_lite(iters=60))
    df = pd.DataFrame({"vec_id": np.arange(len(X)), "embedding": list(X)})
    out = (
        classify(rd.from_pandas(df), model, concurrency=(1, 2))
        .to_pandas()
        .sort_values("vec_id")
    )
    direct = predict_probs(model, X)
    got_labels = out["pred_label"].to_numpy()
    exp_labels = np.array(labels)[direct.argmax(axis=1)]
    assert (got_labels == exp_labels).all()
    np.testing.assert_allclose(
        out[[f"prob_{l}" for l in labels]].to_numpy(), direct, rtol=0, atol=0
    )


def test_validate_single_split():
    from sits_ray.stages.train import sits_mlr, validate

    X, y, labels = _blobs()
    res = validate(X, np.array(labels)[y], sits_mlr(iters=200),
                   validation_split=0.25)
    assert res["n_train"] + res["n_val"] == len(X)
    assert res["n_val"] == round(len(X) * 0.25)
    assert res["accuracy"] >= 0.95 and 0 <= res["kappa"] <= 1
    again = validate(X, np.array(labels)[y], sits_mlr(iters=200),
                     validation_split=0.25)
    assert res["accuracy"] == again["accuracy"]  # seeded split, deterministic


def test_model_export_roundtrip(tmp_path):
    """All three model kinds survive JSON export bit-for-bit (predictions
    identical)."""
    from sits_ray.stages.train import (
        export_model,
        import_model,
        predict_probs,
        sits_mlr,
        sits_rfor_lite,
        sits_tempcnn_lite,
    )

    X, y, labels = _blobs(n_per=30)
    for i, method in enumerate(
        (sits_mlr(iters=50), sits_rfor_lite(n_trees=5, max_depth=3),
         sits_tempcnn_lite(iters=20))
    ):
        model = train(X, np.array(labels)[y], method)
        p = str(tmp_path / f"m{i}.json")
        export_model(model, p)
        back = import_model(p)
        np.testing.assert_array_equal(
            predict_probs(model, X), predict_probs(back, X)
        )
        assert back["labels"] == labels


def test_mlp_and_svm_learn_separable():
    from sits_ray.stages.train import predict_probs, sits_mlp_lite, sits_svm_lite

    X, y, labels = _blobs()
    for method in (sits_mlp_lite(iters=150), sits_svm_lite(iters=200)):
        model = train(X, np.array(labels)[y], method)
        acc = (predict_probs(model, X).argmax(axis=1) == y).mean()
        assert acc >= 0.95, model["kind"]
        again = train(X, np.array(labels)[y], method)
        np.testing.assert_array_equal(
            predict_probs(model, X), predict_probs(again, X)
        )


def test_mlp_beats_linear_on_xor():
    """A hidden layer is actually used: XOR-ish blobs that a linear
    model cannot separate."""
    from sits_ray.stages.train import predict_probs, sits_mlp_lite, sits_mlr

    rng = np.random.default_rng(8)
    quads = [(1, 1, 0), (-1, -1, 0), (1, -1, 1), (-1, 1, 1)]
    X = np.vstack([
        np.array([qx * 2.0, qy * 2.0]) + rng.normal(0, 0.4, size=(50, 2))
        for qx, qy, _ in quads
    ])
    y = np.repeat([q[2] for q in quads], 50)
    labels = np.array(["a", "b"])[y]
    mlp = train(X, labels, sits_mlp_lite(hidden=16, iters=400, lr=0.5))
    lin = train(X, labels, sits_mlr(iters=400))
    acc_mlp = (predict_probs(mlp, X).argmax(axis=1) == y).mean()
    acc_lin = (predict_probs(lin, X).argmax(axis=1) == y).mean()
    assert acc_mlp >= 0.9
    assert acc_mlp > acc_lin + 0.2


def test_boost_lite_learns_and_beats_few_rounds():
    from sits_ray.stages.train import predict_probs, sits_boost_lite

    X, y, labels = _blobs()
    short = train(X, np.array(labels)[y], sits_boost_lite(n_rounds=2))
    model = train(X, np.array(labels)[y], sits_boost_lite(n_rounds=40))
    acc_s = (predict_probs(short, X).argmax(axis=1) == y).mean()
    acc = (predict_probs(model, X).argmax(axis=1) == y).mean()
    assert acc >= 0.95 and acc >= acc_s
    again = train(X, np.array(labels)[y], sits_boost_lite(n_rounds=40))
    np.testing.assert_array_equal(
        predict_probs(model, X), predict_probs(again, X)
    )
    # export round-trip (stumps are plain tuples)
    import tempfile, os
    from sits_ray.stages.train import export_model, import_model
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "b.json")
        export_model(model, p)
        np.testing.assert_array_equal(
            predict_probs(model, X), predict_probs(import_model(p), X)
        )


def test_tae_lite_learns_position_patterns():
    """Attention + positional encodings separate early-vs-late bumps (the
    task GAP cannot see); gradient check on the attention query."""
    from sits_ray.stages.train import predict_probs, sits_tae_lite

    X, y, labels = _temporal_two_class(n_per=60)
    model = train(X, np.array(labels)[y], sits_tae_lite(iters=300))
    acc = (predict_probs(model, X).argmax(axis=1) == y).mean()
    assert acc >= 0.9
    again = train(X, np.array(labels)[y], sits_tae_lite(iters=300))
    np.testing.assert_array_equal(
        predict_probs(model, X), predict_probs(again, X)
    )


def test_tae_gradient_check_query():
    from sits_ray.kernels.ml import softmax as _sm
    from sits_ray.stages.train import _pos_encoding

    rng = np.random.default_rng(6)
    n, T, d, k = 5, 9, 4, 3
    Xs = rng.normal(0, 1, size=(n, T))
    y = rng.integers(0, k, size=n)
    v = rng.normal(0, 1, size=d)
    qv = rng.normal(0, 1, size=d)
    W = rng.normal(0, 0.5, size=(d, k))
    b = np.zeros(k)
    P = _pos_encoding(T, d)
    Y = np.zeros((n, k)); Y[np.arange(n), y] = 1.0
    sq = np.sqrt(d)

    def loss(qq):
        E = Xs[:, :, None] * v[None, None, :] + P[None, :, :]
        a = _sm((E @ qq) / sq)
        z = np.einsum("nt,ntd->nd", a, E)
        Pr = _sm(z @ W + b)
        return -np.log(Pr[np.arange(n), y]).mean()

    E = Xs[:, :, None] * v[None, None, :] + P[None, :, :]
    a = _sm((E @ qv) / sq)
    z = np.einsum("nt,ntd->nd", a, E)
    Pr = _sm(z @ W + b)
    dL = (Pr - Y) / n
    dz = dL @ W.T
    da = np.einsum("nd,ntd->nt", dz, E)
    ds = a * (da - (a * da).sum(axis=1, keepdims=True))
    dq = np.einsum("nt,ntd->d", ds, E) / sq
    eps = 1e-6
    for j in range(d):
        qp, qm = qv.copy(), qv.copy()
        qp[j] += eps
        qm[j] -= eps
        num = (loss(qp) - loss(qm)) / (2 * eps)
        assert abs(num - dq[j]) < 1e-6, (j, num, dq[j])


def test_resnet_lite_learns_and_roundtrips(tmp_path):
    from sits_ray.stages.train import (
        export_model,
        import_model,
        predict_probs,
        sits_resnet_lite,
    )

    X, y, labels = _blobs()
    model = train(X, np.array(labels)[y], sits_resnet_lite(iters=150))
    acc = (predict_probs(model, X).argmax(axis=1) == y).mean()
    assert acc >= 0.95
    p = str(tmp_path / "r.json")
    export_model(model, p)
    np.testing.assert_array_equal(
        predict_probs(model, X), predict_probs(import_model(p), X)
    )
