"""Integer-exact perceptron (stages/perceptron.py): hand replay of the
update rule, tie-updates, separable-data convergence, scoring censuses."""

import numpy as np
import pandas as pd


def _mk(vec_ids, embs, labels):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.asarray(vec_ids, np.int64),
        "embedding": [np.asarray(e, np.float32) for e in embs],
        "label": np.asarray(labels, np.int32),
    }))


def test_hand_replay(ray_session):
    from sits_ray.stages.perceptron import perceptron_train_int

    # modulus=1 -> all rows train, in vec_id order; dim=2
    # quantized: x1=(10000,0), y=+1; x2=(0,10000), y=-1
    ds = _mk([1, 2], [[1.0, 0.0], [0.0, 1.0]], [0, 3])
    m = perceptron_train_int(ds, modulus=1, cap=10)
    # step1: w=0,b=0 -> margin 0 <= 0 -> w=(10000,0), b=10000
    # step2: y=-1, dot=0, margin=-1*(0+10000)=-10000 <=0 ->
    #         w=(10000,-10000), b=0
    assert m["w"].tolist() == [10000, -10000]
    assert m["b"] == 0
    assert m["n_updates"] == 2


def test_score_census(ray_session):
    from sits_ray.stages.perceptron import (perceptron_score,
                                            perceptron_train_int)

    ds = _mk([1, 2, 3, 4],
             [[1.0, 0.0], [0.0, 1.0], [0.9, -0.1], [-0.5, 0.8]],
             [0, 3, 0, 3])
    model = perceptron_train_int(ds, modulus=1, cap=2)
    out = perceptron_score(ds, model)
    # w=(10000,-10000), b=0: margins x3 = 10000*9000-10000*(-1000) > 0,
    # x4 < 0 -> all four classified correctly vs (label==0)
    assert out.label.tolist() == [0, 3]
    assert out.n.tolist() == [2, 2]
    assert out.n_pred_pos.tolist() == [2, 0]
    assert out.n_correct.tolist() == [2, 2]


def test_cap_and_modulus(ray_session):
    from sits_ray.stages.perceptron import perceptron_train_int

    ds = _mk(list(range(10)),
             [[float(i) / 10, 0.1] for i in range(10)],
             [0] * 5 + [1] * 5)
    m = perceptron_train_int(ds, modulus=3, cap=2)
    # eligible ids 0,3,6,9 -> cap keeps 0,3
    assert m["n_train"] == 2


def test_separable_converges_after_one_epoch_replay(ray_session):
    from sits_ray.stages.perceptron import (perceptron_score,
                                            perceptron_train_int)

    rng = np.random.default_rng(7)
    n = 60
    x = rng.normal(0, 0.2, size=(n, 4)).astype(np.float32)
    lab = (np.arange(n) % 2).astype(np.int32)
    x[:, 0] += np.where(lab == 0, 1.0, -1.0)  # strongly separable on dim 0
    ds = _mk(list(range(n)), list(x), lab)
    model = perceptron_train_int(ds, modulus=1, cap=n)
    out = perceptron_score(ds, model)
    acc = out.n_correct.sum() / out.n.sum()
    assert acc >= 0.95
