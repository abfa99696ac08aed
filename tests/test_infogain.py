"""Information gain screen (similarity.dim_info_gain): perfect predictor
dimension, useless dimension, hand entropies."""

import math

import numpy as np
import pandas as pd


def _mk(labels, vecs):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "embedding": [np.asarray(v, np.float32) for v in vecs],
        "label": np.asarray(labels, np.int32)}))


def test_perfect_vs_useless_dim(ray_session):
    from sits_ray.stages.similarity import dim_info_gain

    # dim 1 sign == label exactly; dim 2 always positive (useless)
    labels = [0, 0, 1, 1]
    vecs = [[-1.0, 1.0], [-1.0, 1.0], [1.0, 1.0], [1.0, 1.0]]
    out = dim_info_gain(_mk(labels, vecs), k=2)
    assert out.d.tolist() == [1, 2]
    # H(label) = ln 2; dim1 gain = ln 2; dim2 gain = 0
    assert abs(float(out.info_gain.iloc[0]) - math.log(2.0)) < 1e-12
    assert abs(float(out.info_gain.iloc[1])) < 1e-12


def test_hand_partial_split(ray_session):
    from sits_ray.stages.similarity import dim_info_gain

    # dim1 signs: label0 -> [-, -, +]; label1 -> [+, +, +]
    labels = [0, 0, 0, 1, 1, 1]
    vecs = [[-1.0], [-1.0], [1.0], [1.0], [1.0], [1.0]]
    out = dim_info_gain(_mk(labels, vecs), k=1)
    n = 6
    h_label = -2 * (0.5 * math.log(0.5))
    # sign=1 group: {label0:1, label1:3}, n_s=4; sign=0: {label0:2}, n_s=2
    hcond = -((1 / n) * math.log(1 / 4) + (3 / n) * math.log(3 / 4)
              + (2 / n) * math.log(2 / 2))
    r = out.iloc[0]
    assert abs(float(r.h_label) - h_label) < 1e-12
    assert abs(float(r.h_cond) - hcond) < 1e-12
    assert abs(float(r.info_gain) - (h_label - hcond)) < 1e-12
