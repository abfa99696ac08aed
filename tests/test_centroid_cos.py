"""Label-centroid cosine (similarity.label_centroid_cosine): orthogonal
and identical centroids, count cancellation, quantize grid."""

import numpy as np
import pandas as pd


def _mk(labels, vecs):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "embedding": [np.asarray(v, np.float32) for v in vecs],
        "label": np.asarray(labels, np.int32)}))


def test_orthogonal_centroids(ray_session):
    from sits_ray.stages.similarity import label_centroid_cosine

    out = label_centroid_cosine(_mk(
        [0, 0, 1, 1],
        [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 2.0]]))
    r = out.iloc[0]
    assert (int(r.label_a), int(r.label_b)) == (0, 1)
    assert (int(r.n_a), int(r.n_b)) == (2, 2)
    assert float(r.cosine) == 0.0


def test_identical_direction_count_cancels(ray_session):
    from sits_ray.stages.similarity import label_centroid_cosine

    # label 1 has twice the rows but the same direction -> cosine 1
    out = label_centroid_cosine(_mk(
        [0, 1, 1, 1, 1],
        [[0.3, 0.4]] + [[0.3, 0.4]] * 4))
    assert abs(float(out.cosine.iloc[0]) - 1.0) < 1e-15


def test_hand_cosine(ray_session):
    from sits_ray.stages.similarity import label_centroid_cosine

    # centroid sums (quantized x1e4): a = (10000, 0); b = (10000, 10000)
    out = label_centroid_cosine(_mk(
        [0, 1], [[1.0, 0.0], [1.0, 1.0]]))
    import math
    want = 1e8 / (math.sqrt(1e8) * math.sqrt(2e8))
    assert float(out.cosine.iloc[0]) == want
