"""Stateful per-series scoring — the ``sits_classify`` analog
(``R/sits_classify.R:162-197``, ``R/api_classify.R:525-619``): an
actor-pool ``map_batches`` stage whose model state is deserialized ONCE per
actor in ``__init__`` (the reference ships weights to workers via closure
serialization; we keep them in actor state / the object store), scoring
batches of series vectors into per-label probabilities + argmax label +
uncertainty, with softmax/normalize semantics from
``src/softmax.cpp`` / ``src/label_class.cpp`` / ``src/uncertainty.cpp``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from sits_ray.arrowutil import list_matrix

from sits_ray.kernels.ml import entropy_probs, label_max_prob, margin_probs, softmax


def make_linear_model(n_features: int, n_labels: int, seed: int = 13) -> dict:
    """Deterministic toy linear scorer (stand-in for a trained model's
    serialized weights; the plumbing — broadcast once, load per actor —
    is the real deliverable)."""
    rng = np.random.default_rng(seed)
    return {
        "W": rng.normal(0, 0.3, size=(n_features, n_labels)),
        "b": rng.normal(0, 0.1, size=n_labels),
        "labels": [f"label{i}" for i in range(n_labels)],
    }


class SeriesScorer:
    """Actor-pool scorer: embedding/predictor rows -> probs + label + entropy.

    ``model_ref`` is a ``ray.put`` handle — the weights live once in the
    object store and are fetched once per actor (zero-copy for numpy), not
    per batch or per closure.
    """

    def __init__(self, model_ref, vec_col: str = "embedding", id_col: str = "vec_id"):
        self.model = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # predict_probs owns the model-kind dispatch for ALL families
        # (its fallback is the plain softmax(X@W+b) linear scorer) —
        # one dispatch table, not two drifting copies
        from sits_ray.stages.train import predict_probs

        m = list_matrix(batch[self.vec_col])
        probs = predict_probs(self.model, m)
        label_idx = label_max_prob(probs)  # 1-based, NaN-aware
        ent = entropy_probs(probs)
        marg = margin_probs(probs)
        cols = {
            self.id_col: batch[self.id_col],
            "pred_label": pa.array(
                [
                    self.model["labels"][int(i) - 1] if not np.isnan(i) else None
                    for i in label_idx
                ]
            ),  # type inferred: labels may be strings or ints
            "entropy": pa.array(ent),
            "margin": pa.array(marg),
        }
        for j, name in enumerate(self.model["labels"]):
            cols[f"prob_{name}"] = pa.array(probs[:, j])
        return pa.table(cols)


def classify(ds, model: dict, vec_col="embedding", id_col="vec_id",
             batch_size: int = 1024, concurrency=(1, 4)):
    """Score a Dataset of vectors with an actor pool."""
    model_ref = ray.put(model)
    return ds.map_batches(
        SeriesScorer,
        fn_constructor_kwargs=dict(model_ref=model_ref, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
