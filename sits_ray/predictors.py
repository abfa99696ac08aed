"""Predictor-table helpers — the reference's predictors API re-expressed.

Analog of ``R/sits_predictors.R`` + ``R/api_predictors.R`` +
``R/api_stats.R``: a samples Dataset (vector rows) pivots into one row
per sample whose first two columns are categorical (``label_id``,
``label``) followed by the numeric feature columns; training statistics
are per-feature (q02, q98) quantiles consumed by between-quantile
normalization (``C_normalize_data`` == ``kernels/ml.normalize_minmax``);
``pred_sample`` is a per-label fraction.

Scale shape: the reference's predictors operate on a TRAINING SAMPLES
tibble — bounded by design, never the corpus — so these helpers are
driver-side pandas over a small materialized table. The corpus-scale
scoring path is the actor-pool scorer (``stages/classify.py``); the
corpus-scale pivot is ``stages/eventops.predictor_matrix_kernel``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sits_ray.kernels.ml import normalize_minmax

PRED_HEAD = ("label_id", "label")


def _list_matrix(col) -> np.ndarray:
    import pyarrow as pa

    if isinstance(col, (pa.ChunkedArray, pa.Array)):
        from sits_ray.stages.classify import list_matrix

        return list_matrix(col)
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def predictors(samples, vec_col: str = "embedding", id_col: str = "vec_id",
               label_col: str = "label") -> pd.DataFrame:
    """Samples (Dataset / pyarrow.Table / pandas) -> predictors frame:
    index = sample id, columns = (label_id, label, x0..x{d-1}).
    ``label_id`` is the 1-based index into the sorted distinct labels
    (the reference's categorical head, ``R/sits_predictors.R:9``)."""
    import pyarrow as pa

    if hasattr(samples, "to_arrow_refs") or hasattr(samples, "take_batch"):
        samples = samples.to_pandas()  # samples tables are bounded by design
    if isinstance(samples, pa.Table):
        samples = samples.to_pandas()
    X = _list_matrix(samples[vec_col].to_numpy()
                     if isinstance(samples, pd.DataFrame) else samples[vec_col])
    labels = np.asarray(samples[label_col], dtype=object)
    uniq = sorted(set(labels.tolist()))
    lid = {l: i + 1 for i, l in enumerate(uniq)}
    out = pd.DataFrame(
        {"label_id": [lid[l] for l in labels], "label": labels},
        index=pd.Index(np.asarray(samples[id_col]), name=id_col),
    )
    for j in range(X.shape[1]):
        out[f"x{j}"] = X[:, j]
    return out


def pred_features(pred: pd.DataFrame) -> np.ndarray:
    """Numeric feature block (everything after the categorical head —
    ``.pred_features``, ``R/api_predictors.R:86-92``)."""
    cols = [c for c in pred.columns if c not in PRED_HEAD]
    return pred[cols].to_numpy(dtype=np.float64)


def pred_references(pred: pd.DataFrame) -> np.ndarray:
    """Label vector (``.pred_references``, ``R/api_predictors.R:114``)."""
    return pred["label"].to_numpy(dtype=object)


def samples_stats(pred: pd.DataFrame) -> dict:
    """Per-feature (q02, q98) training statistics (``sits_stats``,
    ``R/sits_predictors.R:204`` + ``R/api_stats.R``)."""
    X = pred_features(pred)
    return {
        "q02": np.quantile(X, 0.02, axis=0),
        "q98": np.quantile(X, 0.98, axis=0),
    }


def pred_normalize(pred: pd.DataFrame, stats: dict) -> pd.DataFrame:
    """Between-quantile normalization of the feature block
    (``.pred_normalize``, ``R/api_predictors.R:124-132`` →
    ``C_normalize_data`` == ``kernels/ml.normalize_minmax``)."""
    out = pred.copy()
    X = normalize_minmax(pred_features(pred),
                         np.asarray(stats["q02"]), np.asarray(stats["q98"]))
    cols = [c for c in pred.columns if c not in PRED_HEAD]
    for j, c in enumerate(cols):
        out[c] = X[:, j]
    return out


def pred_sample(pred: pd.DataFrame, frac: float) -> pd.DataFrame:
    """Per-label fraction (``.pred_sample``, ``R/api_predictors.R:151`` —
    ``group_by(label) |> slice_sample(prop=frac)``), DETERMINISTIC here:
    content-hash threshold per sample id instead of RNG, so the split is
    reproducible across runs and cluster sizes (the repo's sampling
    discipline, ``stages/sampling.py``)."""
    ids = pred.index.to_numpy()
    h = pd.util.hash_array(np.asarray(ids, dtype=object)) % np.uint64(1_000_000)
    keep = h < np.uint64(int(round(frac * 1_000_000)))
    return pred.loc[keep]
