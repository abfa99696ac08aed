"""Integer-exact online perceptron (Rosenblatt 1958) over quantized
embeddings — the supervised member of the integer-exact iterative-training
family (kmeans.lloyd_int, som.som_batch_int): train on a small seeded
sample, certify the ENTIRE learned model cross-engine by scoring the full
corpus with exact int64 margins.

Reference analog: sits' train-once / classify-everywhere factory shape
(R/sits_machine_learning.R, R/sits_classify.R) — the model is built from
a bounded labelled sample on the driver and broadcast into a stateless
vectorized scoring pass; here the learning rule itself is also replayed
bit-for-bit by a recursive-CTE SQL twin.

Contracts (mirror of the SQL twin in queries.py):
- features quantize via the shared ``similarity.quantize_i64`` grid
  (floor(x*10000 + 0.5) in DOUBLE);
- binary target y = +1 if label == pos_label else -1;
- samples replay in vec_id ASC order; update fires when
  ``y * (w . qx + b) <= 0`` (ties update — including the all-zero start),
  ``w += y*qx``, ``b += y*10000`` (bias step on the feature scale);
- every margin is an exact int64: |w_i| <= cap * max|qx| and the 64-term
  dot stays far below 2^53, so even a double-accumulating SQL
  list_dot_product is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sits_ray.arrowutil import list_matrix
from sits_ray.stages.similarity import quantize_i64


def perceptron_train_int(ds, modulus: int = 251, cap: int = 256,
                         pos_label: int = 0) -> dict:
    """Train on the seeded sample ``vec_id % modulus == 0`` (first
    ``cap`` rows in vec_id order). The sample is bounded by construction
    (cap), so the driver-side gather and the strictly sequential replay
    are O(cap) regardless of corpus size. Returns
    {w: int64[dim], b: int, n_train: int, n_updates: int}."""

    def pick(t: pa.Table) -> pa.Table:
        # pyarrow.compute has no modulo kernel — mask via numpy
        keep = t["vec_id"].to_numpy(zero_copy_only=False) % modulus == 0
        return t.filter(pa.array(keep))

    rows = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values("vec_id").head(cap).reset_index(drop=True)
    m = np.stack(rows["embedding"].to_numpy())
    q = quantize_i64(m)
    y = np.where(rows["label"].to_numpy() == pos_label, 1, -1).astype(
        np.int64)
    dim = q.shape[1]
    w = np.zeros(dim, dtype=np.int64)
    b = 0
    upd = 0
    for i in range(len(q)):
        margin = int(y[i]) * (int(q[i] @ w) + b)
        if margin <= 0:
            w = w + y[i] * q[i]
            b += int(y[i]) * 10000
            upd += 1
    return {"w": w, "b": b, "n_train": int(len(q)), "n_updates": upd,
            "pos_label": int(pos_label)}


def perceptron_score(ds, model: dict) -> pd.DataFrame:
    """Score the full corpus with the trained weights: one stateless
    vectorized pass (int64 matmul per batch, weights broadcast in the
    closure), per-label count partials folded on the driver. Returns
    one row per label: (label, n, n_pred_pos, n_correct) — n_correct
    counts agreement with the binary target (label == pos_label)."""
    w = model["w"]
    b = int(model["b"])
    pos = int(model["pos_label"])

    def part(t: pa.Table) -> pa.Table:
        m = list_matrix(t["embedding"])
        q = quantize_i64(m)
        margin = q @ w + b
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        pred_pos = margin > 0
        correct = pred_pos == (lab == pos)
        df = pd.DataFrame({"label": lab,
                           "p": pred_pos.astype(np.int64),
                           "c": correct.astype(np.int64)})
        g = df.groupby("label", sort=False).agg(
            n=("p", "size"), n_pred_pos=("p", "sum"),
            n_correct=("c", "sum")).reset_index()
        return pa.table({
            "label": pa.array(g["label"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "n_pred_pos": pa.array(g["n_pred_pos"].to_numpy(np.int64)),
            "n_correct": pa.array(g["n_correct"].to_numpy(np.int64)),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("label", sort=True)[["n", "n_pred_pos",
                                              "n_correct"]]
                .sum().reset_index())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out
