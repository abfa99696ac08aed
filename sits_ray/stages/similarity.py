"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — baseline: numpy matmul per batch against a
  broadcast (``ray.put``) normalized query matrix; exact cosine top-k.
* :class:`IVFIndex` / :func:`ivf_topk` — the scale path: coarse k-means
  centroids (trained on a driver-side sample), each vector assigned to its
  nearest centroid inside ``map_batches`` (bucket column), queries probe
  only the ``nprobe`` closest buckets — the classic IVF-flat layout. At
  100 TB the bucket column becomes the partition key of the vector
  Parquet, so a probe reads only ``nprobe/nlist`` of the data
  (partition pruning at the read).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from sits_ray.arrowutil import list_matrix
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k for each query row: per-batch matmul + partial
    top-k, final merge on the (tiny) candidate set."""
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(list_matrix(t[vec_col]))
        sims = m @ qm.T  # (batch, nq)
        ids = t[id_col].to_numpy()
        # partial top-k per query within the batch
        kk = min(k, ids.size)
        out_q, out_id, out_sim = [], [], []
        for j in range(qm.shape[0]):
            part = np.argpartition(sims[:, j], -kk)[-kk:]
            out_q.extend([j] * kk)
            out_id.extend(ids[part].tolist())
            out_sim.extend(sims[part, j].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             id_col: pa.array(out_id, pa.int64()),
             "sim": pa.array(out_sim, pa.float64())}
        )

    cand = ds.map_batches(score, batch_format="pyarrow")
    # final exact merge over ~k * n_batches candidates (small)
    pdf = cand.to_pandas()
    pdf = (
        pdf.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return pdf


class IVFIndex:
    """Coarse quantizer: k-means centroids over a sample (Lloyd, fixed
    iterations, deterministic seed)."""

    def __init__(self, nlist: int = 16, iters: int = 10, seed: int = 11):
        self.nlist, self.iters, self.seed = nlist, iters, seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.default_rng(self.seed)
        init = x[rng.choice(x.shape[0], size=min(self.nlist, x.shape[0]), replace=False)]
        c = init.copy()
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(c.shape[0]):
                sel = x[assign == j]
                if len(sel):
                    c[j] = _normalize(sel.mean(axis=0, keepdims=True))[0]
        self.centroids = c
        return self

    def assign(self, m: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(m) @ self.centroids.T, axis=1)


def ivf_topk(ds, query_vecs: np.ndarray, k: int = 10, nlist: int = 16,
             nprobe: int = 4, sample_rows: int = 2048,
             vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF-flat approximate top-k: train on a sample, bucket vectors in a
    map_batches pass, then score only the probed buckets."""
    sample = np.asarray(
        [r[vec_col] for r in ds.take(sample_rows)], dtype=np.float64
    )
    index = IVFIndex(nlist=nlist).fit(sample)
    idx_ref = ray.put(index)
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probes = np.argsort(q @ index.centroids.T, axis=1)[:, ::-1][:, :nprobe]
    probe_sets = [set(p.tolist()) for p in probes]
    probe_ref = ray.put(probe_sets)
    q_ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        qm = ray.get(q_ref)
        psets = ray.get(probe_ref)
        m = _normalize(list_matrix(t[vec_col]))
        ids = t[id_col].to_numpy()
        buckets = ix.assign(m)
        out_q, out_id, out_sim = [], [], []
        for j, pset in enumerate(psets):
            mask = np.isin(buckets, list(pset))
            if not mask.any():
                continue
            sims = m[mask] @ qm[j]
            sel_ids = ids[mask]
            kk = min(k, sel_ids.size)
            part = np.argpartition(sims, -kk)[-kk:]
            out_q.extend([j] * kk)
            out_id.extend(sel_ids[part].tolist())
            out_sim.extend(sims[part].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             id_col: pa.array(out_id, pa.int64()),
             "sim": pa.array(out_sim, pa.float64())}
        )

    pdf = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return (
        pdf.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
