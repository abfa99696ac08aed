"""Self-organizing map (Kohonen SOM) — minimal batch trainer, the
``sits_som_map`` analog (reference ``R/sits_som.R:100-446``, kernel
``src/kohonen_som.cpp``): a grid of codebook vectors trained on a sample
of series/vectors; each input maps to its best-matching unit (BMU), used
for sample quality analysis and undersampling.

Scale shape: train on a driver-side sample (the reference trains on
in-memory samples too), broadcast the codebook, assign BMUs in
``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from sits_ray.arrowutil import list_matrix


class SOM:
    def __init__(self, xdim: int = 4, ydim: int = 4, seed: int = 31):
        self.xdim, self.ydim, self.seed = xdim, ydim, seed
        self.codebook: np.ndarray | None = None
        gx, gy = np.meshgrid(np.arange(xdim), np.arange(ydim), indexing="ij")
        self.grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)

    def fit(self, data: np.ndarray, epochs: int = 20,
            alpha: tuple[float, float] = (0.5, 0.01),
            radius: tuple[float, float] | None = None) -> "SOM":
        x = np.asarray(data, dtype=np.float64)
        rng = np.random.default_rng(self.seed)
        k = self.xdim * self.ydim
        cb = x[rng.choice(x.shape[0], size=k, replace=x.shape[0] < k)].copy()
        if radius is None:
            radius = (max(self.xdim, self.ydim) / 2.0, 0.5)
        n_steps = epochs * x.shape[0]
        step = 0
        for _ in range(epochs):
            order = rng.permutation(x.shape[0])
            for idx in order:
                t = step / max(n_steps - 1, 1)
                a = alpha[0] * (alpha[1] / alpha[0]) ** t
                r = radius[0] * (radius[1] / radius[0]) ** t
                v = x[idx]
                bmu = int(np.argmin(((cb - v) ** 2).sum(axis=1)))
                dist2 = ((self.grid - self.grid[bmu]) ** 2).sum(axis=1)
                h = np.exp(-dist2 / (2.0 * r * r))
                cb += (a * h)[:, None] * (v - cb)
                step += 1
        self.codebook = cb
        return self

    def bmu(self, data: np.ndarray) -> np.ndarray:
        x = np.atleast_2d(np.asarray(data, dtype=np.float64))
        d = ((x[:, None, :] - self.codebook[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d, axis=1)


def som_map(ds, vec_col: str = "embedding", id_col: str = "vec_id",
            xdim: int = 4, ydim: int = 4, sample_rows: int = 1024, epochs: int = 10):
    """Train on a sample, broadcast the codebook, assign BMUs distributedly.
    Returns a Dataset of (id, bmu, bmu_x, bmu_y, quant_err)."""
    sample = np.asarray([r[vec_col] for r in ds.take(sample_rows)], dtype=np.float64)
    som = SOM(xdim, ydim).fit(sample, epochs=epochs)
    ref = ray.put(som)

    def assign(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        m = list_matrix(t[vec_col])
        b = s.bmu(m)
        qe = np.sqrt(((m - s.codebook[b]) ** 2).sum(axis=1))
        return pa.table(
            {
                id_col: t[id_col],
                "bmu": pa.array(b.astype(np.int64)),
                "bmu_x": pa.array((b // s.ydim).astype(np.int64)),
                "bmu_y": pa.array((b % s.ydim).astype(np.int64)),
                "quant_err": pa.array(qe),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
