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


def label_neurons(assigned_ds, n_neurons: int, label_col: str = "label",
                  bmu_col: str = "bmu"):
    """Per-(neuron, label) counts and prior probabilities
    (``.som_label_neurons``, ``R/api_som.R:16-49``): label frequency of
    the samples mapped to each neuron. Distributed partial counts ->
    tiny (neurons x labels) driver table."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([bmu_col, label_col]).aggregate([(bmu_col, "count")])
        return g.rename_columns([bmu_col, label_col, "n"])

    rows = assigned_ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[tuple[int, str], int] = {}
    for r in rows:
        k = (int(r[bmu_col]), str(r[label_col]))
        agg[k] = agg.get(k, 0) + int(r["n"])
    totals: dict[int, int] = {}
    for (b, _), n in agg.items():
        totals[b] = totals.get(b, 0) + n
    out = {"id_neuron": [], "label": [], "count": [], "prior_prob": []}
    for (b, lab), n in sorted(agg.items()):
        out["id_neuron"].append(b)
        out["label"].append(lab)
        out["count"].append(n)
        out["prior_prob"].append(n / totals[b])
    return pa.table(
        {
            "id_neuron": pa.array(out["id_neuron"], pa.int64()),
            "label": pa.array(out["label"]),
            "count": pa.array(out["count"], pa.int64()),
            "prior_prob": pa.array(out["prior_prob"], pa.float64()),
        }
    )


def bayes_neuron_posteriors(neuron_tbl: pa.Table, grid: np.ndarray,
                            radius: int = 2) -> pa.Table:
    """Posterior label probability per neuron via the reference's
    neighborhood Bayesian shrink (``.som_bayes_estimate``,
    ``R/api_som.R:69-126``): neighbors are neurons at EXACT grid distance
    ``radius``; ``eta = |0.9999999 - max prior|``;
    ``post = var/(eta+var) * prior + eta/(eta+var) * mean`` over the
    neighbor priors of the same label (zeros for absent labels);
    undefined var/mean (<2 neighbors) -> posterior = prior. Runs on the
    tiny neuron table (driver-side, like the reference)."""
    ids = neuron_tbl["id_neuron"].to_numpy()
    labs = np.asarray(neuron_tbl["label"].to_pylist())
    prior = neuron_tbl["prior_prob"].to_numpy()
    # exact squared-distance match (no float compare)
    d2 = ((grid[:, None, :] - grid[None, :, :]) ** 2).sum(axis=2)
    neigh = {i: np.flatnonzero(d2[i] == radius * radius) for i in range(len(grid))}
    prior_of = {(int(i), l): p for i, l, p in zip(ids, labs, prior)}
    max_prior = {}
    for i, p in zip(ids, prior):
        max_prior[int(i)] = max(max_prior.get(int(i), 0.0), p)
    post = np.empty(len(ids))
    for r in range(len(ids)):
        nb = neigh[int(ids[r])]
        if nb.size < 2:
            post[r] = prior[r]
            continue
        pp = np.array([prior_of.get((int(j), labs[r]), 0.0) for j in nb])
        var = pp.var(ddof=1)
        mean = pp.mean()
        eta = abs(0.9999999 - max_prior[int(ids[r])])
        post[r] = (var / (eta + var)) * prior[r] + (eta / (eta + var)) * mean
    return neuron_tbl.append_column("post_prob", pa.array(post))


def neuron_majority_labels(neuron_tbl: pa.Table) -> dict[int, str]:
    """Majority label per neuron (ties -> lexicographically first, the
    reference's table()-order which.max)."""
    best: dict[int, tuple[int, str]] = {}
    for r in neuron_tbl.to_pylist():
        i, lab, n = int(r["id_neuron"]), str(r["label"]), int(r["count"])
        cur = best.get(i)
        if cur is None or n > cur[0] or (n == cur[0] and lab < cur[1]):
            best[i] = (n, lab)
    return {i: lab for i, (_, lab) in best.items()}


def som_clean_samples(assigned_ds, neuron_post: pa.Table,
                      prior_threshold: float = 0.6,
                      posterior_threshold: float = 0.6,
                      keep: tuple[str, ...] = ("clean", "analyze"),
                      label_col: str = "label", bmu_col: str = "bmu"):
    """``sits_som_clean_samples`` (``R/sits_som.R:266-320``): eval each
    sample by its neuron's (prior, posterior) for the sample's own label —
    clean / analyze / remove — and keep the requested outcomes. The tiny
    neuron table is broadcast; the sample pass is one map_batches."""
    import pyarrow.compute as pc

    # dense (neurons x labels) prior/post matrices -> the per-sample pass
    # is two vectorized gathers + np.select (no per-row Python)
    ids = neuron_post["id_neuron"].to_numpy()
    labs = [str(x) for x in neuron_post["label"].to_pylist()]
    uniq_labels = sorted(set(labs))
    lab_idx = {l: i for i, l in enumerate(uniq_labels)}
    n_neurons = int(ids.max()) + 1 if len(ids) else 0
    prior_m = np.zeros((n_neurons, len(uniq_labels)))
    post_m = np.zeros_like(prior_m)
    for i, l, pr, po in zip(
        ids, labs, neuron_post["prior_prob"].to_numpy(),
        neuron_post["post_prob"].to_numpy(),
    ):
        prior_m[int(i), lab_idx[l]] = pr
        post_m[int(i), lab_idx[l]] = po
    mats_ref = ray.put((prior_m, post_m, pa.array(uniq_labels)))

    def evaluate(t: pa.Table) -> pa.Table:
        prior_mat, post_mat, lab_arr = ray.get(mats_ref)
        bm = t[bmu_col].to_numpy().astype(np.int64)
        lbl = t[label_col]
        li = pc.index_in(
            pc.cast(lbl.combine_chunks() if isinstance(lbl, pa.ChunkedArray) else lbl,
                    pa.string()),
            value_set=lab_arr,
        )
        known = pc.is_valid(li).to_numpy(zero_copy_only=False)
        li_np = pc.fill_null(li, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        in_grid = (bm >= 0) & (bm < prior_mat.shape[0]) & known
        bi = np.where(in_grid, bm, 0)
        prior = np.where(in_grid, prior_mat[bi, li_np], 0.0)
        post = np.where(in_grid, post_mat[bi, li_np], 0.0)
        evals = np.select(
            [(prior >= prior_threshold) & (post >= posterior_threshold),
             prior >= prior_threshold],
            ["clean", "analyze"], default="remove",
        )
        t = t.append_column("eval", pa.array(evals))
        return t.filter(pc.is_in(t["eval"], value_set=pa.array(list(keep))))

    return assigned_ds.map_batches(evaluate, batch_format="pyarrow")


def som_evaluate_cluster(assigned_ds, neuron_tbl: pa.Table,
                         label_col: str = "label", bmu_col: str = "bmu"):
    """``sits_som_evaluate_cluster`` (``R/sits_som.R:340-446``): group
    samples by their neuron's majority-label CLUSTER and report the class
    mixture percentage per cluster. Distributed counts; tiny output."""
    major = neuron_majority_labels(neuron_tbl)
    major_ref = ray.put(major)

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(major_ref)
        cl = [m.get(int(b), "No_Samples") for b in t[bmu_col].to_numpy()]
        t2 = pa.table({"cluster": pa.array(cl), "class": t[label_col]})
        g = t2.group_by(["cluster", "class"]).aggregate([("cluster", "count")])
        return g.rename_columns(["cluster", "class", "n"])

    rows = assigned_ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[tuple[str, str], int] = {}
    for r in rows:
        k = (str(r["cluster"]), str(r["class"]))
        agg[k] = agg.get(k, 0) + int(r["n"])
    totals: dict[str, int] = {}
    for (c, _), n in agg.items():
        totals[c] = totals.get(c, 0) + n
    out = {"cluster": [], "class": [], "n": [], "mixture_pct": []}
    for (c, cls), n in sorted(agg.items()):
        out["cluster"].append(c)
        out["class"].append(cls)
        out["n"].append(n)
        out["mixture_pct"].append(100.0 * n / totals[c])
    return pa.table(
        {
            "cluster": pa.array(out["cluster"]),
            "class": pa.array(out["class"]),
            "n": pa.array(out["n"], pa.int64()),
            "mixture_pct": pa.array(out["mixture_pct"], pa.float64()),
        }
    )


def som_map(ds, vec_col: str = "embedding", id_col: str = "vec_id",
            xdim: int = 4, ydim: int = 4, sample_rows: int = 1024,
            epochs: int = 10, extra_cols: tuple[str, ...] = ()):
    """Train on a sample, broadcast the codebook, assign BMUs distributedly.
    Returns a Dataset of (id, [extras], bmu, bmu_x, bmu_y, quant_err);
    pass ``extra_cols=("label",)`` to carry sample labels through for
    ``label_neurons`` / ``som_clean_samples``."""
    sample = np.asarray([r[vec_col] for r in ds.take(sample_rows)], dtype=np.float64)
    som = SOM(xdim, ydim).fit(sample, epochs=epochs)
    ref = ray.put(som)

    def assign(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        m = list_matrix(t[vec_col])
        b = s.bmu(m)
        qe = np.sqrt(((m - s.codebook[b]) ** 2).sum(axis=1))
        cols = {id_col: t[id_col]}
        for c in extra_cols:
            cols[c] = t[c]
        cols.update(
            {
                "bmu": pa.array(b.astype(np.int64)),
                "bmu_x": pa.array((b // s.ydim).astype(np.int64)),
                "bmu_y": pa.array((b % s.ydim).astype(np.int64)),
                "quant_err": pa.array(qe),
            }
        )
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow"), som


# --- integer-exact batch SOM (SQL-replayable training) -----------------------
def som_neighborhood(xdim: int, ydim: int, radius: int) -> np.ndarray:
    """(m, m) integer neighborhood weights on the rectangular grid:
    2 for the unit itself, 1 for units within Manhattan distance
    ``radius``, 0 beyond. Unit index j = y * xdim + x."""
    m = xdim * ydim
    xs = np.arange(m) % xdim
    ys = np.arange(m) // xdim
    man = np.abs(xs[:, None] - xs[None, :]) + np.abs(ys[:, None] - ys[None, :])
    H = (man <= radius).astype(np.int64)
    np.fill_diagonal(H, 2)
    return H


def som_batch_int(ds, xdim: int = 3, ydim: int = 3, iters: int = 3,
                  seed: int = 23, radii: tuple[int, ...] | None = None,
                  vec_col: str = "embedding"):
    """Integer-exact Kohonen BATCH SOM (Kohonen 1998 batch rule with an
    integer neighborhood kernel and a shrinking-radius schedule): per
    round ONE map_batches pass of m-row integer partials (BMU counts +
    per-dim sums), driver-side neighborhood mixing ``H @ S / H @ n``
    (exact int64 matmuls), exact round-half-up requantization, ray.put
    broadcast — zero shuffles, the lloyd_int scale shape. Unlike
    lloyd_int the update couples units through the grid, so the gate
    certifies a genuinely different training dynamic. Returns long-form
    (unit, d, w, n) after ``iters`` rounds; the whole loop replays as a
    DuckDB recursive CTE (queries._som_batch_int_sql)."""
    import pandas as pd

    from sits_ray.stages.kmeans import _fld, make_int_centroids, quantize_batch

    m = xdim * ydim
    if radii is None:
        radii = tuple(max(0, (iters - 1 - i)) for i in range(iters))
    assert len(radii) == iters
    first = ds.take(1)
    if not first:
        return pd.DataFrame(
            {"unit": pd.Series([], dtype=np.int64),
             "d": pd.Series([], dtype=np.int64),
             "w": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64)}
        )
    dim = len(first[0][vec_col])
    W = make_int_centroids(dim, m, seed)
    sizes = np.zeros(m, dtype=np.int64)

    for it in range(iters):
        w_ref = ray.put(np.ascontiguousarray(W))

        def partial(t: pa.Table, _w_ref=w_ref) -> pa.Table:
            Wc = ray.get(_w_ref)
            X = quantize_batch(list_matrix(t[vec_col]))
            diff = X[:, None, :] - Wc[None, :, :]
            dd = np.einsum("nkd,nkd->nk", diff, diff)
            a = np.argmin(dd, axis=1)  # first-min == SQL min-unit tiebreak
            cnt = np.bincount(a, minlength=m).astype(np.int64)
            sums = np.zeros((m, X.shape[1]), dtype=np.int64)
            for j in range(m):
                sel = a == j
                if sel.any():
                    sums[j] = X[sel].sum(axis=0)
            return pa.table(
                {
                    "unit": pa.array(np.arange(m, dtype=np.int64)),
                    "n": pa.array(cnt),
                    "s": pa.array(list(sums)),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        S = np.zeros((m, dim), dtype=np.int64)
        sizes = np.zeros(m, dtype=np.int64)
        for r in rows:
            j = int(r["unit"])
            sizes[j] += int(r["n"])
            S[j] += np.asarray(r["s"], dtype=np.int64)
        H = som_neighborhood(xdim, ydim, radii[it])
        NS = H @ S
        NN = H @ sizes
        nz = NN > 0
        upd = _fld(2 * NS + NN[:, None], 2 * np.maximum(NN, 1)[:, None])
        W = np.where(nz[:, None], upd, W)

    return pd.DataFrame(
        {
            "unit": np.repeat(np.arange(m, dtype=np.int64), dim),
            "d": np.tile(np.arange(1, dim + 1, dtype=np.int64), m),
            "w": W.reshape(-1),
            "n": np.repeat(sizes, dim),
        }
    )
