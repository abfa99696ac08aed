"""Distributed k-means over an embedding column.

Two pieces, mirroring the reference's cluster-then-label workflow
(``/root/reference/R/sits_cluster.R`` builds cluster structure over
sample series; we add the Lloyd variant the dendrogram path lacks,
since partitional clustering is the scale path for 100 TB corpora):

- :func:`assign_clusters` — one streaming pass that labels every vector
  with its nearest centroid. Scores are LEFT-ASSOCIATED sequential
  dot products (the ``lsh_ann_topk`` literal-accumulation contract), so
  a DuckDB oracle with literal centroid terms reproduces assignments
  bit-for-bit and the gate certifies integer cluster counts.
- :func:`lloyd` — iterative training: each round is ONE ``map_batches``
  pass emitting k partial rows per batch (count, per-dim sums, inertia)
  that combine on the driver (k × dim doubles — tiny), then broadcast
  of the new centroids via ``ray.put``. No shuffle at all: the classic
  mergeable-aggregate shape, wall time = iters × one dataset scan.

Scale notes: partials are O(k·dim) per batch regardless of batch size;
centroids ship once per round through the object store; empty clusters
keep their previous centroid (deterministic, no resampling)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from sits_ray.arrowutil import list_matrix


def make_centroids(dim: int, k: int, seed: int = 7) -> np.ndarray:
    """Deterministic seeded Gaussian centroids (the make_linear_model
    pattern: inline-able as SQL double literals, no engine state)."""
    return np.random.default_rng(seed).normal(0.0, 1.0, size=(k, dim))


def seq_scores(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) nearest-centroid scores ``v·c - 0.5*||c||²`` with the
    dot product accumulated dim-by-dim (left-associated — exactly the
    fold a literal SQL expression chain evaluates)."""
    n = V.shape[0]
    k, dim = C.shape
    S = np.zeros((n, k), dtype=np.float64)
    for j in range(dim):
        S += V[:, j : j + 1] * C[None, :, j]
    return S - half_norms(C)[None, :]


def half_norms(C: np.ndarray) -> np.ndarray:
    """0.5*||c||² per centroid, accumulated dim-by-dim (matches the SQL
    literal computed from the same fold)."""
    k, dim = C.shape
    acc = np.zeros(k, dtype=np.float64)
    for j in range(dim):
        acc += C[:, j] * C[:, j]
    return 0.5 * acc


def assign_clusters(ds, centroids: np.ndarray, vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """Label each vector with argmax (first-max) of :func:`seq_scores`."""
    c_ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        V = list_matrix(t[vec_col])
        a = np.argmax(seq_scores(V, C), axis=1).astype(np.int64)
        return pa.table({id_col: t[id_col], "cluster": pa.array(a)})

    return ds.map_batches(assign, batch_format="pyarrow")


def farthest_point_init(X: np.ndarray, k: int) -> np.ndarray:
    """Deterministic k-center (greedy farthest-point) seeding over a
    sample: start at row 0, repeatedly add the point farthest from the
    chosen set. No RNG state — reproducible across runs and engines."""
    idx = [0]
    d = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        i = int(d.argmax())
        idx.append(i)
        d = np.minimum(d, ((X - X[i]) ** 2).sum(axis=1))
    return X[idx].astype(np.float64).copy()


def lloyd(ds, k: int = 8, iters: int = 4, seed: int = 7,
          vec_col: str = "embedding", sample_rows: int = 512):
    """Distributed Lloyd iterations; returns (centroids, sizes, inertia).

    Init: deterministic farthest-point seeding over the first
    ``sample_rows`` vectors (``seed`` kept for API stability; unused by
    the deterministic init). Per round: broadcast centroids, ONE pass of
    per-batch partials (k rows: count, sum-vector, inertia partial),
    driver combine. ``inertia`` is the end-of-round sum of squared
    distances to the centroids that produced the assignment (reported
    for the last round).
    """
    sample = ds.take(max(sample_rows, 4 * k))
    S0 = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    dim = S0.shape[1]
    C = farthest_point_init(S0, k)

    sizes = np.zeros(k, dtype=np.int64)
    inertia = 0.0
    for _ in range(iters):
        c_ref = ray.put(np.ascontiguousarray(C))

        def partial(t: pa.Table, _c_ref=c_ref) -> pa.Table:
            Cc = ray.get(_c_ref)
            V = list_matrix(t[vec_col])
            S = seq_scores(V, Cc)
            a = np.argmax(S, axis=1)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, V.shape[1]), dtype=np.float64)
            for j in range(k):  # k is tiny; masked sums beat np.add.at
                m = a == j
                if m.any():
                    sums[j] = V[m].sum(axis=0)
            # ||v - c||² = ||v||² - 2*(v·c - .5||c||²)
            vv = np.einsum("ij,ij->i", V, V)
            inert_k = np.bincount(
                a, weights=vv - 2.0 * S[np.arange(V.shape[0]), a], minlength=k
            )
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(cnt),
                    "s": pa.array(list(sums)),
                    "inert": pa.array(inert_k),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.float64)
        sizes = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for r in rows:
            c = int(r["cluster"])
            sizes[c] += int(r["n"])
            sums[c] += np.asarray(r["s"], dtype=np.float64)
            inertia += float(r["inert"])
        nz = sizes > 0
        C = np.where(nz[:, None], sums / np.maximum(sizes, 1)[:, None], C)
    return C, sizes, inertia


# --- integer-exact Lloyd (SQL-replayable training) ---------------------------
# The float lloyd() above is the production path; lloyd_int is its
# gate-certifiable twin: vectors quantized to integers (floor(x*1e4 + .5),
# identical IEEE double ops in numpy and DuckDB), per-cluster sums in
# int64 (ORDER-FREE exact — the dtw_to_mean_pattern integer-sum trick,
# CLAUDE.md float contracts), centroids re-quantized each round by exact
# integer round-half-up division, assignment by exact integer squared
# distance with first-min tiebreak. The ENTIRE training loop therefore
# replays as a DuckDB recursive CTE (queries._kmeans_lloyd_int_sql) —
# data-dependent iterative ML verified bit-exactly, not just one
# assignment pass.

QUANT_SCALE = 10_000


def make_int_centroids(dim: int, k: int, seed: int = 17) -> np.ndarray:
    """Seeded integer init centroids in quantized units (SQL literals)."""
    C = np.random.default_rng(seed).normal(0.0, 0.2, size=(k, dim))
    return np.floor(C * QUANT_SCALE + 0.5).astype(np.int64)


def quantize_batch(V: np.ndarray) -> np.ndarray:
    """float (n, dim) -> int64 quantized units; double math identical to
    DuckDB ``floor(embedding[d] * 10000 + 0.5)``."""
    return np.floor(V.astype(np.float64) * QUANT_SCALE + 0.5).astype(np.int64)


def _fld(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Exact floor division via positive-mod subtraction — the formula the
    SQL twin uses verbatim (DuckDB ``//`` truncates toward zero, numpy
    floors; subtracting the positive mod first makes both exact)."""
    pmod = ((num % den) + den) % den
    return (num - pmod) // den


def lloyd_int(ds, k: int = 4, iters: int = 3, seed: int = 17,
              vec_col: str = "embedding"):
    """Integer-exact distributed Lloyd: per round ONE map_batches pass of
    k-row integer partials (count, per-dim sums), driver combine (tiny,
    order-free), broadcast of re-quantized integer centroids. Returns a
    long-form (cluster, d, c, n) table after ``iters`` rounds — d is
    1-based to match SQL list subscripts. Same zero-shuffle scale shape
    as :func:`lloyd`."""
    import pandas as pd

    first = ds.take(1)
    if not first:
        return pd.DataFrame(
            {"cluster": pd.Series([], dtype=np.int64),
             "d": pd.Series([], dtype=np.int64),
             "c": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64)}
        )
    dim = len(first[0][vec_col])
    C = make_int_centroids(dim, k, seed)
    sizes = np.zeros(k, dtype=np.int64)

    for _ in range(iters):
        c_ref = ray.put(np.ascontiguousarray(C))

        def partial(t: pa.Table, _c_ref=c_ref) -> pa.Table:
            Cc = ray.get(_c_ref)
            X = quantize_batch(list_matrix(t[vec_col]))
            diff = X[:, None, :] - Cc[None, :, :]
            dd = np.einsum("nkd,nkd->nk", diff, diff)
            a = np.argmin(dd, axis=1)  # first-min == SQL min-cluster tiebreak
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, X.shape[1]), dtype=np.int64)
            for j in range(k):
                m = a == j
                if m.any():
                    sums[j] = X[m].sum(axis=0)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(cnt),
                    "s": pa.array(list(sums)),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.int64)
        sizes = np.zeros(k, dtype=np.int64)
        for r in rows:
            c = int(r["cluster"])
            sizes[c] += int(r["n"])
            sums[c] += np.asarray(r["s"], dtype=np.int64)
        nz = sizes > 0
        upd = _fld(2 * sums + sizes[:, None], 2 * np.maximum(sizes, 1)[:, None])
        C = np.where(nz[:, None], upd, C)

    return pd.DataFrame(
        {
            "cluster": np.repeat(np.arange(k, dtype=np.int64), dim),
            "d": np.tile(np.arange(1, dim + 1, dtype=np.int64), k),
            "c": C.reshape(-1),
            "n": np.repeat(sizes, dim),
        }
    )


def silhouette_int(ds, k: int = 4, iters: int = 3, seed: int = 17,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """Simplified (centroid-based) silhouette diagnostic over the
    integer-exact Lloyd result (the sits cluster-validation role of
    ``sits_som_evaluate_cluster``, on the partitional path): per vector,
    a2/b2 = exact integer squared distance to the own / nearest-other
    FINAL centroid, sil = (sqrt(b2)-sqrt(a2))/max(sqrt(a2),sqrt(b2)).
    sqrt and the division are correctly-rounded IEEE ops on exact
    integers, so the whole output is bit-exact vs the SQL twin
    (queries._silhouette_sql). One broadcast + one streaming map pass
    after training — zero shuffles."""
    import pandas as pd

    if k < 2:
        # b2 (nearest-OTHER centroid) is undefined at k=1: the masked
        # argmin would leak its int64-max sentinel and the SQL twin's
        # cluster != own join returns zero rows — refuse loudly instead
        raise ValueError("silhouette requires k >= 2")
    cent = lloyd_int(ds, k=k, iters=iters, seed=seed, vec_col=vec_col)
    if cent.empty:
        return ray.data.from_pandas(
            pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "cluster": pd.Series([], dtype=np.int64),
                 "a2": pd.Series([], dtype=np.int64),
                 "b2": pd.Series([], dtype=np.int64),
                 "sil": pd.Series([], dtype=np.float64)}
            )
        )
    dim = int(cent["d"].max())
    C = (
        cent.sort_values(["cluster", "d"])["c"]
        .to_numpy(dtype=np.int64)
        .reshape(k, dim)
    )
    c_ref = ray.put(np.ascontiguousarray(C))

    def sil(t: pa.Table) -> pa.Table:
        Cc = ray.get(c_ref)
        X = quantize_batch(list_matrix(t[vec_col]))
        diff = X[:, None, :] - Cc[None, :, :]
        dd = np.einsum("nkd,nkd->nk", diff, diff)
        a_idx = np.argmin(dd, axis=1)  # first-min == SQL tiebreak
        rows = np.arange(dd.shape[0])
        a2 = dd[rows, a_idx]
        masked = dd.copy()
        masked[rows, a_idx] = np.iinfo(np.int64).max
        b2 = masked.min(axis=1)
        sa, sb = np.sqrt(a2.astype(np.float64)), np.sqrt(b2.astype(np.float64))
        mx = np.maximum(sa, sb)
        s = np.where(mx == 0, 0.0, (sb - sa) / np.where(mx == 0, 1.0, mx))
        return pa.table(
            {id_col: t[id_col],
             "cluster": pa.array(a_idx.astype(np.int64)),
             "a2": pa.array(a2),
             "b2": pa.array(b2),
             "sil": pa.array(s)}
        )

    return ds.map_batches(sil, batch_format="pyarrow")
