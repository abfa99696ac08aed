"""Agglomerative (dendrogram) clustering — the reference's
``sits_cluster_dendro`` (``R/sits_cluster.R:59-177``, which drives
dtwclust hierarchical clustering over a samples tibble): pairwise
distances over a SAMPLE, average-linkage merges via Lance-Williams
updates, cut at k clusters.

The reference clusters sample time series (small side) to audit label
quality; classification of the full data stays distributed. Pure numpy,
deterministic; validated in tests/test_sampling_cluster.py on separable
blobs and against a brute-force linkage twin.
"""

from __future__ import annotations

import numpy as np


def pairwise_euclidean(X: np.ndarray) -> np.ndarray:
    """Pairwise Euclidean distances with a SEQUENTIAL accumulation over
    the feature dimension (``acc += (x_d - y_d)^2`` one dim at a time,
    vectorized across the n x n plane) instead of the BLAS dot-product
    trick: BLAS uses blocked summation whose order SQL cannot replay,
    while this order is exactly DuckDB's ``list_reduce`` left fold — the
    bit-parity contract the ``cluster_dendro_embeddings`` oracle relies
    on. Cost is O(n^2 d) either way; the sample side here is small by
    design (the reference clusters a samples tibble)."""
    X = np.asarray(X, dtype=np.float64)
    n, dim = X.shape
    acc = np.zeros((n, n), dtype=np.float64)
    for d in range(dim):
        diff = X[:, d, None] - X[None, :, d]
        acc += diff * diff
    return np.sqrt(acc)


def linkage_average(D: np.ndarray) -> np.ndarray:
    """Average-linkage agglomerative clustering of a condensed-free full
    distance matrix. Returns an (n-1, 4) merge table
    [cluster_a, cluster_b, height, size] with scipy-style new-cluster ids
    (n + step)."""
    D = np.asarray(D, dtype=np.float64).copy()
    n = D.shape[0]
    active = np.ones(n, dtype=bool)
    sizes = np.ones(n, dtype=np.int64)
    ids = np.arange(n, dtype=np.int64)  # current cluster id per slot
    np.fill_diagonal(D, np.inf)
    merges = np.empty((n - 1, 4))
    for step in range(n - 1):
        sub = np.where(active[:, None] & active[None, :], D, np.inf)
        i, j = np.unravel_index(np.argmin(sub), sub.shape)
        if i > j:
            i, j = j, i
        h = D[i, j]
        a, b = ids[i], ids[j]
        if a > b:
            a, b = b, a
        new_size = sizes[i] + sizes[j]
        merges[step] = (a, b, h, new_size)
        # Lance-Williams average linkage: d(new, k) weighted by sizes
        wi = sizes[i] / new_size
        wj = sizes[j] / new_size
        D[i, :] = wi * D[i, :] + wj * D[j, :]
        D[:, i] = D[i, :]
        D[i, i] = np.inf
        active[j] = False
        sizes[i] = new_size
        ids[i] = n + step
    return merges


def cut_tree(merges: np.ndarray, n: int, k: int) -> np.ndarray:
    """Cluster label (0..k-1) per original sample after stopping the merge
    sequence at k clusters; labels are renumbered by first appearance."""
    parent = np.arange(n + merges.shape[0], dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    stop = n - k  # apply the first n-k merges
    for step in range(stop):
        a, b, _, _ = merges[step]
        new = n + step
        parent[find(int(a))] = new
        parent[find(int(b))] = new
    roots = np.array([find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    # renumber by first appearance for determinism
    first = {}
    out = np.empty(n, dtype=np.int64)
    nxt = 0
    for i, lab in enumerate(labels):
        if lab not in first:
            first[lab] = nxt
            nxt += 1
        out[i] = first[lab]
    return out


def cluster_dendro(X: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Full pipeline: distances -> average linkage -> cut at k.
    Returns (labels (n,), merges (n-1, 4))."""
    D = pairwise_euclidean(X)
    merges = linkage_average(D)
    return cut_tree(merges, X.shape[0], k), merges


def cluster_frequency(labels, clusters) -> "pd.DataFrame":
    """(label x cluster) frequency table (``sits_cluster_frequency``,
    ``R/sits_cluster.R:120-150``)."""
    import pandas as pd

    return pd.crosstab(pd.Series(labels, name="label"),
                       pd.Series(clusters, name="cluster"))


def cluster_clean(df, label_col: str = "label", cluster_col: str = "cluster"):
    """``sits_cluster_clean`` (``R/sits_cluster.R:177-201``): keep only the
    rows whose label is their cluster's majority label (ties -> first
    label in sorted order, R's table()-order which.max). Runs on the
    samples table (small side, the reference shape)."""
    import pandas as pd

    freq = cluster_frequency(df[label_col], df[cluster_col])
    major = {cl: freq[cl].idxmax() for cl in freq.columns}
    keep = df[cluster_col].map(major) == df[label_col]
    return df[keep].reset_index(drop=True)
