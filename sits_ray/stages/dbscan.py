"""DBSCAN over the quantized embedding space (Ester et al., KDD 1996).

Completes the clustering family (kmeans: centroidal; SOM: topological;
dendro: hierarchical; DBSCAN: density-based with explicit noise). The
variant contract is pinned all-integer so both engines agree exactly:

* distances are squared Euclidean over the PQ family's
  ``floor(x*10000 + 0.5)`` int64 grid (monotone — neighborhoods are the
  classic ones);
* ``eps^2`` is NOT a magic constant but the LOWER MEDIAN of every
  point's minPts-th-NN squared distance (the deterministic stand-in for
  the k-dist elbow the original paper eyeballs) — density-adaptive, so
  the operator stays meaningful at any corpus density;
* core = at least ``minPts`` points (self included) within eps;
* clusters = connected components of the core-core eps-graph, labeled
  by their MINIMUM member vec_id (canonical, order-free);
* border points join the smallest-labeled cluster among their core
  neighbors (a deterministic stand-in for the paper's
  first-scan-order assignment, which is not order-free); the rest are
  noise (cluster -1).

Scale shape: two broadcast-Gram passes (the LOF/knn pattern — each
batch one exact int64 Gram block against the ray.put matrix), shipping
only (rows x minPts) kNN rows then the sparse eps-edge list; the
driver finishes union-find on the bounded edge table. At corpus scale
the broadcast side becomes the IVF-bucketed candidate set and the
components move to the distributed min-label propagation
(stages/dedup.connected_components) — same integer contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


def _quant(col) -> np.ndarray:
    return np.floor(
        np.stack(col.to_numpy()).astype(np.float64) * 10000.0 + 0.5
    ).astype(np.int64)


def dbscan_embeddings(ds, min_pts: int = 4) -> pd.DataFrame:
    """Returns (vec_id, role in {'core','border','noise'}, cluster) —
    cluster = min vec_id of the component, -1 for noise. See module
    docstring for the exact contract."""
    t = ds.to_pandas()
    q = _quant(t["embedding"])
    ids = t["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    q, ids = q[order], ids[order]
    nn = (q * q).sum(axis=1)
    ref = ray.put((q, ids, nn))
    k = min_pts - 1  # neighbors beyond self

    def kdist_batch(b: pd.DataFrame) -> pd.DataFrame:
        qq, aid, an = ray.get(ref)
        bq = _quant(b["embedding"])
        bids = b["vec_id"].to_numpy(np.int64)
        bn = (bq * bq).sum(axis=1)
        d2 = bn[:, None] + an[None, :] - 2 * (bq @ qq.T)
        rows = []
        for i in range(len(bids)):
            d = d2[i].copy()
            d[np.searchsorted(aid, bids[i])] = np.iinfo(np.int64).max
            sel = np.lexsort((aid, d))[:k]
            rows.append({"vid": bids[i], "kd": int(d[sel[-1]])})
        return pd.DataFrame(rows)

    from sits_ray.stages.joins import _right_as_table

    kt = _right_as_table(ds.map_batches(kdist_batch, batch_format="pandas"))
    kd = pd.DataFrame({"vid": kt["vid"].to_numpy(),
                       "kd": kt["kd"].to_numpy()}).sort_values(["kd", "vid"])
    n = len(kd)
    eps2 = int(kd["kd"].to_numpy()[(n + 1) // 2 - 1])  # lower median
    eps_ref = ray.put(eps2)

    def edge_batch(b: pd.DataFrame) -> pd.DataFrame:
        qq, aid, an = ray.get(ref)
        e2 = ray.get(eps_ref)
        bq = _quant(b["embedding"])
        bids = b["vec_id"].to_numpy(np.int64)
        bn = (bq * bq).sum(axis=1)
        d2 = bn[:, None] + an[None, :] - 2 * (bq @ qq.T)
        rows = []
        for i in range(len(bids)):
            hit = (d2[i] <= e2) & (aid != bids[i])
            rows.append(pd.DataFrame({"a": bids[i], "b": aid[hit]}))
        return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64),
             "b": pd.Series([], dtype=np.int64)})

    et = _right_as_table(ds.map_batches(edge_batch, batch_format="pandas"))
    edges = pd.DataFrame({"a": et["a"].to_numpy(), "b": et["b"].to_numpy()})
    deg = edges.groupby("a").size().reindex(ids, fill_value=0)
    core = set(ids[(deg.to_numpy() >= k)])

    # union-find over core-core edges; components canonical by min id
    parent: dict[int, int] = {int(c): int(c) for c in core}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cc = edges[edges["a"].isin(core) & edges["b"].isin(core)]
    for a, b in zip(cc["a"].to_numpy(), cc["b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label = {c: find(c) for c in parent}

    out = []
    nbrs = edges.groupby("a")["b"]
    for vid in ids:
        v = int(vid)
        if v in core:
            out.append({"vec_id": np.int64(v), "role": "core",
                        "cluster": np.int64(label[v])})
            continue
        try:
            cn = [label[int(b)] for b in nbrs.get_group(v) if int(b) in core]
        except KeyError:
            cn = []
        if cn:
            out.append({"vec_id": np.int64(v), "role": "border",
                        "cluster": np.int64(min(cn))})
        else:
            out.append({"vec_id": np.int64(v), "role": "noise",
                        "cluster": np.int64(-1)})
    return pd.DataFrame(out)
