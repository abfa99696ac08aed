"""Iterative graph analytics over candidate-pair graphs: integer-exact
PageRank. Complements ``stages/dedup.connected_components`` (the other
fixed-point graph op in the repo): components pick cluster
representatives; PageRank ranks nodes by link authority inside the
near-dup graph (the curation signal for "which duplicate is canonical").

Float-free by construction (the ``kmeans_lloyd_int`` discipline): ranks
live on an integer scale (1e6 per node), per-round contributions are
floor divisions of positive ints (numpy ``//`` == DuckDB ``//`` on
positives), in-sums are order-free int64, and the damping step is
``base + (85 * in) // 100`` — so a recursive CTE replays the ENTIRE
iteration bit-for-bit. This is the scale-invariant (unnormalized)
PageRank variant: every node starts at ``scale`` and isolated nodes
never enter (the graph is the pair list).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank_int_local(src: np.ndarray, dst: np.ndarray, rounds: int = 5,
                       scale: int = 1_000_000, alpha_num: int = 85,
                       alpha_den: int = 100):
    """Driver-tier fixed-point loop over a SYMMETRIZED edge index pair
    (src/dst already include both directions). Returns (nodes, rank)."""
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)
    deg = np.bincount(si, minlength=n).astype(np.int64)
    base = (scale * (alpha_den - alpha_num)) // alpha_den
    r = np.full(n, scale, dtype=np.int64)
    for _ in range(rounds):
        contrib = r[si] // deg[si]
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, di, contrib)
        r = base + (alpha_num * acc) // alpha_den
    return nodes, r


def pagerank_int(pairs_ds, a_col: str = "doc_a", b_col: str = "doc_b",
                 rounds: int = 5, scale: int = 1_000_000,
                 alpha_num: int = 85, alpha_den: int = 100,
                 local_edges: int = 8_000_000,
                 num_partitions: int | None = None):
    """Integer-exact PageRank over an undirected candidate-pair graph.

    Returns a Dataset ``(doc_id, rank_int)`` for every node appearing in
    at least one pair. Tier choice by MEASURED edge count (both tiers
    reach identical integers — the arithmetic is deterministic and the
    in-sums order-free):

    - <= ``local_edges`` pairs: the edge list is a bounded intermediate
      (LSH bucket caps bound candidate pairs); gather once, run the loop
      in numpy — iterations cost microseconds instead of one Ray
      pipeline execution each (the connected_components rationale).
    - above: no driver graph state — per round, one adaptive hash join
      (edges x rank on the source endpoint, ``stages/joins.py``) plus
      one ``hashagg.part_aggregate`` sum keyed by destination. Degree
      attaches to the edge table ONCE before the loop.

    Overflow bound: per-node in-sum <= max_degree * scale; with
    bucket-capped candidate graphs (deg <~ 2^20) the damping product
    stays < 2^47."""
    import ray.data as rd

    from sits_ray.stages.hashagg import part_aggregate
    from sits_ray.stages.joins import adaptive_join_unique

    base = (scale * (alpha_den - alpha_num)) // alpha_den

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "rank_int": pd.Series([], dtype="int64"),
        }
    )
    if n_pairs == 0:
        return rd.from_pandas(empty)

    if n_pairs <= local_edges:
        pdf = pairs_ds.select_columns([a_col, b_col]).to_pandas()
        a = pdf[a_col].to_numpy(dtype=np.int64)
        b = pdf[b_col].to_numpy(dtype=np.int64)
        nodes, r = pagerank_int_local(
            np.concatenate([a, b]), np.concatenate([b, a]),
            rounds=rounds, scale=scale,
            alpha_num=alpha_num, alpha_den=alpha_den,
        )
        return rd.from_pandas(
            pd.DataFrame({"doc_id": nodes, "rank_int": r})
        )

    # distributed tier -----------------------------------------------------
    def symmetrize(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        b = np.asarray(t[b_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs_ds.map_batches(symmetrize, batch_format="pyarrow")

    def deg_agg(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "d": pd.Series([], dtype="int64"),
                }
            )
        out = gdf.groupby("src", sort=False).size().reset_index(name="d")
        return out.rename(columns={"src": "node"})

    deg = part_aggregate(edges, deg_agg, key_col="src",
                         n_parts=num_partitions or 32)
    edges_d = adaptive_join_unique(
        edges, deg, on="src", right_on="node", value_cols={"d": "d"},
        num_partitions=num_partitions,
    ).materialize()

    rank = deg.map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df["node"].to_numpy(dtype=np.int64),
                "r": np.full(len(df), scale, dtype=np.int64),
            }
        ),
        batch_format="pandas",
    ).materialize()

    for _ in range(rounds):
        joined = adaptive_join_unique(
            edges_d, rank, on="src", right_on="node",
            value_cols={"r": "r"}, num_partitions=num_partitions,
        )

        def in_sums(gdf: pd.DataFrame) -> pd.DataFrame:
            if not len(gdf):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype="int64"),
                        "r": pd.Series([], dtype="int64"),
                    }
                )
            contrib = (
                gdf["r"].to_numpy(dtype=np.int64)
                // gdf["d"].to_numpy(dtype=np.int64)
            )
            acc = (
                pd.DataFrame(
                    {"node": gdf["dst"].to_numpy(dtype=np.int64),
                     "c": contrib}
                )
                .groupby("node", sort=False)["c"]
                .sum()
                .reset_index()
            )
            return pd.DataFrame(
                {
                    "node": acc["node"].to_numpy(dtype=np.int64),
                    "r": base
                    + (alpha_num * acc["c"].to_numpy(dtype=np.int64))
                    // alpha_den,
                }
            )

        rank = part_aggregate(
            joined, in_sums, key_col="dst",
            n_parts=num_partitions or 32,
        ).materialize()

    return rank.map_batches(
        lambda df: df.rename(columns={"node": "doc_id", "r": "rank_int"}),
        batch_format="pandas",
    )


def kcore_local(a: np.ndarray, b: np.ndarray, k: int = 2, rounds: int = 8):
    """Driver-tier R-round k-peeling over canonical pairs. Returns
    (nodes, peel_round, core_deg): round t keeps an edge iff BOTH
    endpoints had degree >= k over round t-1's edge set; a node's
    peel_round is the first round it has no surviving edge (0 =
    survived all ``rounds``), core_deg its degree in the final edge
    set (0 for peeled nodes). Early-stops when the edge set is stable
    (all later rounds are identity — output unchanged)."""
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    n = len(nodes)
    cur = np.ones(len(a), dtype=bool)
    peel = np.zeros(n, dtype=np.int64)
    seen = np.ones(n, dtype=bool)  # appears in round-(t-1) edge set
    for t in range(1, rounds + 1):
        deg = (
            np.bincount(ai[cur], minlength=n)
            + np.bincount(bi[cur], minlength=n)
        )
        new = cur & (deg[ai] >= k) & (deg[bi] >= k)
        if (new == cur).all():
            break
        appears = np.zeros(n, dtype=bool)
        appears[ai[new]] = True
        appears[bi[new]] = True
        peel[seen & ~appears] = t
        seen = appears
        cur = new
    core_deg = (
        np.bincount(ai[cur], minlength=n)
        + np.bincount(bi[cur], minlength=n)
    ).astype(np.int64)
    core_deg[~seen] = 0
    return nodes, peel, core_deg


def kcore_int(pairs_ds, a_col: str = "doc_a", b_col: str = "doc_b",
              k: int = 2, rounds: int = 8,
              local_edges: int = 8_000_000,
              num_partitions: int | None = None):
    """R-round k-core peeling over an undirected candidate-pair graph —
    the dense-cluster extractor of the graph family (components find
    WHICH docs are connected, PageRank ranks authority, triangles
    measure local density; the k-core isolates the subgraph where every
    member has >= k near-dup partners, i.e. true template blobs vs
    hub-and-spokes accidents).

    Output ``(doc_id, peel_round, core_deg)`` for every paired node:
    ``peel_round`` = first round with no surviving edge (0 = in the
    core after ``rounds`` rounds), ``core_deg`` = final-round degree
    (0 for peeled). All-integer, so the recursive-CTE twin (window-fn
    degrees inside the recursive term) replays it bit-for-bit.

    Tiers like :func:`pagerank_int`. Distributed tier: per round ONE
    ``part_aggregate`` computes per-node degrees over edges filtered to
    the current alive-set (broadcast once per round; the node table is
    bounded by 2x the capped candidate pairs); re-filtering from the
    ORIGINAL edges with the latest alive-set equals the cumulative
    SQL filter because degrees shrink monotonically (once deg(u) < k
    it stays < k), so alive-sets are nested."""
    import ray
    import ray.data as rd

    from sits_ray.stages.hashagg import part_aggregate

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "peel_round": pd.Series([], dtype="int64"),
            "core_deg": pd.Series([], dtype="int64"),
        }
    )
    if n_pairs == 0:
        return rd.from_pandas(empty)

    if n_pairs <= local_edges:
        pdf = pairs_ds.select_columns([a_col, b_col]).to_pandas()
        nodes, peel, core_deg = kcore_local(
            pdf[a_col].to_numpy(dtype=np.int64),
            pdf[b_col].to_numpy(dtype=np.int64),
            k=k, rounds=rounds,
        )
        return rd.from_pandas(
            pd.DataFrame(
                {"doc_id": nodes, "peel_round": peel, "core_deg": core_deg}
            )
        )

    # distributed tier: edges stay distributed; node-level state (alive
    # set, peel rounds) is bounded by the capped pair table and lives on
    # the driver, broadcast per round
    def sym(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        b = np.asarray(t[b_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()

    def deg_round(alive_ref):
        def fn(gdf: pd.DataFrame) -> pd.DataFrame:
            if not len(gdf):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype="int64"),
                        "d": pd.Series([], dtype="int64"),
                    }
                )
            alive = ray.get(alive_ref)  # sorted int64 node ids
            s = gdf["src"].to_numpy(dtype=np.int64)
            dst = gdf["dst"].to_numpy(dtype=np.int64)
            ok = np.isin(s, alive) & np.isin(dst, alive)
            out = (
                pd.DataFrame({"node": s[ok]})
                .groupby("node", sort=False)
                .size()
                .reset_index(name="d")
            )
            return out.astype({"node": "int64", "d": "int64"})

        return fn

    def deg_all(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "d": pd.Series([], dtype="int64"),
                }
            )
        out = (
            gdf.groupby("src", sort=False)
            .size()
            .reset_index(name="d")
            .rename(columns={"src": "node"})
        )
        return out.astype({"node": "int64", "d": "int64"})

    # iteration t computes degrees over E_t (E_0 = all edges;
    # E_t = original edges filtered to K_{t-1} = {deg >= k at E_{t-1}},
    # valid by the nested-alive-set argument in the docstring)
    all_nodes = None
    peel_map: dict[int, int] = {}
    seen = None            # incident node set of the edge set just scored
    alive = None           # K_{t-1}; None = unfiltered round 0
    node = d = None
    for t in range(0, rounds + 1):
        if alive is None:
            fn = deg_all
        else:
            fn = deg_round(ray.put(alive))
        degs = part_aggregate(
            edges, fn, key_col="src", n_parts=num_partitions or 32
        ).to_pandas()
        if len(degs):
            node = degs["node"].to_numpy(dtype=np.int64)
            d = degs["d"].to_numpy(dtype=np.int64)
        else:  # Ray drops column schema on fully-empty datasets
            node = np.array([], dtype=np.int64)
            d = np.array([], dtype=np.int64)
        appears = np.sort(node)
        if all_nodes is None:
            all_nodes = appears
            seen = appears
        else:
            for u in np.setdiff1d(seen, appears, assume_unique=True):
                peel_map[int(u)] = t  # last_seen = t-1 -> peel t
            seen = appears
        new_alive = np.sort(node[d >= k])
        if alive is not None and np.array_equal(new_alive, alive):
            break  # E_{t+1} = E_t: all later rounds are identity
        alive = new_alive
    # survivors = every node incident to the final edge set (SQL
    # semantics: last_seen = R -> peel_round 0, core_deg = final degree
    # even when that degree has dropped below k at the cut-off round)
    final_deg = dict(zip(node.tolist(), d.tolist()))
    out_rows = []
    seen_set = set(seen.tolist())
    for u in all_nodes.tolist():
        if u in seen_set:
            out_rows.append((u, 0, final_deg[u]))
        else:
            out_rows.append((u, peel_map[u], 0))
    res = pd.DataFrame(
        out_rows, columns=["doc_id", "peel_round", "core_deg"]
    ).astype("int64")
    return rd.from_pandas(res)


def triangles_local(a: np.ndarray, b: np.ndarray):
    """Driver-tier per-node triangle counts over canonical pairs
    (a < b). Returns (nodes, deg, n_tri). Sorted-adjacency intersection
    per edge — O(sum over edges of min-degree), the standard compact
    exact counter for bounded edge lists."""
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    n = len(nodes)
    deg = np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
    # full adjacency (both directions), grouped by source
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    starts = np.searchsorted(src, np.arange(n))
    ends = np.searchsorted(src, np.arange(n) + 1)
    tri = np.zeros(n, dtype=np.int64)
    for x, y in zip(ai, bi):
        nx = dst[starts[x]:ends[x]]
        ny = dst[starts[y]:ends[y]]
        common = np.intersect1d(nx, ny, assume_unique=True)
        if len(common):
            tri[x] += len(common)
            tri[y] += len(common)
            np.add.at(tri, common, 1)
    # every triangle was counted once per its three edges at each node:
    # node in a triangle is touched by exactly 2 of the 3 edges as an
    # endpoint and once as a common neighbor -> counted 3x; normalize
    assert (tri % 3 == 0).all()
    return nodes, deg.astype(np.int64), tri // 3


def triangle_stats(pairs_ds, a_col: str = "doc_a", b_col: str = "doc_b",
                   local_edges: int = 8_000_000,
                   num_partitions: int | None = None):
    """Per-node triangle count + local clustering coefficient over an
    undirected candidate-pair graph — the density diagnostic of
    duplicate clusters (a clique of template copies has coefficient 1,
    a hub-and-spokes near-dup star has 0).

    Output ``(doc_id, deg, n_tri, clustering)`` for every paired node;
    ``clustering = 2*n_tri / (deg*(deg-1))`` is ONE int/int division
    (0.0 when deg < 2) so the SQL 3-way-self-join twin is bit-exact.

    Tiers like :func:`pagerank_int`: bounded pair lists (LSH caps) run
    the sorted-adjacency intersection counter on the driver; past the
    threshold, wedges are generated distributedly per middle node (one
    ``part_aggregate`` keyed by the wedge center) and probed against the
    broadcast canonical-edge hash set (bounded: the edge list itself is
    the candidate-pair table)."""
    import ray
    import ray.data as rd

    from sits_ray.stages.hashagg import part_aggregate

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "deg": pd.Series([], dtype="int64"),
                    "n_tri": pd.Series([], dtype="int64"),
                    "clustering": pd.Series([], dtype="float64"),
                }
            )
        )

    def finish(nodes, deg, tri):
        denom = deg * (deg - 1)
        clus = np.where(denom > 0, (2 * tri) / np.where(denom > 0, denom, 1),
                        0.0)
        return pd.DataFrame(
            {
                "doc_id": nodes,
                "deg": deg,
                "n_tri": tri,
                "clustering": clus,
            }
        )

    if n_pairs <= local_edges:
        pdf = pairs_ds.select_columns([a_col, b_col]).to_pandas()
        a = pdf[a_col].to_numpy(dtype=np.int64)
        b = pdf[b_col].to_numpy(dtype=np.int64)
        nodes, deg, tri = triangles_local(a, b)
        return rd.from_pandas(finish(nodes, deg, tri))

    # distributed tier: canonical edge set broadcast once (the pair table
    # is the bounded blocking output); wedges per middle node, probed
    # against it, then per-node sums through one hash exchange. Edges
    # pack into sorted int64 keys (ids < 2^31) so the probe is a
    # vectorized searchsorted, not per-pair Python
    _M = np.int64(1) << np.int64(32)
    pdf = pairs_ds.select_columns([a_col, b_col]).to_pandas()
    _ea = pdf[a_col].to_numpy(dtype=np.int64)
    _eb = pdf[b_col].to_numpy(dtype=np.int64)
    if (_ea >= _M).any() or (_eb >= _M).any():
        raise ValueError("triangle_stats: node ids must fit in 32 bits "
                         "for the packed-edge probe")
    canon_ref = ray.put(np.sort(_ea * _M + _eb))

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy(dtype=np.int64)
        b = df[b_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    edges = pairs_ds.map_batches(sym, batch_format="pandas")

    def wedge_probe(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "deg": pd.Series([], dtype="int64"),
                    "n_tri": pd.Series([], dtype="int64"),
                }
            )
        ekeys = ray.get(canon_ref)
        rows = []
        for mid, grp in gdf.groupby("src", sort=False):
            nbr = np.sort(grp["dst"].to_numpy(dtype=np.int64))
            if len(nbr) >= 2:
                iu, ju = np.triu_indices(len(nbr), 1)
                w = nbr[iu] * _M + nbr[ju]
                pos = np.searchsorted(ekeys, w)
                pos[pos >= len(ekeys)] = len(ekeys) - 1
                t = int((ekeys[pos] == w).sum())
            else:
                t = 0
            rows.append((int(mid), len(nbr), t))
        return pd.DataFrame(rows, columns=["doc_id", "deg", "n_tri"])

    per_node = part_aggregate(edges, wedge_probe, key_col="src",
                              n_parts=num_partitions or 32)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "deg": pd.Series([], dtype="int64"),
                    "n_tri": pd.Series([], dtype="int64"),
                    "clustering": pd.Series([], dtype="float64"),
                }
            )
        return finish(
            df["doc_id"].to_numpy(dtype=np.int64),
            df["deg"].to_numpy(dtype=np.int64),
            df["n_tri"].to_numpy(dtype=np.int64),
        )

    return per_node.map_batches(fin, batch_format="pandas")


# --- Adamic-Adar link prediction ----------------------------------------------
def _aa_local(a: np.ndarray, b: np.ndarray, k: int):
    """Driver tier: iterate middle nodes in ASCENDING id order so each
    candidate pair's 1/ln(deg) contributions fold y-ascending — the
    exact float order the SQL twin's ordered list_reduce replays."""
    import math

    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    o = np.lexsort((dst, src))
    src, dst = src[o], dst[o]
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    ends = np.r_[starts[1:], src.size]
    deg = {int(src[s]): int(e - s) for s, e in zip(starts, ends)}
    lut = {d: 1.0 / math.log(float(d)) for d in set(deg.values()) if d > 1}
    edge = set(zip(a.tolist(), b.tolist()))
    acc: dict[tuple[int, int], tuple[int, float]] = {}
    for s, e in zip(starts, ends):          # middle nodes ascending
        d = int(e - s)
        if d < 2:
            continue
        w = lut[d]
        nbr = dst[s:e]                       # ascending (lexsort)
        for i in range(d - 1):
            x = int(nbr[i])
            for j in range(i + 1, d):
                z = int(nbr[j])
                if (x, z) in edge:
                    continue
                c, sc = acc.get((x, z), (0, 0.0))
                acc[(x, z)] = (c + 1, sc + w)   # y-ascending fold
    rows = [(x, z, c, sc) for (x, z), (c, sc) in acc.items()]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return pd.DataFrame(rows[:k],
                        columns=["doc_a", "doc_b", "n_common", "aa_score"])


def adamic_adar_topk(pairs_ds, a_col: str = "doc_a", b_col: str = "doc_b",
                     k: int = 20, local_edges: int = 8_000_000,
                     n_parts: int = 32):
    """Top-k Adamic-Adar link predictions (Adamic & Adar 2003) over an
    undirected candidate-pair graph: for distance-2 non-edge pairs
    (x, z), score = sum over common neighbors y of ``1/ln(deg(y))`` —
    "which near-dup docs are probably duplicates the blocking missed".

    Float contract: per-pair contributions fold in y-ASCENDING order
    (libm log == DuckDB ln); the top-k cut orders by
    (aa_score desc, doc_a asc, doc_b asc) — total, so deterministic.

    Tiers like the rest of the family: bounded pair lists run on the
    driver; past the threshold, wedges generate per middle node through
    one ``part_aggregate`` (deg and the non-edge probe resolved against
    the broadcast packed-edge array inside the kernel), pair scores fold
    in a second pair-keyed exchange (whole key groups co-located, so
    per-partition top-k partials merge to the exact global top-k)."""
    import math

    import ray
    import ray.data as rd

    from sits_ray.stages.hashagg import part_aggregate

    empty = pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "n_common": pd.Series([], dtype="int64"),
        "aa_score": pd.Series([], dtype="float64"),
    })
    # returns a (typed) pandas DataFrame: the result is top-k-bounded,
    # and Ray's from_pandas drops the schema of 0-row frames
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return empty
    pdf = pairs_ds.select_columns([a_col, b_col]).to_pandas()
    a = pdf[a_col].to_numpy(dtype=np.int64)
    b = pdf[b_col].to_numpy(dtype=np.int64)
    if len(a) <= local_edges:
        return _aa_local(a, b, k)

    # distributed tier (the pair table itself is bounded blocking
    # output — same broadcast justification as triangle_stats)
    _M = np.int64(1) << np.int64(32)
    if (a >= _M).any() or (b >= _M).any():
        raise ValueError("adamic_adar_topk: ids must fit in 32 bits")
    canon_ref = ray.put(np.sort(a * _M + b))
    sym = pd.DataFrame({"src": np.concatenate([a, b]),
                        "dst": np.concatenate([b, a])})
    edges = rd.from_pandas(sym)

    def wedges(gdf: pd.DataFrame) -> pd.DataFrame:
        ekeys = ray.get(canon_ref)
        out = []
        for mid, grp in gdf.groupby("src", sort=True):
            nbr = np.sort(grp["dst"].to_numpy(np.int64))
            d = len(nbr)
            if d < 2:
                continue
            w = 1.0 / math.log(float(d))
            iu, ju = np.triu_indices(d, 1)
            x, z = nbr[iu], nbr[ju]
            pk = x * _M + z
            pos = np.searchsorted(ekeys, pk)
            pos[pos >= len(ekeys)] = len(ekeys) - 1
            keep = ekeys[pos] != pk
            out.append(pd.DataFrame({
                "pk": pk[keep], "y": np.full(int(keep.sum()), int(mid),
                                             dtype=np.int64),
                "w": np.full(int(keep.sum()), w)}))
        if not out:
            return pd.DataFrame({"pk": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    wt = part_aggregate(edges, wedges, key_col="src", n_parts=n_parts)

    def fold_topk(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return empty
        g = gdf.sort_values(["pk", "y"], kind="mergesort")
        pk = g["pk"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.float64)
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        lens = np.diff(np.r_[starts, pk.size])
        sc = np.zeros(starts.size)
        for i in range(int(lens.max())):       # sequential y-asc fold
            mk = lens > i
            sc[mk] += w[starts[mk] + i]
        df = pd.DataFrame({
            "doc_a": pk[starts] // _M, "doc_b": pk[starts] % _M,
            "n_common": lens.astype(np.int64), "aa_score": sc})
        return (df.sort_values(["aa_score", "doc_a", "doc_b"],
                               ascending=[False, True, True]).head(k))

    parts = part_aggregate(wt, fold_topk, key_col="pk",
                           n_parts=n_parts).to_pandas()
    return (parts.sort_values(["aa_score", "doc_a", "doc_b"],
                              ascending=[False, True, True])
                 .head(k).reset_index(drop=True))
