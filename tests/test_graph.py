"""Integer-exact PageRank (stages/graph.py): scalar twin parity, tier
equivalence (driver loop vs distributed join+aggregate rounds), and the
symmetric-ring fixed point."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.stages.graph import pagerank_int, pagerank_int_local


def _brute(pairs, rounds=5, scale=1_000_000):
    nodes = sorted({x for p in pairs for x in p})
    deg = {n: 0 for n in nodes}
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    r = {n: scale for n in nodes}
    for _ in range(rounds):
        acc = {n: 0 for n in nodes}
        for a, b in pairs:
            acc[b] += r[a] // deg[a]
            acc[a] += r[b] // deg[b]
        r = {n: 150_000 + (85 * acc[n]) // 100 for n in nodes}
    return r


PAIRS = [(1, 2), (2, 3), (3, 4), (1, 3), (7, 8), (8, 9), (7, 9), (2, 9)]


def test_pagerank_local_matches_scalar_twin():
    a = np.array([p[0] for p in PAIRS], dtype=np.int64)
    b = np.array([p[1] for p in PAIRS], dtype=np.int64)
    nodes, r = pagerank_int_local(
        np.concatenate([a, b]), np.concatenate([b, a])
    )
    exp = _brute(PAIRS)
    assert {int(n): int(v) for n, v in zip(nodes, r)} == exp


@pytest.mark.parametrize("local_edges", [8_000_000, 0])
def test_pagerank_tiers_agree(ray_session, local_edges):
    pdf = pd.DataFrame(
        {
            "doc_a": np.array([p[0] for p in PAIRS], dtype=np.int64),
            "doc_b": np.array([p[1] for p in PAIRS], dtype=np.int64),
        }
    )
    got = (
        pagerank_int(
            rd.from_pandas(pdf).repartition(3), local_edges=local_edges
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute(PAIRS)
    assert {int(n): int(v) for n, v in
            zip(got.doc_id, got.rank_int)} == exp


def test_pagerank_symmetric_ring_fixed_point(ray_session):
    # ring: every node deg 2, in-sum = 2*(1e6//2) = 1e6 each round ->
    # rank stays exactly at the 1e6 fixed point for every node
    n = 12
    pdf = pd.DataFrame(
        {
            "doc_a": np.arange(n, dtype=np.int64),
            "doc_b": (np.arange(n, dtype=np.int64) + 1) % n,
        }
    )
    got = pagerank_int(rd.from_pandas(pdf)).to_pandas()
    assert len(got) == n and (got.rank_int == 1_000_000).all()


def test_pagerank_star_center_dominates(ray_session):
    # star: center 0 linked to 1..8 -> center accumulates 8 leaf
    # contributions, leaves split the center's rank 8 ways
    pdf = pd.DataFrame(
        {
            "doc_a": np.zeros(8, dtype=np.int64),
            "doc_b": np.arange(1, 9, dtype=np.int64),
        }
    )
    got = pagerank_int(rd.from_pandas(pdf)).to_pandas().set_index("doc_id")
    assert got.loc[0, "rank_int"] > 2 * got.loc[1, "rank_int"]
    leaves = got.drop(index=0)["rank_int"]
    assert leaves.nunique() == 1  # symmetric leaves identical


def test_pagerank_empty(ray_session):
    pdf = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
        }
    )
    got = pagerank_int(rd.from_pandas(pdf)).to_pandas()
    assert len(got) == 0  # Ray drops column schema on fully-empty
    # datasets; callers only contract on the zero row count here


# --- triangle counts / clustering coefficient --------------------------------
def _brute_tri(pairs):
    import itertools

    nodes = sorted({x for p in pairs for x in p})
    es = {tuple(sorted(p)) for p in pairs}
    adj = {n: set() for n in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for n in nodes:
        d = len(adj[n])
        t = sum(
            1
            for u, v in itertools.combinations(sorted(adj[n]), 2)
            if (u, v) in es
        )
        c = (2 * t) / (d * (d - 1)) if d >= 2 else 0.0
        out[n] = (d, t, c)
    return out


TRI_PAIRS = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (1, 4),
             (7, 8), (7, 9), (7, 10)]  # one dense blob + one star


@pytest.mark.parametrize("local_edges", [8_000_000, 0])
def test_triangle_stats_tiers_match_bruteforce(ray_session, local_edges):
    from sits_ray.stages.graph import triangle_stats

    pdf = pd.DataFrame(
        {
            "doc_a": np.array([p[0] for p in TRI_PAIRS], dtype=np.int64),
            "doc_b": np.array([p[1] for p in TRI_PAIRS], dtype=np.int64),
        }
    )
    got = (
        triangle_stats(
            rd.from_pandas(pdf).repartition(3), local_edges=local_edges
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_tri(TRI_PAIRS)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        d, t, c = exp[int(r.doc_id)]
        assert (int(r.deg), int(r.n_tri)) == (d, t), int(r.doc_id)
        assert r.clustering == c
    # star center (7): deg 3, no triangles -> coefficient 0
    star = got.set_index("doc_id").loc[7]
    assert star.deg == 3 and star.n_tri == 0 and star.clustering == 0.0


def test_triangle_stats_clique_is_1(ray_session):
    import itertools

    from sits_ray.stages.graph import triangle_stats

    nodes = [1, 2, 3, 4, 5]
    pairs = list(itertools.combinations(nodes, 2))
    pdf = pd.DataFrame(
        {
            "doc_a": np.array([p[0] for p in pairs], dtype=np.int64),
            "doc_b": np.array([p[1] for p in pairs], dtype=np.int64),
        }
    )
    got = triangle_stats(rd.from_pandas(pdf)).to_pandas()
    assert (got.clustering == 1.0).all()
    assert (got.n_tri == 6).all()  # C(4,2) triangles through each node


# --- k-core peeling -----------------------------------------------------------
def _brute_kcore(pairs, k=2, rounds=8):
    """Reference R-round peeling: round t keeps edges whose endpoints both
    had degree >= k over round t-1's edges; peel_round = first round with
    no surviving edge (0 = survived), core_deg = final-round degree."""
    edges = {tuple(sorted(p)) for p in pairs}
    nodes = sorted({x for p in pairs for x in p})
    seen = set(nodes)
    peel = {}
    cur = set(edges)
    for t in range(1, rounds + 1):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        new = {(a, b) for a, b in cur if deg[a] >= k and deg[b] >= k}
        if new == cur:
            break
        appears = {x for e in new for x in e}
        for u in seen - appears:
            peel[u] = t
        seen = appears
        cur = new
    deg = {}
    for a, b in cur:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {
        u: (peel.get(u, 0), deg.get(u, 0) if u in seen else 0)
        for u in nodes
    }


KCORE_PAIRS = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (7, 8), (7, 9),
               (7, 10), (20, 21), (21, 22), (22, 20), (22, 23), (23, 20)]


@pytest.mark.parametrize("local_edges", [8_000_000, 0])
@pytest.mark.parametrize("k", [2, 3])
def test_kcore_tiers_match_bruteforce(ray_session, local_edges, k):
    from sits_ray.stages.graph import kcore_int

    pdf = pd.DataFrame(
        {
            "doc_a": np.array([p[0] for p in KCORE_PAIRS], dtype=np.int64),
            "doc_b": np.array([p[1] for p in KCORE_PAIRS], dtype=np.int64),
        }
    )
    got = (
        kcore_int(rd.from_pandas(pdf).repartition(3), k=k,
                  local_edges=local_edges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_kcore(KCORE_PAIRS, k=k)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (int(r.peel_round), int(r.core_deg)) == exp[int(r.doc_id)], (
            k, int(r.doc_id))


def test_kcore_star_center_vanishes_round1(ray_session):
    # star center has deg 3 >= 2 but ALL its edges die with its deg-1
    # leaves -> it disappears at round 1 (the "appears" semantics the
    # SQL twin implements)
    from sits_ray.stages.graph import kcore_int

    pairs = [(7, 8), (7, 9), (7, 10)]
    pdf = pd.DataFrame(
        {
            "doc_a": np.array([p[0] for p in pairs], dtype=np.int64),
            "doc_b": np.array([p[1] for p in pairs], dtype=np.int64),
        }
    )
    got = kcore_int(rd.from_pandas(pdf), k=2).to_pandas()
    assert (got.peel_round == 1).all()
    assert (got.core_deg == 0).all()


def test_kcore_clique_all_survive(ray_session):
    import itertools

    from sits_ray.stages.graph import kcore_int

    pairs = list(itertools.combinations([1, 2, 3, 4, 5], 2))
    pdf = pd.DataFrame(
        {
            "doc_a": np.array([p[0] for p in pairs], dtype=np.int64),
            "doc_b": np.array([p[1] for p in pairs], dtype=np.int64),
        }
    )
    got = kcore_int(rd.from_pandas(pdf), k=3).to_pandas()
    assert (got.peel_round == 0).all()
    assert (got.core_deg == 4).all()


def test_kcore_empty(ray_session):
    from sits_ray.stages.graph import kcore_int

    pdf = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
        }
    )
    assert kcore_int(rd.from_pandas(pdf)).to_pandas().empty
