"""Adamic-Adar link prediction (stages/graph.adamic_adar_topk +
stages/textrank.adamic_adar_words): hand scores on a path graph,
edge exclusion, tie ordering, distributed-tier parity."""

import math

import numpy as np
import pandas as pd


def _pairs(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows, columns=["doc_a", "doc_b"]))


def test_path_graph_hand_score(ray_session):
    from sits_ray.stages.graph import adamic_adar_topk

    # path 1-2-3: candidate (1,3) via y=2, deg(2)=2
    out = adamic_adar_topk(_pairs([(1, 2), (2, 3)]))
    assert out.doc_a.tolist() == [1]
    assert out.doc_b.tolist() == [3]
    assert out.n_common.tolist() == [1]
    assert float(out.aa_score.iloc[0]) == 1.0 / math.log(2.0)


def test_existing_edges_excluded(ray_session):
    from sits_ray.stages.graph import adamic_adar_topk

    # triangle 1-2, 2-3, 1-3: every distance-2 pair is already an edge
    out = adamic_adar_topk(_pairs([(1, 2), (2, 3), (1, 3)]))
    assert len(out) == 0
    assert out.columns.tolist() == ["doc_a", "doc_b", "n_common",
                                    "aa_score"]


def test_two_common_neighbors_fold(ray_session):
    from sits_ray.stages.graph import adamic_adar_topk

    # square 1-2, 2-3, 3-4, 4-1: candidates (1,3) via {2,4}, (2,4) via
    # {1,3}; all degrees 2 -> score = 2/ln 2 each, folded y-ascending
    out = adamic_adar_topk(_pairs([(1, 2), (2, 3), (3, 4), (1, 4)]))
    w = 1.0 / math.log(2.0)
    assert {(r.doc_a, r.doc_b) for r in out.itertuples()} == {
        (1, 3), (2, 4)}
    assert out.n_common.tolist() == [2, 2]
    assert all(s == w + w for s in out.aa_score)
    # tie -> (doc_a, doc_b) asc
    assert out.doc_a.tolist() == [1, 2]


def test_distributed_tier_matches_local(ray_session):
    from sits_ray.stages.graph import adamic_adar_topk

    rng = np.random.default_rng(5)
    edges = set()
    while len(edges) < 60:
        x, z = sorted(rng.integers(0, 25, 2).tolist())
        if x != z:
            edges.add((x, z))
    rows = sorted(edges)
    loc = adamic_adar_topk(_pairs(rows), k=15)
    dist = adamic_adar_topk(_pairs(rows), k=15, local_edges=1)
    lo = loc.reset_index(drop=True)
    di = dist.reset_index(drop=True)
    pd.testing.assert_frame_equal(lo, di, check_dtype=False)


def test_words_variant_runs(ray_session):
    import ray.data as rd

    from sits_ray.stages.textrank import adamic_adar_words

    docs = pd.DataFrame({"text": [
        "aa bb cc", "bb cc dd", "cc dd ee", "dd ee aa", "ee aa bb",
    ] * 4})
    out = adamic_adar_words(rd.from_pandas(docs), v=5, k=10)
    assert out.columns.tolist() == ["word_a", "word_b", "n_common",
                                    "aa_score"]
    # scores ordered desc with (word_a, word_b) tiebreak
    s = out.aa_score.to_numpy()
    assert (s[:-1] >= s[1:]).all()
