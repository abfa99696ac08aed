"""TextRank (stages/textrank.py): hand-replayed integer PageRank, exact
top-v vocabulary merge, adjacency/window semantics."""

import numpy as np
import pandas as pd


def _docs(texts):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({"text": texts}))


def test_top_vocab_exact(ray_session):
    from sits_ray.stages.textrank import top_vocab

    ds = _docs(["a a a b b c", "b c c d"])
    v = top_vocab(ds, v=3)
    # counts: a=3, b=3, c=3, d=1 -> top3 by (cnt desc, word asc) = a,b,c
    assert v.token.tolist() == ["a", "b", "c"]
    assert v.cnt.tolist() == [3, 3, 3]


def test_hand_pagerank_two_nodes(ray_session):
    from sits_ray.stages.textrank import textrank_keywords

    # one doc "x y": vocab {x, y}, one undirected edge weight 1 each way
    out = textrank_keywords(_docs(["x y"]), v=4, iters=2)
    # symmetric graph -> equal ranks; replay: S=1e9, base=15e7
    # it1: contrib = (1e9*1)//1 = 1e9 -> r = 15e7 + (85*1e9)//100 = 1e9
    # it2: same -> 1e9
    assert out.rank_int.tolist() == [1_000_000_000, 1_000_000_000]
    assert out.word.tolist() == ["x", "y"]       # tie -> word asc
    assert out.rnk.tolist() == [1, 2]


def test_isolated_word_gets_base_rank(ray_session):
    from sits_ray.stages.textrank import textrank_keywords

    # "z" never adjacent to another vocab word (docs of length 1)
    out = textrank_keywords(_docs(["x y", "x y", "z"]), v=3, iters=3)
    z = out[out.word == "z"].iloc[0]
    assert int(z.rank_int) == 150_000_000
    # connected words outrank the isolated one
    assert out.word.tolist()[:2] == ["x", "y"]


def test_oov_breaks_adjacency_and_asymmetric_weights(ray_session):
    from sits_ray.stages.textrank import textrank_keywords

    # vocab (v=2) = top2 = {a, b}; doc2 has a RARE word between a and b,
    # which is OOV for the graph -> no a-b edge from doc2
    out = textrank_keywords(
        _docs(["a b", "a zz b", "a b c"]), v=2, iters=1)
    # edges: a-b weight 2 (doc1, doc3) — if OOV did not break adjacency
    # it would be 3. With w=2 both ends: contrib=(1e9*2)//2=1e9 -> 1e9
    assert set(out.word) == {"a", "b"}
    assert out.rank_int.tolist() == [1_000_000_000, 1_000_000_000]


def test_hand_triangle_weights(ray_session):
    from sits_ray.stages.textrank import textrank_keywords

    # docs: "a b" x2, "b c" -> edges a-b:2, b-c:1
    out = textrank_keywords(_docs(["a b", "a b", "b c"]), v=3, iters=1)
    r = dict(zip(out.word, (int(x) for x in out.rank_int)))
    S, base = 1_000_000_000, 150_000_000
    # wsum: a=2, b=3, c=1
    ca = (S * 2) // 3                       # from b
    cb = (S * 2) // 2 + (S * 1) // 1        # from a and c
    cc = (S * 1) // 3                       # from b
    assert r["a"] == base + (85 * ca) // 100
    assert r["b"] == base + (85 * cb) // 100
    assert r["c"] == base + (85 * cc) // 100
    assert out.word.tolist()[0] == "b"
