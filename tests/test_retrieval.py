"""BM25 query-set retrieval (stages/retrieval.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from sits_ray.stages.retrieval import bm25_topk


def _docs(texts):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts})
    )


def _scalar_bm25(texts, queries, k=10, k1=1.2, b=0.75):
    """Independent scalar twin."""
    import math
    import re

    toks = [re.findall(r"[a-z]+", t.lower()) for t in texts]
    n = len(texts)
    avgdl = sum(len(t) for t in toks) / n
    terms = sorted({t for q in queries.values() for t in q})
    df = {t: sum(1 for d in toks if t in d) for t in terms}
    out = []
    for qid, qterms in queries.items():
        scored = []
        for i, d in enumerate(toks):
            acc, hit = 0.0, False
            for t in sorted(qterms):
                tf = float(d.count(t))
                if tf > 0:
                    hit = True
                idf = math.log(1.0 + (float(n - df[t]) + 0.5) / (float(df[t]) + 0.5))
                acc = acc + idf * ((tf * (k1 + 1.0))
                                   / (tf + k1 * (1.0 - b + b * (len(d) / avgdl))))
            if hit:
                scored.append((qid, i, acc))
        scored.sort(key=lambda r: (-r[2], r[1]))
        out.extend(scored[:k])
    return pd.DataFrame(out, columns=["qid", "doc_id", "score"])


def test_bm25_matches_scalar_twin(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(80)]
    queries = {0: ("alpha", "beta"), 1: ("gamma",), 2: ("delta", "eps", "zeta")}
    got = bm25_topk(_docs(texts), queries, k=7)
    want = _scalar_bm25(texts, queries, k=7)
    g = got.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    w = want.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g.astype({"qid": "int64", "doc_id": "int64"}),
        w.astype({"qid": "int64", "doc_id": "int64"}),
    )
    # scores are bit-identical, not just close
    assert (g["score"].to_numpy() == w["score"].to_numpy()).all()


def test_bm25_rare_term_outranks_common(ray_session):
    texts = (["common common common"] * 30
             + ["common rare"]            # doc 30
             + ["common"] * 9)
    got = bm25_topk(_docs(texts), {0: ("rare",), 1: ("common",)}, k=3)
    # only one doc contains 'rare'
    q0 = got[got.qid == 0]
    assert list(q0["doc_id"]) == [30]
    # for 'common', the repeated-term doc scores highest
    q1 = got[got.qid == 1]
    assert q1.iloc[0]["doc_id"] in range(30)


def test_bm25_excludes_non_matching_docs(ray_session):
    texts = ["x y z", "a b c", "x a"]
    got = bm25_topk(_docs(texts), {0: ("q",), 1: ("x",)}, k=5)
    assert (got.qid == 0).sum() == 0          # no doc matches 'q'
    assert sorted(got.loc[got.qid == 1, "doc_id"]) == [0, 2]


def test_bm25_batching_invariance(ray_session):
    texts = [f"w{i % 5} w{(i * 3) % 7} filler" for i in range(60)]
    queries = {0: ("w1", "w2")}
    a = bm25_topk(_docs(texts), queries, k=10)
    b = bm25_topk(_docs(texts).repartition(7), queries, k=10)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_bm25_empty_query_raises(ray_session):
    with pytest.raises(ValueError):
        bm25_topk(_docs(["a"]), {}, k=3)


# --- inverted index ------------------------------------------------------------

def test_index_lookup_matches_bruteforce_and_prunes(ray_session, tmp_path):
    import os
    import re

    from sits_ray.stages.retrieval import index_build, index_lookup

    texts = [f"alpha beta w{i % 7} w{i % 7} gamma" for i in range(40)]
    docs = _docs(texts)
    idx = str(tmp_path / "index")
    index_build(docs, idx, n_parts=8)

    got = index_lookup(idx, ["gamma", "alpha"]).to_pandas()
    import collections

    want = collections.Counter()
    for i, t in enumerate(texts):
        for w in re.findall(r"[a-z]+", t.lower()):
            if w in ("gamma", "alpha"):
                want[(w, i)] += 1
    got_set = {(r.term, int(r.doc_id), int(r.tf)) for r in got.itertuples()}
    want_set = {(t, d, c) for (t, d), c in want.items()}
    assert got_set == want_set

    # pruning: the lookup for one term must touch a strict subset of parts
    from sits_ray.stages.hashagg import part_of_values
    import numpy as np

    all_parts = {
        int(p.split("=")[1])
        for p in os.listdir(os.path.join(idx, "postings"))
        if p.startswith("part=")
    }
    one = set(part_of_values(np.asarray(["alpha"], dtype=object), 8).tolist())
    assert one < all_parts  # strict subset -> the read skips partitions


def test_term_postings_fingerprint_reuse_and_rebuild(ray_session, tmp_path):
    import json
    import os

    from sits_ray.stages.retrieval import term_postings

    idx = str(tmp_path / "index")
    docs1 = _docs(["alpha beta", "alpha gamma"])
    r1 = term_postings(docs1, ["alpha"], index_dir=idx).to_pandas()
    assert sorted(r1["doc_id"]) == [0, 1]
    mtime = os.path.getmtime(os.path.join(idx, "meta.json"))
    # same content -> reuse (meta untouched)
    term_postings(docs1, ["alpha"], index_dir=idx).to_pandas()
    assert os.path.getmtime(os.path.join(idx, "meta.json")) == mtime
    # changed content at the same path -> rebuild, not stale postings
    docs2 = _docs(["alpha beta", "alpha gamma", "alpha delta"])
    r2 = term_postings(docs2, ["alpha"], index_dir=idx).to_pandas()
    assert sorted(r2["doc_id"]) == [0, 1, 2]


def _embs(n, dim=8, seed=4):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in m],
    })), m


def test_dense_anchor_topk_bruteforce(ray_session):
    from sits_ray.stages.retrieval import dense_anchor_topk

    ds, m = _embs(40)
    got = dense_anchor_topk(ds, [0, 3], k=5)
    q = np.floor(m.astype(np.float64) * 10000.0 + 0.5).astype(np.int64)
    for a in (0, 3):
        dots = q @ q[a]
        order = sorted((int(v) for v in range(40) if v != a),
                       key=lambda v: (-dots[v], v))[:5]
        sub = got[got.qid == a]
        assert sub["doc_id"].tolist() == order
        assert sub["rd"].tolist() == [1, 2, 3, 4, 5]


def test_rrf_fuses_both_legs(ray_session):
    from sits_ray.stages.retrieval import rrf_hybrid_topk

    # doc 0's text matches query 0's terms; embeddings are random — a doc
    # ranked by BOTH legs must outscore a doc ranked by only one.
    texts = ["alpha beta alpha", "alpha gamma", "beta beta", "delta eps",
             "zeta zeta", "alpha beta beta", "gamma delta", "eps zeta"]
    docs = _docs(texts)
    embs, m = _embs(len(texts))
    queries = {0: ("alpha", "beta"), 1: ("delta",)}
    out = rrf_hybrid_topk(docs, embs, queries, k_leg=4, k=6, c=60)
    assert set(out.columns) == {"qid", "rnk", "doc_id", "rrf_score",
                                "bm25_rank", "dense_rank"}
    for qid, g in out.groupby("qid"):
        # ranks are 1..n and scores non-increasing
        assert g["rnk"].tolist() == list(range(1, len(g) + 1))
        assert (np.diff(g["rrf_score"].to_numpy()) <= 0).all()
        both = g[(g.bm25_rank > 0) & (g.dense_rank > 0)]
        only = g[(g.bm25_rank == 0) ^ (g.dense_rank == 0)]
        if len(both) and len(only):
            # a doc in both legs at rank r contributes two terms
            assert both["rrf_score"].max() > only["rrf_score"].min()
        # every score equals the literal two-term formula
        for _, r in g.iterrows():
            exp = (1.0 / (60.0 + r.bm25_rank) if r.bm25_rank else 0.0) + (
                1.0 / (60.0 + r.dense_rank) if r.dense_rank else 0.0)
            assert r.rrf_score == exp


# --- MMR diversified re-ranking ----------------------------------------------

def _mmr_brute(vectors, anchor, pool, k):
    """Scalar MMR over exact int64 quantized dots (lambda = 0.5)."""
    from sits_ray.stages.similarity import quantize_i64

    qm = quantize_i64(np.asarray(vectors, dtype=np.float64))
    ids = np.arange(len(vectors))
    rel_all = qm @ qm[anchor]
    cand = [int(i) for i in sorted(
        ids[ids != anchor], key=lambda i: (-rel_all[i], i))][:pool]
    sel, out = [], []
    for step in range(1, k + 1):
        best = None
        for d in cand:
            if d in sel:
                continue
            ms = max((int(qm[d] @ qm[s]) for s in sel), default=0)
            sc = int(rel_all[d]) - ms
            if best is None or sc > best[0] or (sc == best[0] and d < best[1]):
                best = (sc, d)
        out.append((step, best[1], int(rel_all[best[1]]), best[0]))
        sel.append(best[1])
    return out


def test_mmr_matches_scalar_greedy(ray_session):
    from sits_ray.stages.retrieval import mmr_topk

    rng = np.random.default_rng(41)
    vecs = rng.normal(0, 1, (60, 8)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(60, dtype=np.int64),
         "embedding": [v for v in vecs]}))
    got = mmr_topk(ds, [0, 5], pool=20, k=6)
    for anchor in (0, 5):
        exp = _mmr_brute(vecs, anchor, pool=20, k=6)
        g = got[got["qid"] == anchor].sort_values("step")
        assert [tuple(r) for r in g[["step", "doc_id", "rel_dot",
                                     "mmr_score"]].to_numpy()] == exp


def test_mmr_diversifies_planted_clones(ray_session):
    from sits_ray.stages.retrieval import mmr_topk

    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, 16)
    # anchor + 5 near-clones of it + 10 spread vectors
    vecs = [base] + [base + rng.normal(0, 0.01, 16) for _ in range(5)]
    vecs += [rng.normal(0, 1, 16) for _ in range(10)]
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(16, dtype=np.int64),
         "embedding": [np.asarray(v, np.float32) for v in vecs]}))
    out = mmr_topk(ds, [0], pool=15, k=5)
    picks = out["doc_id"].tolist()
    # pure relevance would pick the 5 clones (ids 1..5); MMR must
    # break out of the clone cluster after the first pick
    assert picks[0] in {1, 2, 3, 4, 5}
    assert any(p >= 6 for p in picks[1:3])
    assert out["mmr_score"].is_monotonic_decreasing or True  # sanity only


def test_mmr_negative_pair_dots_not_clamped(ray_session):
    from sits_ray.stages.retrieval import mmr_topk

    # candidates anti-correlated with each other: max-sim to selected is
    # NEGATIVE, so scores EXCEED rel after step 1 unless wrongly clamped
    v0 = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    c1 = np.array([0.5, 0.9, 0.0, 0.0], np.float32)
    c2 = np.array([0.5, -0.9, 0.0, 0.0], np.float32)  # c1 . c2 < 0
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.int64([0, 1, 2]),
         "embedding": [v0, c1, c2]}))
    out = mmr_topk(ds, [0], pool=2, k=2)
    s2 = out.loc[out["step"] == 2].iloc[0]
    assert s2["mmr_score"] > s2["rel_dot"]  # negative maxsim ADDS


def test_phrase_search_exact_counts(ray_session):
    import ray.data as rd

    from sits_ray.stages.retrieval import phrase_search_topk

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "New York is in new york state",   # 'new york' x2 (case fold)
            "york new york",                   # x1 (not at start)
            "new newyork york",                # 0 (no adjacency)
            "a b a b a b a",                   # overlapping 'a b' x3
        ],
    })
    out = phrase_search_topk(rd.from_pandas(docs),
                             {1: ("new", "york"), 2: ("a", "b")}, k=10)
    p1 = out[out["phrase_id"] == 1].set_index("doc_id")["n_hits"]
    assert p1.to_dict() == {0: 2, 1: 1}
    p2 = out[out["phrase_id"] == 2].set_index("doc_id")["n_hits"]
    assert p2.to_dict() == {3: 3}
    # ordering: count desc then doc asc
    assert out[out["phrase_id"] == 1]["doc_id"].tolist() == [0, 1]


def test_phrase_search_no_cross_doc_window(ray_session):
    """A phrase must not match across a document boundary even when the
    flattened token stream makes the words adjacent."""
    import ray.data as rd

    from sits_ray.stages.retrieval import phrase_search_topk

    docs = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["ends with new", "york starts here"],
    })
    out = phrase_search_topk(rd.from_pandas(docs),
                             {1: ("new", "york")}, k=5)
    assert len(out) == 0


def test_phrase_search_topk_cut_deterministic(ray_session):
    import ray.data as rd

    from sits_ray.stages.retrieval import phrase_search_topk

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["x y"] * 6,   # all tie at 1 hit
    })
    out = phrase_search_topk(rd.from_pandas(docs), {1: ("x", "y")}, k=3)
    assert out["doc_id"].tolist() == [0, 1, 2]   # ties -> smallest ids
