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
