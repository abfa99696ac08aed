import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.stages.dedup import (
    MinHasher,
    exact_dedup,
    hamming64,
    minhash_dedup,
    ngram_jaccard,
    simhash64,
)


def _docs():
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest to find some tasty food for the winter"
    )
    near = base.replace("tasty", "delicious")  # near-duplicate
    far = "completely different content about satellite image time series analysis"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": near},
        {"doc_id": 2, "text": far},
        {"doc_id": 3, "text": base},  # exact duplicate
        {"doc_id": 4, "text": "short text"},
    ]
    return pd.DataFrame(rows)


def test_ngram_jaccard():
    d = _docs()
    assert ngram_jaccard(d.text[0], d.text[3]) == 1.0
    assert ngram_jaccard(d.text[0], d.text[1]) > 0.7
    assert ngram_jaccard(d.text[0], d.text[2]) < 0.1


def test_minhash_similarity_estimates_jaccard():
    d = _docs()
    mh = MinHasher(n_perm=128)
    s0, s1, s2 = (mh.signature(d.text[i]) for i in (0, 1, 2))
    est01 = (s0 == s1).mean()
    est02 = (s0 == s2).mean()
    assert est01 > 0.6
    assert est02 < 0.2
    # deterministic
    np.testing.assert_array_equal(s0, MinHasher(n_perm=128).signature(d.text[0]))


def test_minhash_dedup_pipeline(ray_session):
    ds = rd.from_pandas(_docs())
    out = minhash_dedup(ds, threshold=0.7).to_pandas()
    pairs = {tuple(sorted((a, b))) for a, b in zip(out.doc_a, out.doc_b)}
    assert (0, 3) in pairs  # exact dup found
    assert (0, 1) in pairs or (1, 3) in pairs  # near dup found
    assert not any(2 in p for p in pairs)  # unrelated doc not paired


def test_exact_dedup(ray_session):
    ds = rd.from_pandas(_docs())
    out = exact_dedup(ds).to_pandas()
    assert len(out) == 4  # 5 docs, one exact dup removed
    assert 3 not in set(out.doc_id)  # first id wins


def test_simhash_near_vs_far():
    d = _docs()
    s0, s1, s2 = simhash64(d.text[0]), simhash64(d.text[1]), simhash64(d.text[2])
    assert hamming64(s0, s1) < hamming64(s0, s2)
    assert simhash64(d.text[0]) == simhash64(d.text[3])
    assert simhash64("") == 0
