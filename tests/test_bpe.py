"""Distributed BPE merge training vs the textbook scalar algorithm."""

import collections

import pandas as pd
import pytest

from sits_ray.stages.bpe import bpe_train, bpe_train_scalar, word_counts


def test_scalar_bpe_textbook_example():
    # the canonical Sennrich example shape: repeated suffix pairs win
    c = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_scalar(c, n_merges=4)
    assert [m[3] for m in merges][:2] == ["es", "est"]
    # counts: 'e','s' appears in newest+widest = 9
    assert merges[0][4] == 9


def test_scalar_bpe_deterministic_tiebreak():
    # two pairs with equal count: lexicographically smaller pair first
    c = {"ab": 1, "cd": 1}
    merges = bpe_train_scalar(c, n_merges=1)
    assert (merges[0][1], merges[0][2]) == ("a", "b")


def test_distributed_matches_scalar(ray_session):
    import ray.data as rd

    texts = [
        "the lowest low lower newest new wide widest",
        "low low newest newest the them there",
        "wide wider widest newest lowest",
    ]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    got = bpe_train(word_counts(ds), n_merges=8)
    ex = collections.Counter()
    import re

    for t in texts:
        ex.update(re.findall(r"[a-z]+", t.lower()))
    want = bpe_train_scalar(dict(ex), n_merges=8)
    assert len(got) == len(want)
    for row, w in zip(got.itertuples(index=False), want):
        assert (row.rank, row.left, row.right, row.merged, row.pair_count) == w
