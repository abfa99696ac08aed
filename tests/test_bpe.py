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


def _scalar_encode_ntok(w: str, merges: list[tuple]) -> int:
    from sits_ray.stages.bpe import _split_word

    syms = _split_word(w)
    for _, a, b, ab, _c in merges:
        res, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                res.append(ab)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return len(syms)


def test_encode_vocab_matches_scalar_walk():
    from sits_ray.stages.bpe import bpe_train_scalar, encode_vocab_ntok

    c = {"the": 9, "them": 3, "there": 2, "lowest": 4, "low": 6,
         "newest": 5, "a": 7, "aaaa": 2}
    merges = bpe_train_scalar(c, n_merges=6)
    mt = pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged", "pair_count"]
    )
    got = encode_vocab_ntok(list(c), mt)
    want = [_scalar_encode_ntok(w, merges) for w in c]
    assert got.tolist() == want
    # repeated-pair overlap rule: 'aaaa' with merge (a,a) -> leftmost
    # non-overlapping pairs, never a chain re-merge within one round


def test_bpe_encode_doc_tokens_end_to_end(ray_session):
    import ray.data as rd

    from sits_ray.stages.bpe import (
        bpe_encode_doc_tokens,
        bpe_train,
        bpe_train_scalar,
        word_counts,
    )

    texts = ["the lowest low lower", "newest new the", "12345 !!!", ""]
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": texts})
    ds = rd.from_pandas(df)
    merges = bpe_train(word_counts(ds), n_merges=5)
    out = (
        bpe_encode_doc_tokens(ds, merges).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # zero-word docs (3: digits/punct only, 4: empty) drop
    assert out.doc_id.tolist() == [1, 2]
    ex = collections.Counter()
    import re

    for t in texts:
        ex.update(re.findall(r"[a-z]+", t.lower()))
    ms = bpe_train_scalar(dict(ex), n_merges=5)
    for _, row in out.iterrows():
        words = re.findall(r"[a-z]+", texts[int(row.doc_id) - 1].lower())
        assert row.n_words == len(words)
        assert row.n_syms_init == sum(len(w) + 1 for w in words)
        assert row.n_tokens == sum(_scalar_encode_ntok(w, ms) for w in words)
        assert row.tokens_per_word == row.n_tokens / row.n_words
