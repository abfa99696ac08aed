"""Distributed BPE merge training (byte-pair-encoding tokenizer
induction) over the corpus — the training-data op behind
``kernels/text.bpeish_token_count``'s tokenizer.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") trains on the WORD-COUNT table, not the raw
corpus: the corpus collapses to (word, count) once — Zipf makes this
table tiny relative to the text — and every merge round then works on the
word table only. That is exactly the scale shape used here:

1. ``word_counts``: per-batch partial counts combine inside map_batches
   (corpus text never shuffles), one global groupby-sum → a distributed
   (word, cnt) table.
2. ``bpe_train``: K rounds, each = one map_batches pair-count partial over
   the word table + a tiny groupby-sum over distinct symbol pairs + a
   deterministic argmax (max count, then lexicographic pair), then a
   map_batches merge pass rewriting each word's symbol list. The word
   table is materialized between rounds (it is vocab-sized — small data
   by construction), so each round reads the previous round's result
   instead of replaying the chain.

The per-word merge rewrite is a short Python loop over the VOCAB (not the
corpus) — the same loop every production BPE trainer runs on its word
table; vocab rows per batch are bounded and the work is
actor-parallelized.

Determinism: ties on pair count break lexicographically, so the merge
sequence is a pure function of the corpus. tests/test_bpe.py pins the
whole sequence against a scalar Counter-based twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

END = "</w>"


def _split_word(w: str) -> list[str]:
    return list(w) + [END]


def word_counts(ds, text_col: str = "text"):
    """Corpus -> distributed (word, cnt) table; tokens are the shared
    ``[a-z]+`` tokenizer; partial counts combine inside map_batches."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].str.lower().str.findall(r"[a-z]+").explode().dropna()
        if ex.empty:
            return pd.DataFrame(
                {"word": pd.Series([], dtype=str),
                 "cnt": pd.Series([], dtype="int64")}
            )
        vc = ex.value_counts()
        return pd.DataFrame(
            {"word": vc.index.astype(str), "cnt": vc.to_numpy(dtype="int64")}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def _pair_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial pair counts over the word table: every adjacent
    symbol pair of every word, weighted by the word's corpus count."""
    rows_a, rows_b, rows_c = [], [], []
    for syms, cnt in zip(df["syms"], df["cnt"]):
        for i in range(len(syms) - 1):
            rows_a.append(syms[i])
            rows_b.append(syms[i + 1])
            rows_c.append(cnt)
    if not rows_a:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=str), "b": pd.Series([], dtype=str),
             "cnt": pd.Series([], dtype="int64")}
        )
    out = (
        pd.DataFrame({"a": rows_a, "b": rows_b, "cnt": rows_c})
        .groupby(["a", "b"], sort=False)["cnt"].sum().reset_index()
    )
    return out


def _merge_pass(a: str, b: str):
    """Batch fn rewriting each word's symbol list: every LEFTMOST,
    NON-OVERLAPPING adjacent (a, b) becomes the merged symbol a+b —
    the classic BPE replace rule."""
    ab = a + b

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for syms in df["syms"]:
            syms = list(syms)
            res = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.DataFrame({"syms": out, "cnt": df["cnt"].to_numpy()})

    return fn


def bpe_train(words_ds, n_merges: int = 10) -> pd.DataFrame:
    """Run ``n_merges`` BPE rounds over the distributed word table;
    returns the merge table (rank, left, right, merged, pair_count) —
    the trained tokenizer's merge list."""
    from ray.data.aggregate import Sum

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"syms": [_split_word(w) for w in df["word"]],
             "cnt": df["cnt"].to_numpy()}
        )

    ds = words_ds.map_batches(to_syms, batch_format="pandas").materialize()
    merges = []
    for rank in range(n_merges):
        pairs = (
            ds.map_batches(_pair_partials, batch_format="pandas")
            .groupby(["a", "b"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        top = pairs.sort(
            ["cnt", "a", "b"], descending=[True, False, False]
        ).limit(1).take(1)
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b,
             "pair_count": cnt}
        )
        ds = ds.map_batches(_merge_pass(a, b), batch_format="pandas").materialize()
    return pd.DataFrame(merges)


def bpe_train_scalar(counter: dict[str, int], n_merges: int = 10) -> list[tuple]:
    """Scalar Counter-based twin (the textbook algorithm) used by tests to
    pin the distributed merge sequence."""
    vocab = {tuple(_split_word(w)): c for w, c in counter.items()}
    out = []
    for rank in range(n_merges):
        pc: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, a + b, cnt))
        nv = {}
        for syms, c in vocab.items():
            res, i, n = [], 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nv[tuple(res)] = nv.get(tuple(res), 0) + c
        vocab = nv
    return out
