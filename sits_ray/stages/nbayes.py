"""Multinomial Naive Bayes text classifier (train + score), SQL-exact.

Maps the reference's classical model factories (``sits_mlr`` /
``sits_rfor`` family — R/sits_machine_learning.R) onto the text domain:
train a generative token model per class label, score held-out documents
with the standard add-one-smoothed multinomial likelihood (McCallum &
Nigam 1998), argmax with a deterministic tie-break.

Scale shape: training is ONE streaming pass with per-batch partial
(label, token) counts; the merged table is (vocab x n_classes)-sized —
BOUNDED (natural-language vocabularies plateau by Heaps' law; classes
are a catalog), so the per-batch partials (each already <= vocab x
classes rows) fold on the driver like the other census operators.
Scoring is one stateless ``map_batches`` pass with the quantized
log-probability matrix captured by closure (KBs — no shuffle, no join).

Float/exactness contract (the calibration_bins cents discipline): every
log-probability is ``floor(log(num/den) * 1e6 + 0.5)`` in int64 —
``num/den`` is ONE correctly-rounded division of exact int->double
casts, ``math.log`` (libm) == DuckDB ``ln`` bit-for-bit (np.log's SIMD
path diverges on ~20%% of inputs — CLAUDE.md), the *1e6+0.5 floor is the
same double arithmetic on both sides. Per-document scores are then
INTEGER sums — order-free, so np.add.reduceat's pairwise order is
irrelevant and the SQL twin needs no ordered fold. OOV test tokens
(absent from the training vocabulary) contribute 0 on both sides (the
SQL twin's left join drops them)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_TOKEN_RE = r"[a-z]+"


def nb_train(ds, text_col: str = "text", label_col: str = "source",
             train_pred=None) -> dict:
    """One streaming pass -> quantized-log NB model dict.

    ``train_pred``: optional vectorized predicate ``df -> bool mask``
    selecting training rows (default: all rows). Returns
    ``{"classes", "vocab", "qlogp" (V x C int64), "qprior" (C int64)}``.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if train_pred is not None:
            df = df[train_pred(df)]
        if df.empty:
            return pd.DataFrame(
                {"label": pd.Series([], dtype=str),
                 "token": pd.Series([], dtype=str),
                 "cnt": pd.Series([], dtype="int64"),
                 "ndoc": pd.Series([], dtype="int64")}
            )
        toks = df[text_col].str.lower().str.findall(_TOKEN_RE)
        lab = df[label_col].astype(str)
        ex = pd.DataFrame(
            {"label": lab.repeat(toks.str.len()),
             "token": np.concatenate([np.asarray(t, dtype=object)
                                      for t in toks])
             if len(toks) else np.array([], dtype=object)}
        )
        cnt = (ex.groupby(["label", "token"], sort=False)
               .size().reset_index(name="cnt"))
        cnt["cnt"] = cnt["cnt"].astype(np.int64)
        cnt["ndoc"] = np.int64(0)
        nd = lab.value_counts()
        ndr = pd.DataFrame(
            {"label": nd.index.astype(str),
             "token": "", "cnt": np.int64(0),
             "ndoc": nd.to_numpy(dtype=np.int64)}
        )
        return pd.concat([cnt, ndr], ignore_index=True)

    # partials are (vocab x classes)-bounded per batch; driver merge
    m = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["label", "token"], as_index=False, sort=True)
         [["cnt", "ndoc"]].sum())
    tok_rows = m[m["token"] != ""]
    doc_rows = m[m["token"] == ""]
    classes = np.sort(doc_rows["label"].unique())
    vocab = np.sort(tok_rows["token"].unique())
    C, V = len(classes), len(vocab)
    cidx = {c: i for i, c in enumerate(classes)}
    vidx = {t: i for i, t in enumerate(vocab)}
    cnt = np.zeros((V, C), dtype=np.int64)
    for lab, tok, c in zip(tok_rows["label"], tok_rows["token"],
                           tok_rows["cnt"].to_numpy(np.int64)):
        cnt[vidx[tok], cidx[lab]] = c
    ctot = cnt.sum(axis=0)  # int64 tokens per class
    ndoc = np.zeros(C, dtype=np.int64)
    for lab, n in zip(doc_rows["label"],
                      doc_rows["ndoc"].to_numpy(np.int64)):
        ndoc[cidx[lab]] = n
    n_train = int(ndoc.sum())
    # libm log of ONE exact-ratio double each — vocab-sized driver loop
    qlogp = np.empty((V, C), dtype=np.int64)
    for j in range(C):
        den = float(ctot[j] + V)
        for i in range(V):
            lp = math.log(float(cnt[i, j] + 1) / den)
            qlogp[i, j] = math.floor(lp * 1000000.0 + 0.5)
    qprior = np.array(
        [math.floor(math.log(float(n) / float(n_train)) * 1000000.0 + 0.5)
         for n in ndoc], dtype=np.int64)
    return {"classes": classes, "vocab": vocab,
            "qlogp": qlogp, "qprior": qprior}


def nb_classify(ds, model: dict, text_col: str = "text",
                label_col: str = "source", test_pred=None):
    """Score documents under ``model``: integer score sums + argmax with
    (score desc, class asc) tie-break. Returns a Dataset of
    (doc_id, pred_source, score, true_source, correct)."""
    classes, vocab = model["classes"], model["vocab"]
    qlogp, qprior = model["qlogp"], model["qprior"]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if test_pred is not None:
            df = df[test_pred(df)]
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "pred_source": pd.Series([], dtype=str),
                 "score": pd.Series([], dtype="int64"),
                 "true_source": pd.Series([], dtype=str),
                 "correct": pd.Series([], dtype="int64")}
            )
        toks = df[text_col].str.lower().str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        flat = (np.concatenate([np.asarray(t, dtype=object) for t in toks])
                if lens.sum() else np.array([], dtype=object))
        ti = np.searchsorted(vocab, flat)
        known = (ti < len(vocab))
        if known.any():
            known &= vocab[np.minimum(ti, len(vocab) - 1)] == flat
        rows = qlogp[ti[known]]  # (n_known, C) int64
        # per-doc integer segment sums (order-free)
        doc_of = np.repeat(np.arange(len(df)), lens)[known]
        S = np.zeros((len(df), len(classes)), dtype=np.int64)
        np.add.at(S, doc_of, rows)
        S += qprior[None, :]
        best = np.argmax(S, axis=1)  # first max == smallest class index
        pred = classes[best]
        truth = df[label_col].astype(str).to_numpy(dtype=object)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64),
             "pred_source": pred,
             "score": S[np.arange(len(df)), best],
             "true_source": truth,
             "correct": (pred == truth).astype(np.int64)}
        )

    return ds.map_batches(score, batch_format="pandas")
