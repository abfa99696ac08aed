"""Unigram language-model quality scoring (CCNet-style): score every
document by its per-token negative log-likelihood under the corpus's own
unigram distribution — the classic cheap quality / outlier signal for
pretraining-data curation (Wenzek et al. 2020 score documents with a
KenLM; the unigram variant keeps the same pipeline shape with an
SQL-certifiable kernel).

Scale shape: token counts come from one streaming pass with per-batch
partial counts + the hash-partitioned aggregate (corpus-cardinality
keys — stages/hashagg.py); the resulting (token -> count) table is
vocab-sized and broadcast once with ``ray.put`` (bounded: natural-language
vocabularies plateau by Heaps' law; cap with a min-count floor at true
corpus scale). Scoring is one stateless ``map_batches`` pass.

Float contract: per-document NLL accumulates SEQUENTIALLY in token order
(vectorized across equal-token-count docs, the series_ops length-group
pattern), so a DuckDB ordered-window running sum replays it bit-for-bit;
``ln(count/total)`` agrees across engines because the operand is an exact
integer ratio and both sides call the platform libm (the contract the
entropy oracles already pin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

_TOKEN_RE = r"[a-z]+"

_LUT_CACHE: dict = {}


def _lut_cache() -> dict:
    """Per-worker-process cache of deserialized log-p tables."""
    return _LUT_CACHE


def corpus_unigram_counts(ds, text_col: str = "text", n_parts: int = 32):
    """Distributed (token, cnt) table + total count."""
    from sits_ray.stages.hashagg import part_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].str.lower().str.findall(_TOKEN_RE).explode().dropna()
        if ex.empty:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=str),
                 "cnt": pd.Series([], dtype="int64")}
            )
        vc = ex.value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "cnt": vc.to_numpy(dtype="int64")}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", as_index=False, sort=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    pdf = part_aggregate(
        ds.map_batches(partial, batch_format="pandas"), merge,
        key_col="token", n_parts=n_parts,
    ).to_pandas()
    return pdf, int(pdf["cnt"].sum())


def unigram_nll(ds, counts: pd.DataFrame, total: int,
                text_col: str = "text", id_col: str = "doc_id"):
    """Per-document mean negative log-likelihood under the broadcast
    unigram model. Documents with zero tokens are dropped (no defined
    score) — mirrored by the SQL twin's inner join."""
    # math.log (libm), NOT np.log: numpy's SIMD log diverges from libm in
    # the last ulp on ~20% of inputs (measured), and DuckDB ln == libm —
    # the vocab-sized model table is driver-side, so the scalar loop is free
    import math

    logp = {
        t: math.log(c / total)
        for t, c in zip(counts["token"], counts["cnt"].to_numpy(dtype=np.float64))
    }
    ref = ray.put(logp)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # dict deserialization is NOT zero-copy (unlike numpy): cache the
        # materialized lut per worker process keyed by the object ref so
        # each worker pays the vocab unpickle once, not once per batch
        cache = _lut_cache()
        key = ref.hex()
        lut = cache.get(key)
        if lut is None:
            while len(cache) >= 4:  # bound worker memory without
                cache.pop(next(iter(cache)))  # thrashing when two model
            lut = cache[key] = ray.get(ref)  # tables alternate on a worker
        toks = df[text_col].str.lower().str.findall(_TOKEN_RE)
        ids = df[id_col].to_numpy()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        keep = lens > 0
        out_id = ids[keep]
        out_n = lens[keep]
        # flat log-p stream via one C-speed hash map over the exploded
        # tokens (explode preserves doc order then in-doc order), then
        # sequential per-doc accumulation vectorized across docs of equal
        # token count (the SQL ordered-fold order)
        if keep.any():
            flat = toks[keep].explode().map(lut).to_numpy(dtype=np.float64)
            # Series.map(dict) yields NaN on misses — keep the old
            # fromiter KeyError loudness for out-of-vocabulary tokens
            # (a counts table from a different corpus must not silently
            # poison nll)
            if np.isnan(flat).any():
                oov = toks[keep].explode()[np.isnan(flat)].unique()
                raise KeyError(
                    f"tokens missing from counts table: {list(oov[:5])!r}"
                )
        else:
            flat = np.empty(0, dtype=np.float64)
        offs = np.concatenate([[0], np.cumsum(out_n)])
        nll = np.empty(out_n.size, dtype=np.float64)
        for length in np.unique(out_n):
            rows = np.flatnonzero(out_n == length)
            idx = offs[rows][:, None] + np.arange(length)
            m = flat[idx]  # (r, length)
            acc = np.zeros(rows.size, dtype=np.float64)
            for j in range(int(length)):
                acc = acc + (-m[:, j])
            nll[rows] = acc / np.float64(length)
        return pd.DataFrame(
            {id_col: out_id, "n_tokens": out_n, "nll": nll}
        )

    return ds.map_batches(score, batch_format="pandas")


def corpus_bigram_counts(ds, text_col: str = "text", n_parts: int = 32):
    """Distributed (prev, w, cnt) bigram table via the part_aggregate
    high-cardinality path (composite 'prev w' key), plus the unigram
    marginals and vocab size the add-one smoother needs."""
    from sits_ray.stages.hashagg import part_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(_TOKEN_RE)
        rows = []
        for ts in toks:
            for a, b in zip(ts[:-1], ts[1:]):
                rows.append(a + " " + b)
        if not rows:
            return pd.DataFrame({"pair": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype="int64")})
        vc = pd.Series(rows).value_counts()
        return pd.DataFrame({"pair": vc.index.astype(str),
                             "cnt": vc.to_numpy(dtype="int64")})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pair", as_index=False, sort=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    pairs = ds.map_batches(partial, batch_format="pandas")
    return part_aggregate(pairs, merge, key_col="pair",
                          n_parts=n_parts).to_pandas()


def bigram_nll(ds, bi: pd.DataFrame, uni: pd.DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               max_broadcast_bigrams: int = 2_000_000):
    """Per-document mean bigram NLL with add-one smoothing:
    ``P(w | prev) = (c2(prev, w) + 1) / (c1(prev) + V)`` — the KenLM-lite
    quality signal one rung above :func:`unigram_nll` (context-aware:
    scrambled-but-lexically-normal text scores badly here and fine
    there). Docs with fewer than two tokens are dropped.

    Float contract: each conditional is an exact integer ratio, ln goes
    through math.log on the bounded DISTINCT-bigram driver table, and
    the per-doc fold accumulates sequentially in position order — the
    unigram_nll ordered-fold contract, replayed by the SQL twin's
    list_reduce.

    Broadcast bound (VERDICT r4 watch item): below
    ``max_broadcast_bigrams`` distinct bigrams the full table ships and
    scores are EXACT (the bench/gate path). Past it — open-vocabulary
    web corpora, where distinct bigrams grow superlinearly in the
    unigram vocabulary — the table is pruned KenLM-style to the top-K
    bigrams under the deterministic total order (cnt desc, pair asc),
    and every pruned or unseen bigram backs off to the smoother's
    unseen mass ``P(w | prev) = 1 / (c1(prev) + V)``, which needs only
    the unigram marginals (Heaps-bounded). Worker state is then
    O(K + vocab) regardless of corpus size; pruning is the documented
    approximation (a dropped bigram with true count c scores as if
    c = 0). Docs whose bigrams are all kept score bit-identically to
    the exact path (pinned by test_lmscore_cap)."""
    import math

    c1 = {t: int(c) for t, c in zip(uni["token"], uni["cnt"])}
    v = len(c1)
    if len(bi) > max_broadcast_bigrams:
        bi = (bi.sort_values(["cnt", "pair"], ascending=[False, True])
                .head(max_broadcast_bigrams))
        # backoff needs log(1/(c1(prev)+V)) per PREV token only; the
        # literal 1/(c+v) ratio (NOT -log(c+v) — off by an ulp when
        # 1/(c+v) is inexact) keeps it on the same float tree as the
        # kept-bigram terms
        back = {t: math.log(1 / (c + v)) for t, c in c1.items()}
    else:
        back = None
    logp = {
        p: math.log((int(c) + 1) / (c1[p.split(" ", 1)[0]] + v))
        for p, c in zip(bi["pair"], bi["cnt"])
    }
    ref = ray.put((logp, back))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cache = _lut_cache()
        key = ref.hex()
        got = cache.get(key)
        if got is None:
            while len(cache) >= 4:
                cache.pop(next(iter(cache)))
            got = cache[key] = ray.get(ref)
        lut, backoff = got
        toks = df[text_col].str.lower().str.findall(_TOKEN_RE)
        ids = df[id_col].to_numpy()
        lens = toks.str.len().to_numpy(dtype=np.int64)
        keep = lens >= 2
        out_id = ids[keep]
        out_n = lens[keep]
        flats = []
        if backoff is None:
            # exact path: every corpus bigram is in the table (loud
            # KeyError otherwise — foreign counts must not score 0)
            for ts in toks[keep]:
                flats.extend(
                    lut[a + " " + b] for a, b in zip(ts[:-1], ts[1:])
                )
        else:
            # pruned path: missing bigram -> the add-one unseen mass
            # log(1/(c1(prev)+V)); prev itself unseen stays a KeyError
            for ts in toks[keep]:
                for a, b in zip(ts[:-1], ts[1:]):
                    p = lut.get(a + " " + b)
                    flats.append(backoff[a] if p is None else p)
        flat = np.asarray(flats, dtype=np.float64)
        nb = out_n - 1
        offs = np.concatenate([[0], np.cumsum(nb)])
        nll = np.empty(nb.size, dtype=np.float64)
        for length in np.unique(nb):
            rows = np.flatnonzero(nb == length)
            idx = offs[rows][:, None] + np.arange(length)
            m = flat[idx]
            acc = np.zeros(rows.size, dtype=np.float64)
            for j in range(int(length)):
                acc = acc + (-m[:, j])
            nll[rows] = acc / np.float64(length)
        return pd.DataFrame({id_col: out_id,
                             "n_tokens": out_n, "nll": nll})

    return ds.map_batches(score, batch_format="pandas")
