"""TextRank keyword extraction (Mihalcea & Tarau 2004) with an
integer-quantized PageRank so the whole pipeline is SQL-exact.

Reference analog: sits' pattern extraction ranks representative
prototypes from co-occurrence structure (sits_patterns); TextRank is the
text-domain member — rank words by their centrality in the adjacent-token
co-occurrence graph.

Scale shape: two streaming passes and one bounded shuffle —
(1) exact global top-V vocabulary: per-batch token-count partials, one
    ``part_aggregate`` keyed by token (all counts of a word co-located),
    each partition emits only its LOCAL top-V by (cnt desc, word asc) —
    any global top-V word is in its owner partition's top-V, so the
    driver merge of <= V*n_parts rows is exact;
(2) edge census: the V-word vocabulary broadcasts in the closure, each
    batch counts adjacent in-vocab bigrams (undirected, canonical
    (min,max), self-pairs dropped) into <= V^2/2 partials.
The PageRank itself runs on the driver over the V-node graph with
arbitrary-precision Python ints: per iteration
``r'_v = (15*S)//100 + (85 * sum_u (r_u * w_uv) // W_u) // 100`` with
S = 1e9 — every operand non-negative, so DuckDB's truncating ``//``
equals floor and the recursive-CTE twin replays the walk bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sits_ray.stages.hashagg import part_aggregate

_SCALE = 1_000_000_000


def _token_partials(df: pd.DataFrame) -> pd.DataFrame:
    ex = df["text"].str.lower().str.findall(r"[a-z]+").explode().dropna()
    if ex.empty:
        return pd.DataFrame({"token": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype="int64")})
    g = ex.value_counts()
    return pd.DataFrame({"token": g.index.to_numpy(),
                         "cnt": g.to_numpy(np.int64)})


def top_vocab(ds, v: int = 64, n_parts: int = 32) -> pd.DataFrame:
    """Exact global top-v tokens by (count desc, token asc)."""
    pre = ds.map_batches(_token_partials, batch_format="pandas")

    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("token", sort=False)["cnt"].sum().reset_index()
        t["cnt"] = t["cnt"].astype(np.int64)
        return (t.sort_values(["cnt", "token"], ascending=[False, True])
                 .head(v))

    parts = part_aggregate(pre, local_top, key_col="token",
                           n_parts=n_parts).to_pandas()
    return (parts.sort_values(["cnt", "token"], ascending=[False, True])
                 .head(v).reset_index(drop=True))


def _edge_partials_fn(vset: set):
    """Per-batch adjacent-bigram census over an in-vocab word set:
    vectorized explode/shift/filter, canonical (min, max) pairs,
    self-pairs dropped. Shared by textrank_keywords and
    adamic_adar_words."""

    def edge_partials(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=str),
                              "b": pd.Series([], dtype=str),
                              "n": pd.Series([], dtype="int64")})
        ex = (df["text"].str.lower().str.findall(r"[a-z]+")
                .explode().dropna())
        if len(ex) < 2:
            return empty
        w = ex.to_numpy()
        did = ex.index.to_numpy()
        same = did[1:] == did[:-1]
        p, nx = w[:-1][same], w[1:][same]
        keep = ((p != nx) & pd.Series(p).isin(vset).to_numpy()
                & pd.Series(nx).isin(vset).to_numpy())
        p, nx = p[keep], nx[keep]
        if p.size == 0:
            return empty
        lo = np.where(p < nx, p, nx)
        hi = np.where(p < nx, nx, p)
        g = (pd.DataFrame({"a": lo, "b": hi})
               .groupby(["a", "b"], sort=False).size()
               .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    return edge_partials


def textrank_keywords(ds, v: int = 64, iters: int = 10,
                      n_parts: int = 32) -> pd.DataFrame:
    """Rank the top-v vocabulary by integer PageRank over the
    adjacent-token co-occurrence graph. Returns one row per vocab word:
    (rnk, word, cnt, rank_int) ordered by (rank_int desc, word asc)."""
    voc = top_vocab(ds, v=v, n_parts=n_parts)
    words = voc["token"].tolist()
    vset = set(words)
    ed = (ds.map_batches(_edge_partials_fn(vset),
                         batch_format="pandas").to_pandas()
            .groupby(["a", "b"], sort=True)["n"].sum().reset_index())

    # symmetrize; arbitrary-precision ints (exact at any corpus size)
    adj: dict[str, list[tuple[str, int]]] = {w: [] for w in words}
    wsum: dict[str, int] = {w: 0 for w in words}
    for a, b, n in zip(ed["a"], ed["b"], ed["n"]):
        n = int(n)
        adj[a].append((b, n))
        adj[b].append((a, n))
        wsum[a] += n
        wsum[b] += n

    r = {w: _SCALE for w in words}
    base = (15 * _SCALE) // 100
    for _ in range(iters):
        contrib = {w: 0 for w in words}
        for u in words:
            if wsum[u] == 0:
                continue
            ru = r[u]
            du = wsum[u]
            for dst, n in adj[u]:
                contrib[dst] += (ru * n) // du
        r = {w: base + (85 * contrib[w]) // 100 for w in words}

    out = pd.DataFrame({
        "word": words,
        "cnt": voc["cnt"].to_numpy(np.int64),
        "rank_int": np.asarray([r[w] for w in words], np.int64),
    })
    out = (out.sort_values(["rank_int", "word"], ascending=[False, True])
              .reset_index(drop=True))
    out.insert(0, "rnk", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


def adamic_adar_words(ds, v: int = 64, k: int = 20,
                      n_parts: int = 32) -> pd.DataFrame:
    """Adamic-Adar link prediction over the word co-occurrence graph:
    for vocab word pairs at distance 2 that never co-occur adjacently,
    score = sum over common neighbors y of ``1/ln(deg(y))`` with deg =
    distinct-neighbor count — "which words behave like collocates
    without ever touching". Same two streaming passes as
    textrank_keywords; the 64-node AA runs on the driver via the shared
    ``graph._aa_local`` fold (ids assigned in word-asc order, so the
    y-ascending float fold == the twin's ordered list_reduce). Returns
    top-k rows (word_a, word_b, n_common, aa_score) by
    (score desc, word_a asc, word_b asc)."""
    from sits_ray.stages.graph import _aa_local

    voc = top_vocab(ds, v=v, n_parts=n_parts)
    words = sorted(voc["token"].tolist())     # id order == word asc
    vset = set(words)
    wid = {w: i for i, w in enumerate(words)}
    ed = (ds.map_batches(_edge_partials_fn(vset),
                         batch_format="pandas").to_pandas()
            .groupby(["a", "b"], sort=True)["n"].sum().reset_index())
    if not ed.empty:
        # per-node top-m sparsification (the k-NN-graph rule): a small
        # vocab makes the raw co-occurrence graph complete, which has no
        # distance-2 pairs for AA to score. Keep the union of every
        # node's 10 strongest edges (ties by neighbor asc) — a
        # deterministic integer rule the twin replays with row_number.
        sym = pd.DataFrame({
            "src": np.concatenate([ed["a"].to_numpy(),
                                   ed["b"].to_numpy()]),
            "dst": np.concatenate([ed["b"].to_numpy(),
                                   ed["a"].to_numpy()]),
            "n": np.concatenate([ed["n"].to_numpy(np.int64)] * 2),
        })
        top = (sym.sort_values(["src", "n", "dst"],
                               ascending=[True, False, True])
                  .groupby("src", sort=False).head(10))
        lo = np.minimum(top["src"].to_numpy(), top["dst"].to_numpy())
        hi = np.maximum(top["src"].to_numpy(), top["dst"].to_numpy())
        ed = (pd.DataFrame({"a": lo, "b": hi})
                .drop_duplicates().sort_values(["a", "b"])
                .reset_index(drop=True))
    if ed.empty:
        return pd.DataFrame({"word_a": pd.Series([], dtype=str),
                             "word_b": pd.Series([], dtype=str),
                             "n_common": pd.Series([], dtype="int64"),
                             "aa_score": pd.Series([], dtype="float64")})
    a = np.asarray([wid[x] for x in ed["a"]], np.int64)
    b = np.asarray([wid[x] for x in ed["b"]], np.int64)
    out = _aa_local(a, b, k)
    out["word_a"] = [words[i] for i in out["doc_a"]]
    out["word_b"] = [words[i] for i in out["doc_b"]]
    return out[["word_a", "word_b", "n_common", "aa_score"]]
