"""BM25 retrieval over the document corpus — query-set top-k.

The LLM-curation sibling of the tf-idf salient-terms query: given a
BOUNDED literal query set (benchmark decontamination probes, eval-set
retrieval, targeted corpus audits), score every document with Lucene's
non-negative BM25 (``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
Robertson/Sparck-Jones weights as used by Lucene's BM25Similarity) and
return the top-k documents per query.

Scale shape (the repo's text discipline: the corpus never shuffles):

1. one ``map_batches`` pass tokenizes each batch and emits ONE WIDE ROW
   per matching document — ``(doc_id, dl, tf_<term>...)`` for the
   bounded query-term set — plus a per-batch sentinel stats row
   (``doc_id = -1``: batch doc count + token-length sum, so ``N`` and
   ``avgdl`` cover non-matching docs too). Output is
   O(matching docs x 1), materialized once (three consumers).
2. ``df``/``N``/``avgdl`` fold from tiny per-batch partials on the
   driver (terms x blocks rows).
3. a second stateless pass scores each (query, doc) with the broadcast
   idf table — the per-query fold runs in SORTED TERM ORDER with a
   strict sequential accumulate, matching DuckDB's
   ``list_reduce(list_prepend(0.0, list(s ORDER BY term)))`` fold
   bit-for-bit (zero-tf terms contribute IEEE +0.0, an exact identity).
4. top-k per query via mergeable per-batch partial top-k (score desc,
   doc_id asc) — candidates cross, never the corpus.

Float contract (CLAUDE.md): ``ln`` goes through ``math.log`` on the
driver-side vocab-sized idf table (libm == DuckDB ``ln``; ``np.log``
diverges on ~20% of inputs); every other term is int-derived doubles
with the SAME expression tree as the SQL twin.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[a-z]+"  # the corpus-wide shared tokenizer


def _match_rows(df: pd.DataFrame, terms: list[str]) -> pd.DataFrame:
    """Batch -> wide per-doc tf rows for ``terms`` + one sentinel row."""
    lists = df["text"].str.lower().str.findall(TOKEN_RE)
    dl = lists.str.len().to_numpy(dtype=np.int64)
    out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "dl": dl})
    ex = lists.explode().dropna()
    hit = ex[ex.isin(terms)]
    tf_wide = (
        pd.crosstab(hit.index, hit)
        if not hit.empty
        else pd.DataFrame(index=pd.Index([], dtype=np.int64))
    )
    for t in terms:
        if t in tf_wide.columns:
            out[f"tf_{t}"] = (
                tf_wide[t].reindex(out.index, fill_value=0).to_numpy(np.int64)
            )
        else:
            out[f"tf_{t}"] = np.zeros(len(out), dtype=np.int64)
    keep = out[[f"tf_{t}" for t in terms]].to_numpy().sum(axis=1) > 0
    matched = out.loc[keep]
    sentinel = pd.DataFrame(
        {"doc_id": [-1], "dl": [int(dl.sum())],
         **{f"tf_{t}": [0] for t in terms}}
    )
    sentinel.loc[0, f"tf_{terms[0]}"] = len(df)  # batch doc count rides tf0
    return pd.concat([matched, sentinel], ignore_index=True)


def _gather(ds, cols: list[str]) -> pd.DataFrame:
    """Driver gather of a BOUNDED partial Dataset, robust to the empty
    pandas blocks Ray passes through map_batches UNTOUCHED (original
    schema, CLAUDE.md block quirk): keep only non-empty blocks that
    carry the expected columns."""
    import ray

    frames = []
    for b in ray.get(list(ds.to_arrow_refs())):
        if not isinstance(b, pd.DataFrame):
            b = b.to_pandas()
        if len(b) and all(c in b.columns for c in cols):
            frames.append(b[cols])
    if not frames:
        return pd.DataFrame({c: pd.Series([], dtype=np.float64) for c in cols})
    return pd.concat(frames, ignore_index=True)


def bm25_topk(docs_ds, queries: dict[int, tuple[str, ...]], k: int = 10,
              k1: float = 1.2, b: float = 0.75):
    """Top-k docs per query by BM25. ``queries``: qid -> term tuple
    (bounded literal set). Returns a pandas frame
    (qid, doc_id, score) sorted (qid, score desc, doc_id)."""
    terms = sorted({t for q in queries.values() for t in q})
    if not terms:
        raise ValueError("empty query set")

    rows = docs_ds.map_batches(
        lambda d: _match_rows(d, terms), batch_format="pandas"
    ).materialize()

    # --- corpus stats from tiny partials (terms x blocks rows) -------------
    def stat_partial(d: pd.DataFrame) -> pd.DataFrame:
        if d.empty:  # Ray passes EMPTY pandas blocks through with the
            # ORIGINAL schema (no tf_ columns) — CLAUDE.md block quirk
            return pd.DataFrame(
                {"n_docs": pd.Series([], dtype=np.int64),
                 "sum_dl": pd.Series([], dtype=np.int64),
                 **{f"df_{t}": pd.Series([], dtype=np.int64) for t in terms}}
            )
        sent = d["doc_id"].to_numpy() == -1
        m = d.loc[~sent]
        return pd.DataFrame(
            {
                "n_docs": [int(d.loc[sent, f"tf_{terms[0]}"].sum())],
                "sum_dl": [int(d.loc[sent, "dl"].sum())],
                **{f"df_{t}": [int((m[f"tf_{t}"] > 0).sum())] for t in terms},
            }
        )

    st = _gather(
        rows.map_batches(stat_partial, batch_format="pandas"),
        ["n_docs", "sum_dl", *(f"df_{t}" for t in terms)],
    )
    if st.empty or int(st["n_docs"].sum()) == 0:
        raise ValueError("empty corpus")
    n, sdl = int(st["n_docs"].sum()), int(st["sum_dl"].sum())
    df_t = {t: int(st[f"df_{t}"].sum()) for t in terms}
    avgdl = sdl / n  # bigint/bigint -> double, same as the SQL twin
    idf = {
        t: math.log(1.0 + (float(n - df_t[t]) + 0.5) / (float(df_t[t]) + 0.5))
        for t in terms
    }

    # --- score + mergeable partial top-k per query --------------------------
    def score_partial(d: pd.DataFrame) -> pd.DataFrame:
        m = d.loc[d["doc_id"].to_numpy() != -1] if not d.empty else d
        if m.empty:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "score": pd.Series([], dtype=np.float64)}
            )
        dl = m["dl"].to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        outs = []
        for qid, qterms in queries.items():
            acc = np.zeros(len(m), dtype=np.float64)
            hit = np.zeros(len(m), dtype=bool)
            for t in sorted(qterms):  # the SQL fold's ORDER BY term
                tf = m[f"tf_{t}"].to_numpy(dtype=np.float64)
                acc = acc + idf[t] * ((tf * (k1 + 1.0)) / (tf + norm))
                hit |= tf > 0
            g = pd.DataFrame(
                {"qid": np.int64(qid), "doc_id": m["doc_id"].to_numpy()[hit],
                 "score": acc[hit]}
            )
            g = g.sort_values(["score", "doc_id"], ascending=[False, True])
            outs.append(g.head(k))  # per-batch partial top-k: mergeable
        return pd.concat(outs, ignore_index=True)

    cand = _gather(
        rows.map_batches(score_partial, batch_format="pandas"),
        ["qid", "doc_id", "score"],
    )
    out = (
        cand.sort_values(["qid", "score", "doc_id"],
                         ascending=[True, False, True])
        .groupby("qid", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out[["qid", "doc_id", "score"]]


# --- materialized inverted index (posting lists) -----------------------------

def index_build(docs_ds, index_dir: str, n_parts: int = 32,
                text_col: str = "text", id_col: str = "doc_id",
                fingerprint: dict | None = None) -> None:
    """Materialize the term inverted index ONCE: tokenize each batch,
    emit (term, doc_id, tf) posting rows with ``part = hash(term) %
    n_parts`` (the SAME seeded string hash as the engine partitioner,
    ``hashagg.part_of_values``), and write Parquet PARTITIONED BY PART so
    a term lookup reads only its partitions (the ivf_build discipline:
    staged build, one atomic rename, fingerprint-gated reuse —
    ``stages/similarity.py:187-205``)."""
    import os
    import shutil

    from sits_ray.stages.hashagg import part_of_values

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        lists = df[text_col].str.lower().str.findall(TOKEN_RE)
        ex = lists.explode().dropna()
        if ex.empty:
            return pd.DataFrame(
                {"term": pd.Series([], dtype=str),
                 id_col: pd.Series([], dtype=np.int64),
                 "tf": pd.Series([], dtype=np.int64),
                 "part": pd.Series([], dtype=np.int64)}
            )
        ids = df[id_col].loc[ex.index]
        g = (
            pd.DataFrame({"term": ex.to_numpy(), id_col: ids.to_numpy()})
            .groupby(["term", id_col], sort=False).size().reset_index()
        )
        g.columns = ["term", id_col, "tf"]
        g["part"] = part_of_values(g["term"].to_numpy(), n_parts)
        return g

    staging = index_dir.rstrip("/") + ".building"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    docs_ds.map_batches(postings, batch_format="pandas").write_parquet(
        os.path.join(staging, "postings"), partition_cols=["part"]
    )
    meta = {"n_parts": int(n_parts)}
    if fingerprint is not None:
        meta["fingerprint"] = fingerprint
    import json

    with open(os.path.join(staging, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(staging, index_dir)


def index_lookup(index_dir: str, terms, id_col: str = "doc_id"):
    """Posting lookup: hash the query terms to their partitions and read
    ONLY those partition directories (term-pruned at the read), then
    filter to the exact term set. Returns a Dataset of
    (term, doc_id, tf)."""
    import json
    import os

    import ray.data as rd

    from sits_ray.stages.hashagg import part_of_values

    with open(os.path.join(index_dir, "meta.json")) as fh:
        n_parts = json.load(fh)["n_parts"]
    terms = sorted(set(terms))
    parts = sorted(set(part_of_values(np.asarray(terms, dtype=object),
                                      n_parts).tolist()))
    import glob

    paths = [
        f
        for p in parts
        for f in sorted(
            glob.glob(os.path.join(index_dir, "postings", f"part={p}",
                                   "*.parquet"))
        )
    ]
    if not paths:
        return rd.from_items([]).limit(0)
    ds = rd.read_parquet(paths, columns=["term", id_col, "tf"])
    tset = pa.array(terms)

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=tset))

    return ds.map_batches(pick, batch_format="pyarrow")


def term_postings(docs_ds, terms, index_dir: str | None = None,
                  n_parts: int = 32, id_col: str = "doc_id"):
    """Build-or-reuse the inverted index, then term-pruned lookup
    (fingerprint-gated like ivf_topk: changed content at the same path
    rebuilds instead of serving stale postings)."""
    import json
    import os
    import tempfile

    from sits_ray.stages.similarity import dataset_id_fingerprint

    if index_dir is None:
        index_dir = os.path.join(tempfile.mkdtemp(prefix="terms_"), "index")
    fp = dataset_id_fingerprint(docs_ds, id_col)
    fp["n_parts"] = int(n_parts)
    meta_path = os.path.join(index_dir, "meta.json")
    reuse = False
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            reuse = json.load(fh).get("fingerprint") == fp
    if not reuse:
        index_build(docs_ds, index_dir, n_parts=n_parts, id_col=id_col,
                    fingerprint=fp)
    return index_lookup(index_dir, terms, id_col=id_col)


def dense_anchor_topk(emb_ds, anchor_ids, k: int = 20):
    """Dense-retrieval leg: for each anchor vector id, the top-``k`` OTHER
    vectors by exact int64 inner product under the shared quantization
    contract (similarity.quantize_i64: floor in DOUBLE — order-free dots,
    bit-exact vs the SQL twin's list_dot_product). Scale shape: the
    bounded anchor block broadcasts once (ray.put); each batch does ONE
    int64 matmul and ships its local per-anchor top-k. Returns a pandas
    frame (qid, doc_id, dot, rd) with rd = 1-based rank by (dot desc,
    id); the exact dot rides along for consumers that rank on margins
    rather than ranks (mmr_topk)."""
    import ray

    from sits_ray.arrowutil import list_matrix
    from sits_ray.stages.similarity import quantize_i64

    ids = sorted(int(a) for a in anchor_ids)
    anchors = emb_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], pa.array(ids))),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id")
    aq = quantize_i64(np.asarray(
        [np.asarray(v, np.float64) for v in anchors["embedding"]]
    ))
    a_ids = anchors["vec_id"].to_numpy(np.int64)
    a_ref = ray.put((a_ids, aq))

    def partial(t: pa.Table) -> pa.Table:
        aids, qm = ray.get(a_ref)
        m = quantize_i64(list_matrix(t["embedding"]))
        vid = t["vec_id"].to_numpy().astype(np.int64)
        dots = m @ qm.T if m.size else np.zeros((0, aids.size), np.int64)
        out_q, out_v, out_d = [], [], []
        for j in range(aids.size):
            keep = vid != aids[j]
            d, v = dots[keep, j], vid[keep]
            sel = np.lexsort((v, -d))[:k]
            out_q.append(np.full(sel.size, aids[j], np.int64))
            out_v.append(v[sel])
            out_d.append(d[sel])
        qs = np.concatenate(out_q) if out_q else np.array([], np.int64)
        vs = np.concatenate(out_v) if out_v else np.array([], np.int64)
        dd = np.concatenate(out_d) if out_d else np.array([], np.int64)
        return pa.table({"qid": pa.array(qs), "doc_id": pa.array(vs),
                         "dot": pa.array(dd)})

    parts = emb_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["qid", "dot", "doc_id"],
                              ascending=[True, False, True])
    top = parts.groupby("qid", sort=True).head(k).reset_index(drop=True)
    top["rd"] = top.groupby("qid").cumcount().to_numpy(np.int64) + 1
    return top[["qid", "doc_id", "dot", "rd"]]


def rrf_hybrid_topk(docs_ds, emb_ds, queries: dict[int, tuple[str, ...]],
                    k_leg: int = 20, k: int = 10, c: int = 60):
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) of the sparse
    (BM25) and dense (quantized-MIPS) retrieval legs — the standard hybrid
    retriever. Each leg contributes ``1/(c + rank)`` for its top-``k_leg``
    (missing leg = 0.0); the two terms are added in the pinned order
    sparse + dense, so the fused float is bit-exact cross-engine. The
    anchor embedding for query ``qid`` is vector ``vec_id == qid``
    (documents and embeddings share the id space). Returns the fused
    top-``k`` per query with both leg ranks (0 = not retrieved by that
    leg)."""
    sp = bm25_topk(docs_ds, queries, k=k_leg).copy()
    sp["rs"] = sp.groupby("qid").cumcount().to_numpy(np.int64) + 1
    dn = dense_anchor_topk(emb_ds, sorted(queries), k=k_leg)
    f = sp[["qid", "doc_id", "rs"]].merge(
        dn, on=["qid", "doc_id"], how="outer"
    )
    rs = f["rs"].to_numpy(np.float64)
    rd = f["rd"].to_numpy(np.float64)
    cc = float(c)
    spt = np.where(np.isnan(rs), 0.0, 1.0 / (cc + rs))
    dnt = np.where(np.isnan(rd), 0.0, 1.0 / (cc + rd))
    f["rrf_score"] = spt + dnt
    f["bm25_rank"] = np.nan_to_num(rs, nan=0.0).astype(np.int64)
    f["dense_rank"] = np.nan_to_num(rd, nan=0.0).astype(np.int64)
    f = f.sort_values(["qid", "rrf_score", "doc_id"],
                      ascending=[True, False, True])
    out = f.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["rnk"] = out.groupby("qid").cumcount().to_numpy(np.int64) + 1
    out["qid"] = out["qid"].astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["qid", "rnk", "doc_id", "rrf_score",
                "bm25_rank", "dense_rank"]]


def mmr_topk(emb_ds, anchor_ids, pool: int = 40, k: int = 10):
    """Maximal Marginal Relevance diversified retrieval (Carbonell &
    Goldstein, SIGIR 1998): greedy re-ranking of each anchor's
    ``pool``-candidate dense leg, picking at every step the candidate
    maximizing ``lambda*rel - (1-lambda)*max_sim_to_selected``. With
    ``lambda = 0.5`` the ranking is invariant under scaling by 2, so the
    selection runs ENTIRELY in exact int64 — ``score = rel_dot -
    max(pair_dot over selected)`` (empty max = 0, which only affects the
    first pick where every candidate shares it) — and the SQL twin
    replays the greedy walk verbatim (recursive CTE carrying the
    selected list).

    Scale shape: the candidate pools come from the broadcast-anchor
    one-matmul-per-batch dense leg (dense_anchor_topk); candidate
    vectors are gathered in one pruned filter pass (O(pools) rows); the
    greedy itself touches only the bounded pool table on the driver.
    Returns (qid, step, doc_id, rel_dot, mmr_score) for steps 1..k."""
    import ray  # noqa: F401  (parity with the module's leg imports)

    from sits_ray.stages.similarity import quantize_i64

    cand = dense_anchor_topk(emb_ds, anchor_ids, k=pool)
    cand_ids = sorted(set(cand["doc_id"].tolist()))
    vecs = emb_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], pa.array(cand_ids))),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id")
    q = quantize_i64(np.asarray(
        [np.asarray(v, np.float64) for v in vecs["embedding"]]))
    row_of = {int(v): i for i, v in enumerate(vecs["vec_id"])}
    out = []
    for qid, g in cand.groupby("qid", sort=True):
        ids = g["doc_id"].to_numpy(np.int64)
        rel = g["dot"].to_numpy(np.int64)
        m = q[[row_of[int(d)] for d in ids]]
        pair = m @ m.T  # int64 candidate-pair dots
        sel_mask = np.zeros(ids.size, dtype=bool)
        # true running max of pair dots to the selected set; the empty
        # set scores 0 (first pick ranks on rel alone) — a zero INIT
        # would wrongly clamp negative pair dots afterwards, so the
        # empty case is a separate branch, exactly like the SQL twin's
        # coalesce(max(...), 0) over a no-row aggregate
        maxsim = np.full(ids.size, np.iinfo(np.int64).min, dtype=np.int64)
        for step in range(1, min(k, ids.size) + 1):
            eff = maxsim if step > 1 else np.zeros(ids.size, np.int64)
            score = rel - eff
            # mask AFTER negation: -int64.min overflows back to itself
            # and would sort a selected row first
            neg = np.where(sel_mask, np.iinfo(np.int64).max, -score)
            pick = int(np.lexsort((ids, neg))[0])
            out.append((int(qid), step, int(ids[pick]), int(rel[pick]),
                        int(score[pick])))
            sel_mask[pick] = True
            maxsim = np.maximum(maxsim, pair[:, pick])
    return pd.DataFrame(out, columns=["qid", "step", "doc_id",
                                      "rel_dot", "mmr_score"]).astype(
        {"qid": np.int64, "step": np.int64, "doc_id": np.int64,
         "rel_dot": np.int64, "mmr_score": np.int64})


def rbo_type_rankings(events_ds, p: float = 0.9,
                      ts_col: str = "ts",
                      type_col: str = "event_type") -> pd.DataFrame:
    """Rank-Biased Overlap (Webber, Moffat & Zobel 2010) between the
    event-type volume rankings of the two time halves — "did the traffic
    mix reorder?", the ranking-level drift monitor next to the
    distributional ones (psi/js/ks compare masses; RBO compares the
    leaderboard itself, top-weighted by persistence p).

    Truncated prefix form: ``rbo = (1-p) * sum_(d=1..D) p^(d-1) *
    X_d/d`` with X_d = overlap of the two depth-d prefixes and
    D = min(len A, len B). Parity contract: rankings order by
    (count desc, type asc) — total; X_d and d are exact ints; p powers
    build by SEQUENTIAL multiplication (never libm pow) and the sum
    folds d-ascending; every term is ``pw * (X_d/d)`` — the identical
    tree in the twin's ordered list_reduce. One (type, half) census
    (integer-midpoint split, the welch convention), bounded driver walk.
    Returns one row: (depth, overlap_at_depth, rbo)."""
    import pyarrow.compute as pc

    def span_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        if us.size == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(us.min())]),
                         "hi": pa.array([int(us.max())])})

    span = events_ds.map_batches(span_partial,
                                 batch_format="pyarrow").to_pandas()
    mid = (int(span["lo"].min()) + int(span["hi"].max())) // 2

    def census(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"t": t[type_col].to_numpy(
                zero_copy_only=False),
                "a": (us <= mid).astype(np.int64),
                "b": (us > mid).astype(np.int64)})
             .groupby("t", sort=False)[["a", "b"]].sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    c = (events_ds.map_batches(census, batch_format="pyarrow").to_pandas()
           .groupby("t", sort=True)[["a", "b"]].sum().reset_index())
    ra = (c[c["a"] > 0].sort_values(["a", "t"], ascending=[False, True])
          ["t"].tolist())
    rb = (c[c["b"] > 0].sort_values(["b", "t"], ascending=[False, True])
          ["t"].tolist())
    depth = min(len(ra), len(rb))
    acc = 0.0
    pw = 1.0
    xd = 0
    sa: set = set()
    sb: set = set()
    for d in range(1, depth + 1):
        sa.add(ra[d - 1])
        sb.add(rb[d - 1])
        xd = len(sa & sb)
        acc = acc + pw * (float(xd) / float(d))
        pw = pw * p
    return pd.DataFrame([{
        "depth": np.int64(depth),
        "overlap_at_depth": np.int64(xd),
        "rbo": (1.0 - p) * acc,
    }])


def phrase_search_topk(docs_ds, phrases: dict[int, tuple[str, ...]],
                       k: int = 10, text_col: str = "text",
                       id_col: str = "doc_id") -> pd.DataFrame:
    """Exact multi-word PHRASE search: top-``k`` docs per phrase by
    adjacent-token occurrence count — the positional complement of
    :func:`bm25_topk` (bag-of-words) and the standard decontamination /
    quotation-mining primitive ("find documents containing this exact
    sequence"). Reference analog: the sits workflow's exact
    time-pattern matching (`sits_get_data` exact lookups) applied to
    token positions.

    Scale shape: ONE stateless map_batches pass — per batch the token
    stream flattens once (doc boundaries masked, the collocations
    window trick) and each phrase is a vectorized L-way shifted
    equality AND over the flat array; a doc lives wholly in its row,
    so per-(phrase, doc) counts FINISH inside the batch and a
    per-batch top-k partial is a provable superset of the global
    top-k. The driver merges O(phrases x blocks x k) rows. Counts are
    integers; the total order (n_hits desc, doc_id asc) makes the cut
    deterministic. Returns (phrase_id, doc_id, n_hits) sorted
    (phrase_id, n_hits desc, doc_id)."""
    if not phrases:
        raise ValueError("empty phrase set")
    for pid, terms in phrases.items():
        if len(terms) < 1:
            raise ValueError(f"phrase {pid} is empty")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"phrase_id": [], "doc_id": [], "n_hits": []}
        toks = df[text_col].str.lower().str.findall(r"\w+")
        ex = toks.explode().dropna()
        out = {c: np.asarray([], dtype=np.int64) for c in cols}
        if ex.empty:
            return pd.DataFrame(out)
        flat = ex.to_numpy(dtype=object)
        doc_pos = pd.Index(df.index).get_indexer(ex.index)
        ids = df[id_col].to_numpy()
        n = flat.size
        frames = []
        for pid, terms in phrases.items():
            L = len(terms)
            if n < L:
                continue
            m = flat[: n - L + 1] == terms[0]
            for j in range(1, L):
                m &= flat[j: n - L + 1 + j] == terms[j]
            # a window is a real phrase hit iff it ends inside the doc
            # it starts in (the MinHashStage window-validity rule)
            m &= doc_pos[: n - L + 1] == doc_pos[L - 1:]
            hit_docs = doc_pos[: n - L + 1][m]
            if hit_docs.size == 0:
                continue
            cnt = np.bincount(hit_docs, minlength=len(df))
            nz = np.flatnonzero(cnt)
            part = pd.DataFrame({
                "phrase_id": np.full(nz.size, pid, dtype=np.int64),
                "doc_id": ids[nz].astype(np.int64),
                "n_hits": cnt[nz].astype(np.int64),
            })
            # per-batch top-k partial: counts are final (doc = one row)
            part = part.sort_values(
                ["n_hits", "doc_id"], ascending=[False, True]
            ).head(k)
            frames.append(part)
        if not frames:
            return pd.DataFrame(out)
        return pd.concat(frames, ignore_index=True)

    merged = _gather(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["phrase_id", "doc_id", "n_hits"],
    )
    if merged.empty:
        return pd.DataFrame({
            "phrase_id": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "n_hits": pd.Series([], dtype=np.int64),
        })
    out = (merged.sort_values(["phrase_id", "n_hits", "doc_id"],
                              ascending=[True, False, True])
                 .groupby("phrase_id", sort=True).head(k)
                 .reset_index(drop=True))
    out["phrase_id"] = out["phrase_id"].astype(np.int64)
    return out
