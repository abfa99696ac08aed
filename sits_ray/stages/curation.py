"""Corpus-curation operators beyond the near-dup family: chunk-level
boilerplate removal (CCNet-style), Bloom-filter decontamination, and
MOSS winnowing fingerprints.

All three follow the repo's scale disciplines: document text NEVER
crosses a shuffle (only thin integer rows move), high-cardinality keys
route through ``stages/hashagg.part_aggregate`` (the measured
``Dataset.groupby`` ~10k rows/s pathology), small sides broadcast once
via ``ray.put``, and every float column is a single int/int division so
the DuckDB twins are bit-exact.

* ``boilerplate_chunks`` — CCNet line-level dedup (Wenzek et al. 2020)
  adapted to newline-free corpora: the record unit is the NON-overlapping
  ``w``-token chunk (the sliding-window variant is ``dedup.dup_passages``);
  chunks occurring in >= ``min_docs`` distinct documents are boilerplate,
  and per-document retention stats (kept chars, boiler fraction) are the
  removal outcome.
* ``bloom_decontaminate`` — benchmark decontamination with a BOUNDED
  broadcast: the benchmark side is folded into an ``m``-bit Bloom filter
  via per-batch OR partials (fixed ``m/8`` bytes per partial and for the
  one broadcast, regardless of benchmark size — ``queries.
  decontaminate_overlap`` broadcasts the raw n-gram set, which grows with
  the benchmark). False positives are part of the operator's contract and
  the SQL twin replays them exactly (same affine bit positions, same
  shared bit set).
* ``winnow_fingerprints`` — the MOSS winnowing selection (Schleimer,
  Wilkerson & Aiken, SIGMOD 2003): per document, the rightmost-minimal
  k-gram hash of every ``w``-window of consecutive positions; the
  classic guarantee-bearing fingerprint set (any shared run of
  ``w + k - 1`` tokens shares a fingerprint). Selection is one packed
  int64 sliding minimum, so the SQL twin is a plain window ``min``.

Reference parity: the reference engine has no corpus-curation surface
(R/sits.package? none) — these are the brief's first-class training-data
ops; family siblings live in ``stages/dedup.py`` (``dup_passages``,
``charshingle_dedup``) and ``queries.decontaminate_overlap``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from sits_ray.kernels.text import fingerprint_batch, token_window_hashes

_P = (1 << 31) - 1  # Mersenne-31: every Horner product fits int64
_BASE1 = 1_000_003  # the doc_fingerprints base (gate-pinned)
_BASE2 = 999_983  # independent second base -> 62-bit composite chunk keys

# --- CCNet-style chunk-level boilerplate removal ----------------------------


def _chunk_rows(df: pd.DataFrame, w: int) -> pd.DataFrame:
    """Per-batch (doc_id, chunk-key, occ, chars) rows for every FULL
    non-overlapping ``w``-token chunk. Chunk key = two independent Horner
    folds over the chunk's token hashes packed into one int64 (collision
    odds ~ C^2 / 2^62 for C distinct chunks — the CCNet trade: hashes
    shuffle, text does not). ``chars`` equals ``length(' '.join(tokens))``
    so the SQL twin's ``length(chunk)`` matches exactly."""
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "key": pd.Series([], dtype="int64"),
            "occ": pd.Series([], dtype="int64"),
            "chars": pd.Series([], dtype="int64"),
        }
    )
    if not len(df):
        return empty
    toks = df["text"].str.lower().str.findall(r"[a-z]+")
    lens = toks.str.len().to_numpy(dtype=np.int64)
    nch = lens // w
    total = int(nch.sum())
    if total == 0:
        return empty
    ex = toks.explode().dropna()
    flat = ex.to_numpy(dtype=object)
    tok_chars = ex.str.len().to_numpy(dtype=np.int64)
    uniq, inv = np.unique(flat, return_inverse=True)
    h1 = fingerprint_batch(list(uniq), base=_BASE1, mod=_P)[inv]
    h2 = fingerprint_batch(list(uniq), base=_BASE2, mod=_P)[inv]
    offs = np.concatenate([[0], np.cumsum(lens)])
    doc_rep = np.repeat(np.arange(len(df), dtype=np.int64), nch)
    cidx = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(nch) - nch, nch
    )
    starts = offs[doc_rep] + cidx * w
    acc1 = np.zeros(total, dtype=np.int64)
    acc2 = np.zeros(total, dtype=np.int64)
    for j in range(w):
        acc1 = (acc1 * _BASE1 + h1[starts + j]) % _P
        acc2 = (acc2 * _BASE2 + h2[starts + j]) % _P
    key = acc1 * _P + acc2
    cum = np.concatenate([[0], np.cumsum(tok_chars)])
    chars = cum[starts + w] - cum[starts] + (w - 1)
    rows = pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64)[doc_rep],
            "key": key,
            "chars": chars,
        }
    )
    out = (
        rows.groupby(["doc_id", "key"], sort=False)
        .agg(occ=("chars", "size"), chars=("chars", "first"))
        .reset_index()
    )
    return out[["doc_id", "key", "occ", "chars"]].astype("int64")


def boilerplate_chunks(ds, w: int = 10, min_docs: int = 2, n_parts: int = 32):
    """CCNet-style boilerplate removal stats over non-overlapping
    ``w``-token chunks: a chunk present in >= ``min_docs`` distinct
    documents is boilerplate; every occurrence of it is removed.

    Returns one row per document owning at least one full chunk:
    ``(doc_id, n_chunks, n_boiler, kept_chars, boiler_frac)`` with
    ``kept_chars`` the characters surviving removal and ``boiler_frac``
    a single int/int division (bit-exact vs SQL).

    Scale shape: text tokenizes and hashes inside ``map_batches``; only
    (doc_id, key, occ, chars) int64 rows cross the chunk-key exchange;
    chunk-key cardinality is corpus-sized so both aggregates route
    through ``part_aggregate`` (splitmix-mixed int partitioning)."""
    from sits_ray.stages.hashagg import part_aggregate

    def boiler_partials(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_chunks": pd.Series([], dtype="int64"),
                    "n_boiler": pd.Series([], dtype="int64"),
                    "kept_chars": pd.Series([], dtype="int64"),
                }
            )
        # one row per (doc, key) -> rows-per-key == distinct docs owning it
        nd = gdf.groupby("key", sort=False)["doc_id"].transform("size")
        boiler = (nd >= min_docs).to_numpy()
        occ = gdf["occ"].to_numpy(dtype=np.int64)
        chars = gdf["chars"].to_numpy(dtype=np.int64)
        tmp = pd.DataFrame(
            {
                "doc_id": gdf["doc_id"].to_numpy(dtype=np.int64),
                "n_chunks": occ,
                "n_boiler": np.where(boiler, occ, 0),
                "kept_chars": np.where(boiler, 0, occ * chars),
            }
        )
        return tmp.groupby("doc_id", as_index=False, sort=False).sum()

    partials = part_aggregate(
        ds.map_batches(lambda d: _chunk_rows(d, w), batch_format="pandas"),
        boiler_partials,
        key_col="key",
        n_parts=n_parts,
    )

    def sum_doc(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return gdf
        return gdf.groupby("doc_id", as_index=False, sort=False).sum()

    def finish(gdf: pd.DataFrame) -> pd.DataFrame:
        g = sum_doc(gdf)
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_chunks": pd.Series([], dtype="int64"),
                    "n_boiler": pd.Series([], dtype="int64"),
                    "kept_chars": pd.Series([], dtype="int64"),
                    "boiler_frac": pd.Series([], dtype="float64"),
                }
            )
        g["boiler_frac"] = g["n_boiler"].to_numpy(dtype=np.int64) / g[
            "n_chunks"
        ].to_numpy(dtype=np.int64)
        return g

    return part_aggregate(partials, finish, key_col="doc_id", n_parts=16)


# --- Bloom-filter benchmark decontamination ---------------------------------


def bloom_constants(k: int = 3, seed: int = 29):
    """Deterministic affine position-hash constants, shared verbatim by
    the engine and the generated SQL oracle (literal values)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P, size=k, dtype=np.int64)
    b = rng.integers(0, _P, size=k, dtype=np.int64)
    return a, b


def _bloom_positions(h: np.ndarray, a, b, m_bits: int) -> np.ndarray:
    """(k, n) bit positions: ``((a_j * h + b_j) mod P) mod m``. Products
    stay < 2^62 (a_j, h < 2^31), so int64 arithmetic is exact — the SQL
    twin runs the identical expressions in BIGINT."""
    return ((a[:, None] * h[None, :] + b[:, None]) % _P) % m_bits


def bloom_decontaminate(
    ds,
    bench_mod: int = 20,
    w: int = 3,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: int = 29,
):
    """Benchmark decontamination through an ``m``-bit Bloom filter over
    token ``w``-gram hashes (``kernels/text.token_window_hashes`` — the
    gate-pinned dup_passages recurrence). Documents with
    ``doc_id % bench_mod == 0`` form the benchmark; every other document
    reports how many of its distinct gram hashes hit the filter.

    Output: ``(doc_id, n_bloom_hits, flagged)`` for every non-benchmark
    document. Hits INCLUDE Bloom false positives — that is the operator's
    honest contract, and the SQL twin reproduces them exactly (same
    affine positions probed against the same shared position set).

    Scale shape: the benchmark side never materializes — each map task
    ORs its grams into a local ``m/64``-word array and emits that one
    fixed-size partial (m_bits = 2^20 -> 128 KiB); the driver ORs the
    partials and broadcasts the array once via ``ray.put``. Probe is one
    stateless pass; text never shuffles, nothing scales with benchmark
    size."""
    a, b = bloom_constants(k, seed)
    nwords = m_bits // 64

    def build_partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"].to_numpy() % bench_mod == 0]
        words = np.zeros(nwords, dtype=np.uint64)
        if len(sub):
            _, wh = token_window_hashes(
                sub["text"].reset_index(drop=True), w=w
            )
            if len(wh):
                pos = _bloom_positions(np.unique(wh), a, b, m_bits).ravel()
                np.bitwise_or.at(
                    words,
                    pos >> 6,
                    np.uint64(1) << (pos & 63).astype(np.uint64),
                )
        return pd.DataFrame({"words": [words.tobytes()]})

    parts = ds.map_batches(build_partial, batch_format="pandas").to_pandas()
    filt = np.zeros(nwords, dtype=np.uint64)
    for buf in parts["words"]:
        filt |= np.frombuffer(buf, dtype=np.uint64)
    filt_ref = ray.put(filt)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"].to_numpy() % bench_mod != 0]
        doc_ids = sub["doc_id"].to_numpy(dtype=np.int64)
        hits = np.zeros(len(sub), dtype=np.int64)
        if len(sub):
            di, wh = token_window_hashes(
                sub["text"].reset_index(drop=True), w=w
            )
            if len(wh):
                # distinct gram hashes per document
                order = np.lexsort((wh, di))
                di, wh = di[order], wh[order]
                first = np.ones(len(wh), dtype=bool)
                first[1:] = (di[1:] != di[:-1]) | (wh[1:] != wh[:-1])
                di, wh = di[first], wh[first]
                f = ray.get(filt_ref)
                pos = _bloom_positions(wh, a, b, m_bits)
                ok = np.ones(len(wh), dtype=bool)
                for j in range(k):
                    pj = pos[j]
                    sh = (pj & 63).astype(np.uint64)
                    ok &= ((f[pj >> 6] >> sh) & np.uint64(1)) != 0
                np.add.at(hits, di[ok], 1)
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_bloom_hits": hits,
                "flagged": hits > 0,
            }
        )

    return ds.map_batches(probe, batch_format="pandas")


# --- MOSS winnowing fingerprints --------------------------------------------

_POS_BITS = 21  # supports docs up to 2^21 - 1 k-gram positions
_POS_MASK = (1 << _POS_BITS) - 1


def winnow_scalar(tokens, k: int = 4, w: int = 5):
    """Textbook scalar winnowing twin (tests pin parity with the stage):
    per window of ``w`` consecutive k-gram hashes select the RIGHTMOST
    minimal hash; fingerprints are the distinct selected positions."""
    from sits_ray.kernels.text import window_hash_scalar

    hs = window_hash_scalar(tokens, w=k)
    sel = set()
    for i in range(max(len(hs) - w + 1, 0)):
        best = i
        for j in range(i, i + w):
            if hs[j] <= hs[best]:
                best = j  # <= keeps the rightmost minimum
        sel.add((best, hs[best]))
    return sorted(sel)


def winnow_fingerprints(ds, k: int = 4, w: int = 5):
    """MOSS winnowing fingerprint selection (Schleimer et al. 2003): for
    every document, hash its token k-grams (the gate-pinned Horner
    recurrence), then from each window of ``w`` consecutive positions
    keep the rightmost minimal hash. Guarantee: any token run of length
    ``w + k - 1`` shared by two documents yields a shared fingerprint.

    Selection is vectorized with NO per-document Python: packed key
    ``hash * 2^21 + (2^21 - 1 - pos)`` makes (min hash, rightmost pos)
    lexicographic a plain integer minimum (< 2^52, int64-exact), the
    sliding minimum is ``w`` shifted np.minimum passes over the batch's
    flat position array, and windows crossing document boundaries are
    masked. The SQL twin is the same packed key under a window ``min``
    (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING) — bit-for-bit.

    Output: one row per selected fingerprint, ``(doc_id, pos, fp)`` with
    ``pos`` the 0-based k-gram position. Stateless ``map_batches``; no
    shuffle at any point."""

    def select(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "fp": pd.Series([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        di, wh = token_window_hashes(df["text"].reset_index(drop=True), w=k)
        n = len(wh)
        if n < w:
            return empty
        nwin = np.bincount(di, minlength=len(df)).astype(np.int64)
        if nwin.max() > _POS_MASK:
            raise ValueError(
                f"winnow_fingerprints: document with {int(nwin.max())} k-gram "
                f"positions exceeds the 2^{_POS_BITS}-1 packed-position bound"
            )
        pos = np.arange(n, dtype=np.int64) - np.repeat(
            np.cumsum(nwin) - nwin, nwin
        )
        key = (wh << _POS_BITS) + (_POS_MASK - pos)
        L = n - w + 1
        acc = key[:L].copy()
        for j in range(1, w):
            np.minimum(acc, key[j : j + L], out=acc)
        valid = di[:L] == di[w - 1 :]
        sel_key = acc[valid]
        sel_doc = di[:L][valid]
        # distinct (doc, key): key encodes (hash, pos) uniquely per doc
        order = np.lexsort((sel_key, sel_doc))
        sel_doc, sel_key = sel_doc[order], sel_key[order]
        keep = np.ones(len(sel_key), dtype=bool)
        keep[1:] = (sel_doc[1:] != sel_doc[:-1]) | (
            sel_key[1:] != sel_key[:-1]
        )
        sel_doc, sel_key = sel_doc[keep], sel_key[keep]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64)[sel_doc],
                "pos": _POS_MASK - (sel_key & _POS_MASK),
                "fp": sel_key >> _POS_BITS,
            }
        )

    return ds.map_batches(select, batch_format="pandas")


# --- blocklist phrase filtering ---------------------------------------------

def blocklist_hits(ds, phrases: tuple[str, ...],
                   text_col: str = "text", id_col: str = "doc_id"):
    """Multi-phrase blocklist filter (the wordlist/phrase-list content
    filter of LLM curation stacks, e.g. C4's badlist pass — Raffel et
    al. 2020 §2.2): per document, the non-overlapping occurrence count
    of every blocklist PHRASE (substring, case-insensitive — phrases may
    span token boundaries, which token-level filters miss) plus the
    composite keep flag (zero hits).

    Stateless vectorized map: one compiled-regex ``str.count`` per
    phrase (pandas C kernels; the phrase list is bounded by design), no
    shuffle, no state. Counts are integers, so the DuckDB twin — the
    ``(length(t) - length(replace(t, p, ''))) // length(p)`` identity —
    is exact (both sides count non-overlapping occurrences
    left-to-right)."""
    import re

    if not phrases:
        raise ValueError("empty blocklist")
    pats = [re.compile(re.escape(p.lower())) for p in phrases]

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        low = df[text_col].str.lower()
        out = pd.DataFrame({id_col: df[id_col].to_numpy()})
        total = np.zeros(len(df), dtype=np.int64)
        for i, pat in enumerate(pats):
            c = low.str.count(pat).to_numpy(dtype=np.int64)
            out[f"hits_{i}"] = c
            total += c
        out["n_hits"] = total
        out["keep"] = total == 0
        return out

    return ds.map_batches(hits, batch_format="pandas")


# --- DSIR-style importance weights -------------------------------------------


def dsir_scores(ds, target_lang: str = "en", n_buckets: int = 128):
    """Data Selection via Importance Resampling (DSIR, Xie et al.,
    NeurIPS 2023) over hashed word-unigram features: per document the
    log importance weight

        log w(doc) = sum_b  c_doc[b] * (ln p_target[b] - ln p_raw[b])

    where buckets are the gate-pinned Horner word hash mod ``n_buckets``,
    the target distribution is the ``target_lang`` slice of the corpus,
    the raw distribution is everything else, and both are add-one
    smoothed. High-weight documents "look like" the target distribution
    — the standard pre-training data-selection score.

    Scale shape: pass 1 emits O(n_buckets) integer count partials per
    batch (the bucket table crossing the wire is ~2 KB no matter the
    corpus); the driver folds them and takes 2*n_buckets libm logs
    (``math.log`` — np.log's SIMD path diverges from DuckDB ``ln``);
    pass 2 streams the corpus once more with the tiny lambda vector
    captured in the batch fn. Text never shuffles.

    Exactness: counts are order-free int64; lambda is ln of one exact
    int/int double division per side (explicit float() casts mirror the
    twin's cast-to-double-then-divide); per-doc scores accumulate in
    ascending bucket order — the engine adds all ``n_buckets`` terms
    while the twin folds only the document's non-zero buckets, which is
    IEEE-identical because a zero count contributes ``+-0.0`` and the
    running sum is never ``-0.0`` (it starts at +0.0 and x + (-x) = +0.0
    in round-to-nearest). Zero-word documents are omitted on both sides."""
    import math

    def _word_buckets(df: pd.DataFrame):
        ex = df["text"].str.lower().str.findall(r"[a-z]+").explode().dropna()
        doc_of = pd.Index(df.index).get_indexer(ex.index)
        if not len(ex):
            return doc_of, np.zeros(0, dtype=np.int64)
        return doc_of, fingerprint_batch(ex.tolist()) % n_buckets

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doc_of, b = _word_buckets(df)
        is_tgt = (df["lang"].to_numpy() == target_lang)[doc_of]
        return pd.DataFrame(
            {
                "b": np.arange(n_buckets, dtype=np.int64),
                "ct": np.bincount(b[is_tgt], minlength=n_buckets),
                "cs": np.bincount(b[~is_tgt], minlength=n_buckets),
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("b", sort=True)[["ct", "cs"]].sum()
    ct = agg["ct"].to_numpy(np.int64)
    cs = agg["cs"].to_numpy(np.int64)
    T, S = int(ct.sum()), int(cs.sum())
    lam = np.array(
        [
            math.log(float(int(ct[b]) + 1) / float(T + n_buckets))
            - math.log(float(int(cs[b]) + 1) / float(S + n_buckets))
            for b in range(n_buckets)
        ],
        dtype=np.float64,
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        doc_of, b = _word_buckets(df)
        C = np.bincount(
            doc_of * n_buckets + b, minlength=len(df) * n_buckets
        ).reshape(len(df), n_buckets).astype(np.int64)
        s = np.zeros(len(df), dtype=np.float64)
        for k in range(n_buckets):  # ascending bucket order == the twin's fold
            s += C[:, k] * lam[k]
        n_words = C.sum(axis=1)
        keep = n_words > 0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[keep],
                "n_words": n_words[keep],
                "dsir_logw": s[keep],
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def k_anonymity(ds, k_values=(2, 5, 10), bucket: int = 100) -> pd.DataFrame:
    """k-anonymity audit over the document metadata (Sweeney 2002): can
    a record be singled out by its quasi-identifiers alone? The QI tuple
    is ``(lang, source, n_chars // bucket)`` — the release-shaped
    attributes a scraped-corpus card would publish. For each k the audit
    reports how many equivalence classes are smaller than k and how many
    records sit in them (those records are re-identifiable at that k).

    Scale shape: per-batch (lang, source, size-bucket) count partials
    fold to the bounded driver-side class table (|langs| x |sources| x
    |buckets| rows — independent of corpus size); the corpus never
    shuffles and text never leaves the read. All counts are int64;
    ``risk_frac`` is the one bigint/bigint double division, so the SQL
    twin is bit-exact.

    Returns one row per k: (k, n_classes, n_risky_classes,
    n_risky_records, risk_frac)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "source": t["source"].to_numpy(zero_copy_only=False),
            "b": t["n_chars"].to_numpy(zero_copy_only=False) // bucket,
        })
        g = df.groupby(["lang", "source", "b"], sort=False).size()
        gi = g.index.to_frame(index=False)
        return pa.table({"lang": pa.array(gi["lang"]),
                         "source": pa.array(gi["source"]),
                         "b": pa.array(gi["b"].to_numpy(np.int64)),
                         "cnt": pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby(["lang", "source", "b"], sort=True)["cnt"].sum()
           .reset_index())
    total = int(c["cnt"].sum())
    sizes = c["cnt"].to_numpy(np.int64)
    rows = []
    for k in k_values:
        risky = sizes < k
        rows.append({
            "k": np.int64(k),
            "n_classes": np.int64(len(sizes)),
            "n_risky_classes": np.int64(int(risky.sum())),
            "n_risky_records": np.int64(int(sizes[risky].sum())),
            "risk_frac": int(sizes[risky].sum()) / total,
        })
    return pd.DataFrame(rows)


def l_diversity(ds, l_values=(2, 3, 5), bucket: int = 100) -> pd.DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the sequel to
    ``k_anonymity``: a class can be large (k-anonymous) yet still leak
    if every record in it shares the same SENSITIVE value. QI tuple =
    ``(lang, n_chars // bucket)``; sensitive attribute = ``source``.
    For each l the audit counts classes with fewer than l distinct
    sensitive values and the records inside them.

    Same scale shape as k_anonymity: per-batch (lang, bucket, source)
    count partials fold to a bounded driver table; the corpus never
    shuffles. All integers; ``risk_frac`` is the one bigint/bigint
    double division. Returns one row per l: (l, n_classes,
    n_risky_classes, n_risky_records, risk_frac)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "b": t["n_chars"].to_numpy(zero_copy_only=False) // bucket,
            "source": t["source"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["lang", "b", "source"], sort=False).size()
        gi = g.index.to_frame(index=False)
        return pa.table({"lang": pa.array(gi["lang"]),
                         "b": pa.array(gi["b"].to_numpy(np.int64)),
                         "source": pa.array(gi["source"]),
                         "cnt": pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby(["lang", "b", "source"], sort=True)["cnt"].sum()
           .reset_index())
    cls = (c.groupby(["lang", "b"], sort=True)
             .agg(l=("source", "nunique"), n=("cnt", "sum"))
             .reset_index())
    total = int(cls["n"].sum())
    ls = cls["l"].to_numpy(np.int64)
    ns = cls["n"].to_numpy(np.int64)
    rows = []
    for lv in l_values:
        risky = ls < lv
        rows.append({
            "l": np.int64(lv),
            "n_classes": np.int64(len(cls)),
            "n_risky_classes": np.int64(int(risky.sum())),
            "n_risky_records": np.int64(int(ns[risky].sum())),
            "risk_frac": int(ns[risky].sum()) / total,
        })
    return pd.DataFrame(rows)


def t_closeness(ds, bucket: int = 100) -> pd.DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007): per
    QI class ``(lang, source)``, the Earth Mover's Distance between the
    class's distribution of the ORDERED sensitive attribute
    (``n_chars // bucket``) and the corpus-global distribution. For a
    1-D ordered domain with unit adjacent ground distance,
    ``EMD = (1/(m-1)) * sum_k |cumP_k - cumQ_k|`` over the global
    bucket grid (zero-filled for buckets the class misses).

    Integer-exact core: with T = corpus size, n = class size,
    cum class counts cc_k and cum global counts cg_k,
    ``D = sum_{k<m} |cc_k*T - cg_k*n|`` is an exact integer and
    ``emd = D / (n*T*(m-1))`` is ONE double division of exactly-cast
    integers — the SQL twin replays it bit-for-bit. Bounded census,
    zero shuffle. Returns one row per class ordered by emd desc then
    (lang, source): (lang, source, n_recs, emd)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "source": t["source"].to_numpy(zero_copy_only=False),
            "b": t["n_chars"].to_numpy(zero_copy_only=False) // bucket,
        })
        g = df.groupby(["lang", "source", "b"], sort=False).size()
        gi = g.index.to_frame(index=False)
        return pa.table({"lang": pa.array(gi["lang"]),
                         "source": pa.array(gi["source"]),
                         "b": pa.array(gi["b"].to_numpy(np.int64)),
                         "cnt": pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby(["lang", "source", "b"], sort=True)["cnt"].sum()
           .reset_index())
    buckets = np.sort(c["b"].unique())
    m = len(buckets)
    gcum = (c.groupby("b", sort=True)["cnt"].sum()
             .reindex(buckets, fill_value=0).cumsum().to_numpy())
    T = int(c["cnt"].sum())
    rows = []
    for (lang, source), sub in c.groupby(["lang", "source"], sort=True):
        cc = (sub.set_index("b")["cnt"].reindex(buckets, fill_value=0)
                 .cumsum().to_numpy())
        n = int(sub["cnt"].sum())
        if m < 2:
            rows.append({"lang": lang, "source": source,
                         "n_recs": np.int64(n), "emd": 0.0})
            continue
        d = sum(abs(int(cc[k]) * T - int(gcum[k]) * n)
                for k in range(m - 1))
        rows.append({"lang": lang, "source": source,
                     "n_recs": np.int64(n),
                     "emd": float(d) / float(n * T * (m - 1))})
    out = pd.DataFrame(rows)
    return (out.sort_values(["emd", "lang", "source"],
                            ascending=[False, True, True])
               .reset_index(drop=True))
