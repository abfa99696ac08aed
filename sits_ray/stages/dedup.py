"""Deduplication stages for the training-data pipeline.

* exact dedup: content-hash -> ``groupby(hash).first`` (the reference's
  groupby-first dedup shape, ``R/api_data.R:215-223``);
* near-dup MinHash + LSH: shingle -> minhash signature -> band buckets ->
  ``groupby(band_id, band_hash)`` -> candidate pairs -> Jaccard verify
  (Broder 1997; the guide's shingle/band/bucket pattern);
* SimHash: 64-bit hyperplane-free charhash aggregate; near-dups =
  signatures within a Hamming radius, bucketed by 4 x 16-bit chunks;
* n-gram Jaccard verification kernel shared by both.

Stateful pieces (hash seeds, shingle regex) live in callable-class actor
stages (``__init__`` once per actor).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD = re.compile(r"\w+")

_MERSENNE = (1 << 61) - 1


def shingles(text: str, k: int = 3) -> set[str]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


class MinHasher:
    """Deterministic 64-bit minhash signatures (seeded affine hashes)."""

    def __init__(self, n_perm: int = 64, k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.k = k
        self.n_perm = n_perm

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k)
        if not sh:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.array(
            [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
             for s in sh],
            dtype=np.uint64,
        )
        # (a*x + b) mod p for every (perm, shingle); min over shingles
        x = base[None, :]
        with np.errstate(over="ignore"):
            h = (self.a[:, None] * x + self.b[:, None]) % np.uint64(_MERSENNE)
        return h.min(axis=1)


def simhash64(text: str) -> int:
    """64-bit SimHash over word shingle hashes (Charikar 2002)."""
    toks = _WORD.findall(text.lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in toks:
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class MinHashStage:
    """map_batches actor: text -> (doc_id, band_id, band_hash) LSH rows."""

    def __init__(self, n_perm: int = 64, bands: int = 16, k: int = 3, id_col: str = "doc_id", text_col: str = "text"):
        assert n_perm % bands == 0
        self.mh = MinHasher(n_perm=n_perm, k=k)
        self.bands = bands
        self.rows_per_band = n_perm // bands
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            sig = self.mh.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                bh = zlib.crc32(chunk.tobytes())
                ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(bh)
        return pd.DataFrame(
            {"doc_id": ids, "band_id": band_ids, "band_hash": band_hashes}
        )


def minhash_candidates(ds, n_perm=64, bands=16, k=3, concurrency=(1, 4)):
    """Dataset[doc_id,text] -> Dataset[doc_a, doc_b] candidate near-dup pairs
    (unverified). groupby((band_id, band_hash)) is the only shuffle and its
    rows are tiny (ids + 2 ints) — text never moves."""
    lsh = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(n_perm=n_perm, bands=bands, k=k),
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = lsh.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs (a pair can fire in several bands)
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def minhash_dedup(ds, threshold: float = 0.8, n_perm=64, bands=16, k=3):
    """Full near-dup pipeline: candidates -> Jaccard verify >= threshold.

    The verify step re-joins candidate ids to text via a broadcast lookup
    (small candidate set assumption, documented; for huge candidate sets
    shard the verify by hash range instead)."""
    import ray

    texts = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        texts.update(zip(b["doc_id"], b["text"]))
    tref = ray.put(texts)
    cand = minhash_candidates(ds, n_perm=n_perm, bands=bands, k=k)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        lut = _ray.get(tref)
        jac = [
            ngram_jaccard(lut[a], lut[b], k)
            for a, b in zip(batch["doc_a"], batch["doc_b"])
        ]
        batch = batch.assign(jaccard=jac)
        return batch[batch["jaccard"] >= threshold]

    return cand.map_batches(verify, batch_format="pandas")


class SimHashStage:
    """map_batches actor: text -> (doc_id, simhash, chunk0..chunk3)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [simhash64(t) for t in batch[self.text_col]]
        out = {"doc_id": batch[self.id_col].to_numpy(), "simhash": np.array(sigs, dtype=np.uint64)}
        for c in range(4):
            out[f"chunk{c}"] = np.array([(s >> (16 * c)) & 0xFFFF for s in sigs], dtype=np.int64)
        return pd.DataFrame(out)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: blake2b content hash -> hash-partitioned first-id-wins."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["content_hash"] = [
            hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
            for t in batch[text_col]
        ]
        return batch

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_hash").map_groups(first, batch_format="pandas")
