"""Curriculum ordering over a document corpus — exact GLOBAL interleaved
rank without a global sort.

LLM training pipelines order corpora easy->hard (length/quality
curricula) and interleave difficulty buckets so every shard sees the
full mix (Bengio et al. 2009 curriculum learning; the reference's
stratified allocation machinery in ``R/sits_sample_functions.R`` is the
same counts->allocation shape). A naive implementation is
``Dataset.sort(score)`` — an all-to-all range shuffle of the corpus. We
exploit that the order key here is a BOUNDED-CARDINALITY integer
(token count): a histogram of distinct counts fits on the driver, so

1. one map_batches pass emits per-batch ``value_counts`` partials
   (zero shuffle; the driver folds a {token_count: rows} histogram —
   bounded by max document length, not corpus size);
2. the driver derives nearest-rank quantile thresholds (the
   stages/quantile contract), bucket ids, and per-distinct-count BASE
   OFFSETS = cumulative rows of smaller counts within the same bucket;
3. ONE hash shuffle keyed on token count (stages/hashagg
   part_aggregate, O(n_parts) groups) co-locates each tie group; the
   in-partition kernel ranks ties by doc_id and emits
   ``pos = (base + tie_rank) * n_buckets + bucket`` — the round-robin
   interleave position.

Every value is an integer, so the result is bit-exact vs the DuckDB
``row_number() over (partition by bucket order by n, doc_id)`` twin
(queries._curriculum_sql) while doing no global sort: corpus text never
shuffles (only (doc_id, n) pairs), and the only wide step is one
hash-partitioned exchange.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray


def token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset[id, text] -> Dataset[id, n_tokens] (``[a-z]+`` on
    lower(), the langid/simhash_poly tokenizer — C-speed regex count)."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_tokens": df[text_col]
                .str.lower()
                .str.count(r"[a-z]+")
                .to_numpy(dtype=np.int64),
            }
        )

    return ds.map_batches(counts, batch_format="pandas")


def _histogram(nds, col: str = "n_tokens") -> pd.Series:
    """{col value: rows} histogram: per-batch value_counts partials, then
    ONE tiny-row hash exchange (stages/hashagg — at 100-TB block counts
    the raw partial stream is blocks x per-batch-distinct rows, too many
    to fold on the driver) so only O(distinct values) rows come back.
    Requires bounded distinct cardinality (token counts, bucket ids)."""
    from sits_ray.stages.hashagg import part_aggregate

    def part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()
        return pd.DataFrame(
            {col: vc.index.to_numpy(dtype=np.int64),
             "cnt": vc.to_numpy(dtype=np.int64)}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(col, sort=False)["cnt"].sum().reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    partials = nds.map_batches(part, batch_format="pandas")
    folded = part_aggregate(partials, merge, key_col=col, n_parts=16)
    parts = folded.to_pandas()
    return parts.set_index(col)["cnt"].sort_index()


def nearest_rank_thresholds(hist: pd.Series, qs) -> list[int]:
    """quantile_disc values from a counts histogram: 1-based rank
    ceil(q*N) walked over the cumulative counts (the stages/quantile
    nearest-rank contract, gate-pinned vs DuckDB quantile_disc)."""
    total = int(hist.sum())
    cum = hist.cumsum()
    out = []
    for q in qs:
        r = min(max(int(math.ceil(q * total)), 1), total)
        out.append(int(cum.index[int((cum < r).sum())]))
    return out

def curriculum_order(ds, n_buckets: int = 4, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Dataset[id, text] -> Dataset[id, n_tokens, bucket, pos] where
    ``pos`` is the exact interleaved curriculum position (round-robin
    across ``n_buckets`` quantile buckets, (n_tokens, id) order within
    a bucket). See module docstring for the no-sort plan."""
    from sits_ray.stages.hashagg import part_aggregate

    # materialize: the (id, n_tokens) table is tiny and is consumed
    # TWICE (histogram pass + rank pass) — without this the lazy
    # pipeline re-reads and re-tokenizes the whole corpus per pass
    nds = token_counts(ds, id_col=id_col, text_col=text_col).materialize()
    hist = _histogram(nds)
    if hist.empty:
        return ray.data.from_pandas(
            pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "n_tokens": pd.Series([], dtype=np.int64),
                 "bucket": pd.Series([], dtype=np.int64),
                 "pos": pd.Series([], dtype=np.int64)}
            )
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    thr = np.asarray(nearest_rank_thresholds(hist, qs), dtype=np.int64)

    ns = hist.index.to_numpy(dtype=np.int64)          # sorted distinct counts
    cnts = hist.to_numpy(dtype=np.int64)
    buckets = (ns[:, None] > thr[None, :]).sum(axis=1).astype(np.int64)
    base = np.zeros(ns.size, dtype=np.int64)          # per-bucket running offset
    for b in range(n_buckets):
        m = buckets == b
        base[m] = np.concatenate([[0], np.cumsum(cnts[m])[:-1]])
    state = ray.put((ns, buckets, base))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        ns_, bk_, base_ = ray.get(state)
        gg = g.sort_values(["n_tokens", id_col])
        n = gg["n_tokens"].to_numpy()
        idx = np.searchsorted(ns_, n)
        tie = gg.groupby("n_tokens", sort=False).cumcount().to_numpy()
        bucket = bk_[idx]
        pos = (base_[idx] + tie) * np.int64(n_buckets) + bucket
        return pd.DataFrame(
            {id_col: gg[id_col].to_numpy(), "n_tokens": n,
             "bucket": bucket, "pos": pos}
        )

    return part_aggregate(nds, rank_part, key_col="n_tokens", n_parts=32)


# --- deterministic global shuffle order --------------------------------------
_MIX_MULT = 2654435761          # Knuth multiplicative constant
_MIX_MOD = 1 << 32


def mix_ids(ids: np.ndarray) -> np.ndarray:
    """SQL-replayable multiplicative id mixing. The id is first reduced
    to a POSITIVE residue mod 2^31 (numpy ``%`` floors, DuckDB ``%``
    truncates — the SQL twin applies the explicit positive-mod fold so
    both agree for signed ids too), then the int64 product
    ``residue * 2654435761`` stays below 2^63 — exact in both engines."""
    r = ids % np.int64(1 << 31)  # numpy floored mod is already >= 0
    return (r * np.int64(_MIX_MULT)) % np.int64(_MIX_MOD)


def shuffle_order(ds, id_col: str = "doc_id", bucket_bits: int = 12):
    """Dataset[id, ...] -> Dataset[id, mix, pos]: a DETERMINISTIC,
    reproducible global shuffle permutation (``pos`` = rank under
    (mix(id), id) order) with NO all-to-all ``random_shuffle`` and NO
    global sort.

    Training-data exports need a reproducible corpus shuffle;
    ``Dataset.random_shuffle`` is a full materializing exchange and is
    non-reproducible across runs/cluster shapes. Here the shuffle key is
    a multiplicative hash of the id, and the rank is computed with the
    curriculum_order machinery on the key's TOP ``bucket_bits`` bits:
    the 2^bucket_bits bucket histogram is driver-bounded, base offsets
    come from the cumulative bucket counts (bucket order == key-prefix
    order), and ONE hash exchange co-locates each bucket for local
    (mix, id) tie ranking. Bit-exact vs the DuckDB
    ``row_number() over (order by mix, id)`` twin."""
    from sits_ray.stages.hashagg import part_aggregate

    shift = np.int64(32 - bucket_bits)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        m = mix_ids(ids)
        return pd.DataFrame(
            {id_col: ids, "mix": m, "bucket": (m >> shift).astype(np.int64)}
        )

    # consumed twice (bucket histogram + rank pass) — see curriculum_order
    kds = ds.map_batches(keyed, batch_format="pandas").materialize()
    hist = _histogram(kds, col="bucket")
    if hist.empty:
        return ray.data.from_pandas(
            pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "mix": pd.Series([], dtype=np.int64),
                 "pos": pd.Series([], dtype=np.int64)}
            )
        )
    buckets = hist.index.to_numpy(dtype=np.int64)   # ascending == key-prefix order
    cnts = hist.to_numpy(dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    state = ray.put((buckets, base))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        b_, base_ = ray.get(state)
        gg = g.sort_values(["mix", id_col])
        idx = np.searchsorted(b_, gg["bucket"].to_numpy())
        tie = gg.groupby("bucket", sort=False).cumcount().to_numpy()
        return pd.DataFrame(
            {id_col: gg[id_col].to_numpy(), "mix": gg["mix"].to_numpy(),
             "pos": base_[idx] + tie}
        )

    return part_aggregate(kds, rank_part, key_col="bucket", n_parts=32)
