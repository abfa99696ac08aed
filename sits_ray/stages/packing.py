"""Sequence packing for training export — fixed-token-budget bins.

The standard pretraining-export step: concatenate documents into
fixed-length training sequences with minimal padding waste. Global
optimal packing is inherently sequential, so production systems pack
PER SHARD (each worker packs its own partition independently and
emits full bins) — that is exactly the Ray shape here:

1. one thin pass maps each doc to (doc_id, n_tok, part) where
   ``part = splitmix64(doc_id) % n_parts`` (stages/hashagg.
   part_of_values — the repo's standard int-key mix, replayed in SQL
   by the gate twin);
2. ``groupby(part).map_groups`` (O(n_parts) groups — the CLAUDE.md
   group-count rule) runs the deterministic walk per partition: docs
   ordered by (n_tok desc, doc_id asc), NEXT-FIT into ``budget``-token
   bins (oversize docs truncate to one full bin);
3. only the bounded per-partition summary reaches the driver.

Determinism contract (mirrored bit-exactly by the SQL twin): with
``t = min(n_tok, budget)``, the walk is ``if t <= rem: rem -= t else:
n_bins += 1; rem = budget - t`` over the total order; ``fill_frac =
sum(t) / (n_bins * budget)`` is one exact int/int double division.

Reference analog: the reference sizes its processing blocks from a
memory budget the same way (``.jobs_optimal_block``,
``R/api_jobs.R:24-63``) — here the budget is tokens per training
sequence instead of bytes per job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _next_fit(toks: np.ndarray, budget: int) -> tuple[int, int]:
    """(n_bins, sum_packed) of the next-fit walk over ``toks`` in the
    given order; oversize entries truncate to ``budget``."""
    rem = 0
    n_bins = 0
    packed = 0
    for t in toks:
        t = int(min(t, budget))
        packed += t
        if t <= rem:
            rem -= t
        else:
            n_bins += 1
            rem = budget - t
    return n_bins, packed


def pack_sequences(ds, budget: int = 256, n_parts: int = 8,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> pd.DataFrame:
    """Per-partition next-fit packing summary. Returns one row per
    non-empty partition, ordered by part:
    (part, n_docs, n_bins, sum_tokens, sum_packed, fill_frac)."""
    from sits_ray.stages.hashagg import part_of_values

    def lens(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = (df[text_col].str.lower().str.findall(r"\w+")
                 .str.len().to_numpy(np.int64))
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "n_tok": n_tok,
            "part": part_of_values(ids, n_parts),
        })

    thin = ds.map_batches(lens, batch_format="pandas")

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_tok", "doc_id"], ascending=[False, True])
        toks = g["n_tok"].to_numpy(np.int64)
        n_bins, packed = _next_fit(toks, budget)
        return pd.DataFrame([{
            "part": np.int64(int(g["part"].iloc[0])),
            "n_docs": np.int64(len(g)),
            "n_bins": np.int64(n_bins),
            "sum_tokens": np.int64(int(toks.sum())),
            "sum_packed": np.int64(packed),
            # all-empty partition opens no bin: nothing packed, nothing
            # wasted -> 1.0 (the twin's CASE arm)
            "fill_frac": (float(packed) / float(n_bins * budget)
                          if n_bins else 1.0),
        }])

    out = (thin.groupby("part")
               .map_groups(pack_part, batch_format="pandas")
               .to_pandas())
    return out.sort_values("part").reset_index(drop=True)
