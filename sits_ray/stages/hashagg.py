"""High-cardinality aggregation without ``Dataset.groupby(key)``.

Measured pathology (this host, Ray 2.49): ``groupby(key).aggregate(...)``
cost grows with the DISTINCT KEY count, not the row count — 236k rows
with ~224k distinct int64 keys took 25 s from 64 blocks and 475 s from a
single block, while the same logical aggregation ran in 0.8 s when the
keys were first hashed into a bounded number of partitions and each
partition aggregated with one vectorized pandas call. This module is the
reusable form of that fix — the same O(n_parts)-groups discipline the
flagship exchange and ``stages/eventops`` already follow (CLAUDE.md
invariant: group count must stay O(n_parts)).

Use ``Dataset.groupby`` directly only when the key's cardinality is
bounded and small (tiers, sources, registers); route anything keyed by
hashes, tokens, doc ids or window ids through ``part_aggregate``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def part_of_values(v, n_parts: int) -> np.ndarray:
    """Deterministic partition id per value: splitmix64-style bit mix for
    integer keys (a raw ``key % n_parts`` collapses strided/structured key
    spaces — e.g. composite ``doc_a*1000003 + doc_b`` keys or ids sharing
    a factor with n_parts — onto few partitions, recreating the single
    straggler this module exists to avoid), seeded stable hash
    (``pd.util.hash_array``) for everything else — stable across worker
    processes (no PYTHONHASHSEED exposure)."""
    arr = np.asarray(v)
    if arr.dtype.kind in "iu":
        x = arr.astype(np.int64).view(np.uint64).copy()
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        return (x % np.uint64(n_parts)).astype(np.int64)
    return (
        pd.util.hash_array(np.asarray(arr, dtype=object)) % n_parts
    ).astype(np.int64)


def part_aggregate(ds, agg_fn, key_col: str, n_parts: int = 32):
    """Hash-partitioned aggregation: add ``part = hash(key) % n_parts``,
    shuffle O(n_parts) groups, run ``agg_fn`` (a vectorized
    pandas-DataFrame -> DataFrame function that may group by ``key_col``
    internally) once per partition. All rows of one key land in one
    partition, so per-key results are exact."""

    def addp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_part"] = part_of_values(df[key_col], n_parts)
        return df

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(g.drop(columns=["_part"]))

    return (
        ds.map_batches(addp, batch_format="pandas")
        .groupby("_part")
        .map_groups(run, batch_format="pandas")
    )
