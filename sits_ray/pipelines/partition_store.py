"""Partitioned transcript store + the per-turn text-equality invariant.

The north-star invariant: per-turn ``text`` equality under stable
``(conv_id, turn_idx)`` ordering must hold END-TO-END — after the engine
repartitions and rewrites the raw transcripts (the storage layout the
tier pipeline reads from), every turn's text is byte-identical.

``partition_transcripts`` rewrites a transcript Parquet directory into the
hash-partitioned hive layout (text INCLUDED — this is the storage path,
unlike the rollup which prunes text before its shuffle).
``verify_text_integrity`` proves the invariant distributedly: both sides
reduce to per-partition xxh-like digests over (conv_id, turn_idx,
blake2b(text)) with an order-insensitive combiner, so no driver-side
materialization of text happens even at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from sits_ray.stages.regularize import part_of


def partition_transcripts(input_path: str, out_dir: str, n_parts: int = 32):
    """Repartition raw transcripts (with text) into tier-store layout."""
    ds = rd.read_parquet(input_path)

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = pc.dictionary_encode(
            t["conv_id"].combine_chunks()
            if isinstance(t["conv_id"], pa.ChunkedArray)
            else t["conv_id"]
        )
        pid = np.array(
            [part_of(c, n_parts) for c in d.dictionary.to_pylist()], dtype=np.int32
        )
        return t.append_column("part_id", pa.array(pid[np.asarray(d.indices)]))

    ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part_id"]
    )
    return out_dir


def _digest_batches(t: pa.Table) -> pa.Table:
    """Per-batch order-insensitive digest: sum of per-row 64-bit hashes of
    (conv_id, turn_idx, blake2b(text)). Summation over uint64 wraps, which
    is associative + commutative -> layout-independent."""
    conv = t["conv_id"].to_pylist()
    idx = t["turn_idx"].to_pylist()
    txt = t["text"].to_pylist()
    acc = np.uint64(0)
    with np.errstate(over="ignore"):
        for c, i, s in zip(conv, idx, txt):
            h = hashlib.blake2b(
                f"{c}\x00{i}\x00".encode() + s.encode(), digest_size=8
            ).digest()
            acc += np.uint64(int.from_bytes(h, "big"))
    # split the 64-bit digest into two int32-safe halves so every engine
    # (Arrow, pandas, Ray aggregates) carries it losslessly
    a = int(acc)
    return pa.table(
        {
            "digest_hi": pa.array([a >> 32], pa.int64()),
            "digest_lo": pa.array([a & 0xFFFFFFFF], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64()),
        }
    )


def dataset_text_digest(ds) -> tuple[int, int]:
    """(row_count, order-insensitive digest) of a transcript Dataset.

    Per-batch partial digests (one tiny row per batch) are combined on the
    driver with uint64 wrap-around — associative + commutative, so the
    result is independent of block layout and arrival order."""
    rows = ds.map_batches(_digest_batches, batch_format="pyarrow").take_all()
    acc = 0
    n = 0
    for r in rows:
        acc = (acc + ((int(r["digest_hi"]) << 32) | int(r["digest_lo"]))) % (1 << 64)
        n += int(r["n"])
    return n, acc


def verify_text_integrity(input_path: str, store_dir: str) -> dict:
    """Distributed proof of the per-turn text-equality invariant."""
    src = rd.read_parquet(input_path, columns=["conv_id", "turn_idx", "text"])
    dst = rd.read_parquet(store_dir, columns=["conv_id", "turn_idx", "text"])
    n1, d1 = dataset_text_digest(src)
    n2, d2 = dataset_text_digest(dst)
    return {"rows_src": n1, "rows_store": n2, "digest_src": d1, "digest_store": d2,
            "equal": (n1 == n2 and d1 == d2)}
