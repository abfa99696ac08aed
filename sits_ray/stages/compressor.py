"""Gorilla compression actor stages.

The transcript-domain analog of the reference's compact on-disk band
encoding (INT2S + scale, ``R/api_reduce.R:245-254``): each (conv, tier)
regular series becomes one row of delta-of-delta timestamp block +
per-metric XOR value blocks, stored as Arrow ``binary`` columns in the
tier Parquet.

Stateful stage pattern (SURVEY.md §7.3): callable CLASSES passed to
``map_batches(Cls, concurrency=N, batch_size=B)`` — an actor pool; reusable
scratch state lives in ``__init__`` (once per actor), per-batch work in
``__call__``. Counts are encoded as float64 (bit-exact for |n| < 2^53).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sits_ray.kernels.compress import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)
from sits_ray.stages.regularize import ALL_METRICS


class GorillaEncode:
    """Nested tier series rows -> compressed block rows.

    Input: output of :func:`sits_ray.stages.regularize.rollup_nested`.
    Output columns: conv_id, tier, part_id, n_points, ts_block:binary,
    val_<metric>:binary per metric, filled_block:binary.
    """

    def __init__(self, metrics: tuple[str, ...] = ALL_METRICS):
        self.metrics = metrics

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts_blocks, filled_blocks = [], []
        val_blocks: dict[str, list[bytes]] = {m: [] for m in self.metrics}
        bucket_col = batch["bucket_ts"]
        for i in range(n):
            ts = np.asarray(bucket_col[i].as_py(), dtype="datetime64[us]").astype(np.int64)
            ts_blocks.append(encode_timestamps(ts))
            filled = np.asarray(batch["filled"][i].as_py(), dtype=np.float64)
            filled_blocks.append(encode_values(filled))
            for m in self.metrics:
                v = np.asarray(batch[m][i].as_py(), dtype=np.float64)
                val_blocks[m].append(encode_values(v))
        cols = {
            "conv_id": batch["conv_id"],
            "tier": batch["tier"],
            "part_id": batch["part_id"],
            "n_points": batch["n_buckets"],
            "ts_block": pa.array(ts_blocks, pa.binary()),
            "filled_block": pa.array(filled_blocks, pa.binary()),
        }
        for m in self.metrics:
            cols[f"val_{m}"] = pa.array(val_blocks[m], pa.binary())
        return pa.table(cols)


class GorillaDecode:
    """Compressed block rows -> nested tier series rows (bit-exact inverse)."""

    def __init__(self, metrics: tuple[str, ...] = ALL_METRICS):
        self.metrics = metrics

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        buckets, filled = [], []
        vals: dict[str, list] = {m: [] for m in self.metrics}
        for i in range(n):
            ts = decode_timestamps(batch["ts_block"][i].as_py())
            buckets.append(ts.tolist())
            filled.append(decode_values(batch["filled_block"][i].as_py()).astype(bool).tolist())
            for m in self.metrics:
                v = decode_values(batch[f"val_{m}"][i].as_py())
                if m in ("turn_count", "tool_calls"):
                    vals[m].append(v.astype(np.int64).tolist())
                else:
                    vals[m].append(v.tolist())
        cols = {
            "conv_id": batch["conv_id"],
            "tier": batch["tier"],
            "part_id": batch["part_id"],
            "n_buckets": batch["n_points"],
            "bucket_ts": pa.array(buckets, pa.list_(pa.timestamp("us"))),
        }
        for m in self.metrics:
            typ = pa.int64() if m in ("turn_count", "tool_calls") else pa.float64()
            cols[m] = pa.array(vals[m], pa.list_(typ))
        cols["filled"] = pa.array(filled, pa.list_(pa.bool_()))
        return pa.table(cols)


def compress(nested, concurrency: int | tuple[int, int] = (2, 8), batch_size: int = 256):
    """Actor-pool encode stage over nested tier series."""
    return nested.map_batches(
        GorillaEncode,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def decompress(blocks, concurrency: int | tuple[int, int] = (2, 8), batch_size: int = 256):
    """Actor-pool decode stage (verification / read path)."""
    return blocks.map_batches(
        GorillaDecode,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
