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
        from sits_ray.kernels.compress_batch import (
            _Layout,
            encode_timestamps_arrow,
            encode_values_arrow,
        )

        def flat(col):
            arr = batch[col].combine_chunks()
            offs = arr.offsets.to_numpy().astype(np.int64)
            return arr.flatten().to_numpy(zero_copy_only=False), offs - offs[0]

        def as_f64(a):
            # skip the copy when the column is already float64 (the four
            # latency metrics) — astype always copies, and first-touch
            # pages are the binding cost on this host
            return a if a.dtype == np.float64 else a.astype(np.float64)

        ts_flat, offs = flat("bucket_ts")
        ts_flat = ts_flat.astype("datetime64[us]").astype(np.int64)
        # every metric shares the batch's series layout — build it once
        layout = _Layout(offs)
        cols = {
            "conv_id": batch["conv_id"],
            "tier": batch["tier"],
            "part_id": batch["part_id"],
            "n_points": batch["n_buckets"],
            "ts_block": encode_timestamps_arrow(ts_flat, offs, layout),
            "filled_block": encode_values_arrow(
                as_f64(flat("filled")[0]), offs, layout
            ),
        }
        for m in self.metrics:
            cols[f"val_{m}"] = encode_values_arrow(
                as_f64(flat(m)[0]), offs, layout
            )
        return pa.table(cols)


class GorillaDecode:
    """Compressed block rows -> nested tier series rows (bit-exact inverse).

    Decoding is batch-vectorized across all series of the batch
    (:func:`sits_ray.kernels.compress_batch.decode_values_batch`): lockstep
    one-code-per-step with vectorized bit extraction, no per-value Python.
    Both encoder dialects (scalar with window reuse, batch without) decode
    identically — pinned by tests/test_compress_batch.py round-trips.
    """

    def __init__(self, metrics: tuple[str, ...] = ALL_METRICS):
        self.metrics = metrics

    def __call__(self, batch: pa.Table) -> pa.Table:
        from sits_ray.kernels.compress_batch import (
            decode_timestamps_batch,
            decode_values_batch,
        )

        lens = batch["n_points"].to_numpy()
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)

        # Arrow binary columns decode directly (offsets + values buffer);
        # no per-row as_py materialization
        ts_flat, _ = decode_timestamps_batch(batch["ts_block"])
        filled_flat, _ = decode_values_batch(batch["filled_block"])
        v_flats = {
            m: decode_values_batch(batch[f"val_{m}"])[0] for m in self.metrics
        }

        def lst(flat, typ):
            return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(flat, typ))

        cols = {
            "conv_id": batch["conv_id"],
            "tier": batch["tier"],
            "part_id": batch["part_id"],
            "n_buckets": batch["n_points"],
            "bucket_ts": lst(ts_flat, pa.timestamp("us")),
        }
        for m in self.metrics:
            if m in ("turn_count", "tool_calls", "n_latency"):
                cols[m] = lst(v_flats[m].astype(np.int64), pa.int64())
            else:
                cols[m] = lst(v_flats[m], pa.float64())
        cols["filled"] = lst(filled_flat.astype(bool), pa.bool_())
        return pa.table(cols)


def compress(nested, concurrency: int | tuple[int, int] = (2, 8), batch_size: int = 2048):
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
