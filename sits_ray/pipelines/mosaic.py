"""Tier-store consolidation + re-grid.

* :func:`mosaic_tier` — the ``sits_mosaic`` analog
  (``R/sits_mosaic.R:85``): merge a tier's per-partition blocks into one
  consolidated artifact, optionally cropped to a time ROI (the transcript
  analog of the reference's spatial crop). A streaming Dataset pass — the
  crop happens at the read (partition + row-group pruning), the
  consolidation is a ``repartition(target_blocks)`` sized for downstream
  consumers, never one giant file unless asked.
* :func:`regrid_store` — the ``.reg_tile_convert`` analog
  (``R/api_regularize.R:202-593``): re-key an existing tier store onto a
  NEW partition grid (different ``n_parts``), one streaming pass per
  tier, writing the same hive layout + manifest ledger so the re-gridded
  store is itself resumable/readable by :func:`read_tier`. The reference
  re-grids by intersecting file bboxes with target tiles; here the grid
  is the conv-hash space and re-gridding is a deterministic re-hash (no
  shuffle beyond the partitioned write — each input block maps its rows
  straight to output partition dirs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from sits_ray.pipelines.flagship import read_tier
from sits_ray.state.manifest import Manifest, PartEntry


def mosaic_tier(
    out_dir: str,
    dest_dir: str,
    tier: str,
    ts_lo=None,
    ts_hi=None,
    target_blocks: int = 4,
    ts_col: str = "bucket_ts",
):
    """Consolidate one tier (optionally cropped to [ts_lo, ts_hi)) into
    ``dest_dir`` as ``target_blocks`` Parquet files. Returns row count."""
    ds = read_tier(out_dir, tier)
    if ts_lo is not None or ts_hi is not None:

        def crop(t: pa.Table) -> pa.Table:
            mask = pc.cast(pa.array(np.ones(t.num_rows, dtype=bool)), pa.bool_())
            if ts_lo is not None:
                mask = pc.and_(mask, pc.greater_equal(t[ts_col], pa.scalar(ts_lo)))
            if ts_hi is not None:
                mask = pc.and_(mask, pc.less(t[ts_col], pa.scalar(ts_hi)))
            return t.filter(mask)

        ds = ds.map_batches(crop, batch_format="pyarrow")
    ds = ds.repartition(target_blocks)
    ds.write_parquet(dest_dir)
    return sum(
        pq.read_metadata(os.path.join(dest_dir, f)).num_rows
        for f in os.listdir(dest_dir)
        if f.endswith(".parquet")
    )


def _regrid_batch(t: pa.Table, n_parts_new: int) -> pa.Table:
    """Recompute part_id on the new grid, vectorized over the batch's
    (dictionary-encoded) conversations."""
    from sits_ray.stages.regularize import part_of

    col = t["conv_id"]
    d = pc.dictionary_encode(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    # part_of is the single definition of the conv-hash grid — the
    # re-gridded store must agree with prepare_turns/read_tier forever
    pid = np.array(
        [part_of(c, n_parts_new) for c in d.dictionary.to_pylist()],
        dtype=np.int32,
    )
    new_pid = pa.array(pid[np.asarray(d.indices)])
    if "part_id" in t.column_names:
        t = t.drop_columns(["part_id"])
    return t.append_column("part_id", new_pid)


def regrid_store(
    out_dir: str,
    dest_dir: str,
    tiers: tuple[str, ...],
    n_parts_new: int,
) -> dict:
    """Re-grid every tier onto a new conv-hash partitioning; write the
    same ``long/tier=*/part_id=*`` layout + manifests at ``dest_dir``."""
    os.makedirs(dest_dir, exist_ok=True)
    manifest = Manifest(dest_dir)
    result: dict = {}
    for tier in tiers:
        ds = read_tier(out_dir, tier).map_batches(
            _regrid_batch, batch_format="pyarrow",
            fn_kwargs=dict(n_parts_new=n_parts_new),
        )
        dest = os.path.join(dest_dir, "long", f"tier={tier}")
        ds.write_parquet(dest, partition_cols=["part_id"])
        # ledger: one entry per new partition (count fingerprint from the
        # written footers — no second data pass)
        total = 0
        for part in sorted(os.listdir(dest)):
            pdir = os.path.join(dest, part)
            if not os.path.isdir(part_path := pdir):
                continue
            pid = int(part.split("=", 1)[1])
            files = sorted(
                f for f in os.listdir(part_path) if f.endswith(".parquet")
            )
            n = sum(
                pq.read_metadata(os.path.join(part_path, f)).num_rows
                for f in files
            )
            total += n
            manifest.put(
                PartEntry(
                    tier=tier, part_id=pid, input_rows=n, output_rows=n,
                    n_convs=0, files=files,
                )
            )
        result[tier] = total
    return result


def read_regridded(dest_dir: str, tier: str):
    return rd.read_parquet(os.path.join(dest_dir, "long", f"tier={tier}"))
