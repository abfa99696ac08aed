"""Copy a tier store locally, optionally cropped to a time ROI — the
``sits_cube_copy`` analog (``R/sits_cube_copy.R:89``: download a
collection's files with ROI crop, in parallel, resumable per asset).

Domain mapping: the reference crops rasters to a spatial ROI while
copying tile files; here the ROI is a ``[t0, t1)`` bucket-timestamp
window over a flagship store's partitions (the transcript domain's
region-of-interest axis). Per (tier, part_id):

* **no crop** — hard-link (fallback copy) the long + block parquet files
  verbatim, O(1) data movement like the reference's file download;
* **crop** — filter the long rows to the window and decode → slice →
  re-encode the Gorilla block partition (bit-exact round-trip for the
  kept range, the retention machinery's interval form).

Resumable per partition exactly like the reference's per-asset loop:
the destination manifest records the SOURCE partition's input checksum
plus a crop fingerprint in ``config_fp``; a re-run skips partitions
whose entry matches both and re-copies the rest (late data or a changed
window invalidates only the affected partitions). Copies run as Ray
tasks with a bounded in-flight window (file-level work the Dataset API
can't express).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from sits_ray.pipelines.retention import _atomic_rewrite, _cutoff_us, _slice_nested
from sits_ray.pipelines.store_merge import _link_or_copy
from sits_ray.state.manifest import Manifest, PartEntry


def _crop_fp(lo_us, hi_us) -> str:
    return f"copy[{lo_us},{hi_us})"


def _part_files(store: str, kind: str, tier: str, part_id: int) -> list[str]:
    d = os.path.join(store, kind, f"tier={tier}", f"part_id={part_id}")
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


@ray.remote
def _copy_part_task(src: str, dst: str, tier: str, part_id: int,
                    lo_us, hi_us) -> dict:
    rows = 0
    for kind in ("long", "blocks"):
        for f in _part_files(src, kind, tier, part_id):
            rel = os.path.join(kind, f"tier={tier}", f"part_id={part_id}",
                               os.path.basename(f))
            out = os.path.join(dst, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            if lo_us is None and hi_us is None:
                if os.path.exists(out):
                    os.remove(out)  # re-copy over a stale link is idempotent
                _link_or_copy(f, out)
                if kind == "long":
                    rows += pq.read_metadata(f).num_rows
                continue
            t = pq.read_table(f)
            if kind == "long":
                mask = pc.greater_equal(
                    t["bucket_ts"],
                    pa.scalar(lo_us if lo_us is not None else -(1 << 62),
                              pa.timestamp("us")),
                )
                if hi_us is not None:
                    mask = pc.and_(mask, pc.less(
                        t["bucket_ts"], pa.scalar(hi_us, pa.timestamp("us"))))
                t2 = t.filter(mask)
                rows += t2.num_rows
            else:
                from sits_ray.stages.compressor import GorillaDecode, GorillaEncode

                for miss, val in (("tier", tier), ("part_id", part_id)):
                    if miss not in t.column_names:
                        t = t.append_column(
                            miss,
                            pa.array([val] * t.num_rows,
                                     pa.string() if miss == "tier"
                                     else pa.int32()),
                        )
                nested = pa.table(GorillaDecode()(t))
                sliced = _slice_nested(
                    nested,
                    lo_us if lo_us is not None else -(1 << 62),
                    hi_us,
                )
                t2 = GorillaEncode()(sliced).drop_columns(["tier", "part_id"])
            _atomic_rewrite(out, t2)
    return {"tier": tier, "part_id": part_id, "rows": rows}


def cube_copy(src_dir: str, dst_dir: str, tiers=None, time_range=None,
              max_in_flight: int = 16) -> dict:
    """Copy ``src_dir`` (a flagship store) into ``dst_dir``, optionally
    restricted to ``tiers`` and cropped to ``time_range = (t0, t1)``
    (either bound may be None; timestamps are anything numpy parses).
    Returns ``{"parts_copied", "parts_skipped", "rows"}``. Resumable:
    re-running skips partitions already copied under the same source
    content and crop window."""
    lo_us = _cutoff_us(time_range[0]) if time_range and time_range[0] is not None else None
    hi_us = _cutoff_us(time_range[1]) if time_range and time_range[1] is not None else None
    fp = _crop_fp(lo_us, hi_us)
    src_man, dst_man = Manifest(src_dir), Manifest(dst_dir)
    todo = []
    skipped = 0
    for e in src_man.entries():
        if tiers is not None and e.tier not in tiers:
            continue
        have = dst_man.get(e.tier, e.part_id)
        if (have is not None and have.input_checksum == e.input_checksum
                and have.input_rows == e.input_rows
                and have.config_fp == f"{fp}|{e.config_fp}"):
            skipped += 1
            continue
        todo.append(e)

    result = {"parts_copied": 0, "parts_skipped": skipped, "rows": 0}
    pending: dict = {}
    idx = 0

    def launch():
        nonlocal idx
        while idx < len(todo) and len(pending) < max_in_flight:
            e = todo[idx]
            ref = _copy_part_task.remote(
                src_dir, dst_dir, e.tier, e.part_id, lo_us, hi_us
            )
            pending[ref] = e
            idx += 1

    launch()
    while pending:
        done_refs, _ = ray.wait(list(pending), num_returns=1)
        ref = done_refs[0]
        e = pending.pop(ref)
        s = ray.get(ref)
        dst_man.put(PartEntry(
            tier=e.tier, part_id=e.part_id, input_rows=e.input_rows,
            output_rows=s["rows"], n_convs=e.n_convs, files=e.files,
            input_checksum=e.input_checksum, expired_to_us=e.expired_to_us,
            config_fp=f"{fp}|{e.config_fp}",
        ))
        result["parts_copied"] += 1
        result["rows"] += s["rows"]
        launch()
    return result
