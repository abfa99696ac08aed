"""Merge two tier stores — the ``sits_merge.raster_cube`` analog
(``R/sits_merge.R:61-105`` merging cubes by tile/band file references):
two flagship output stores (long + blocks + manifests) combine into one
without touching raw data.

Semantics per (tier, part_id):

* present in exactly one store -> hard-link (fallback copy) its files and
  manifest entry;
* present in BOTH -> conflict; resolved by ``prefer`` = "left" | "right"
  | "error" (the reference errors on overlapping bands unless told to
  irradiate one side).

The merge is metadata + file movement only (O(partitions), no data pass)
— exactly the property that makes cube merge cheap in the reference.
"""

from __future__ import annotations

import os
import shutil

from sits_ray.state.manifest import Manifest, PartEntry


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _copy_part(store: str, out: str, kind: str, tier: str, part_id: int) -> None:
    src_dir = os.path.join(store, kind, f"tier={tier}", f"part_id={part_id}")
    if not os.path.isdir(src_dir):
        return
    dst_dir = os.path.join(out, kind, f"tier={tier}", f"part_id={part_id}")
    for f in sorted(os.listdir(src_dir)):
        if f.endswith(".parquet"):
            _link_or_copy(os.path.join(src_dir, f), os.path.join(dst_dir, f))


def merge_stores(store_a: str, store_b: str, out_dir: str,
                 prefer: str = "error") -> dict:
    """Merge two flagship stores into ``out_dir``. Returns summary counts."""
    if prefer not in ("left", "right", "error"):
        raise ValueError("prefer must be 'left', 'right' or 'error'")
    ma, mb = Manifest(store_a), Manifest(store_b)
    ea = {(e.tier, e.part_id): e for e in ma.entries()}
    eb = {(e.tier, e.part_id): e for e in mb.entries()}
    overlap = sorted(set(ea) & set(eb))
    if overlap and prefer == "error":
        raise ValueError(f"stores overlap on {len(overlap)} partitions: {overlap[:5]}")
    out_manifest = Manifest(out_dir)
    n_a = n_b = 0
    for key in sorted(set(ea) | set(eb)):
        take_a = key in ea and (key not in eb or prefer == "left")
        store, entry = (store_a, ea[key]) if take_a else (store_b, eb[key])
        tier, part_id = key
        for kind in ("long", "blocks"):
            _copy_part(store, out_dir, kind, tier, part_id)
        out_manifest.put(PartEntry(**{**entry.__dict__}))
        if take_a:
            n_a += 1
        else:
            n_b += 1
    return {"parts_from_a": n_a, "parts_from_b": n_b, "overlap": len(overlap)}
