"""Tile grid over the engine's key space — the MGRS/ROI analog.

The reference navigates between spatial ROIs and MGRS grid tiles
(``sits_mgrs_to_roi`` / ``sits_roi_to_mgrs`` / ``sits_roi_to_tiles`` /
``sits_tiles_to_roi``, ``R/sits_grid_systems.R``): named tiles with
fixed extents that partition the workspace, so a job can be scoped to
tiles and a tile list converted back to a region. The transcript
engine's workspace is the 64-bit splitmix64 hash space its partitioner
mixes keys into (``stages/hashagg.part_of_values``), so the analog grid
is EXACT here: tile ``T{n}-{i}`` covers the half-open hash interval
``[i*2^64/n, (i+1)*2^64/n)`` — the same range partitioning the
reproducible-shuffle stage uses for its bucket prefixes
(``stages/curriculum.shuffle_order``). An ROI is a (lo, hi) hash
interval; conversions are exact interval arithmetic, and
``tiles_of_ids`` ties real keys to tiles through the production mixer
so a tile scope means the same rows everywhere.
"""

from __future__ import annotations

import numpy as np

_SPACE = 1 << 64


def tile_name(n: int, i: int) -> str:
    if not (0 <= i < n):
        raise ValueError(f"tile index {i} outside grid of {n}")
    return f"T{n:03d}-{i:03d}"


def parse_tile(name: str) -> tuple[int, int]:
    try:
        gn, gi = name.lstrip("T").split("-")
        n, i = int(gn), int(gi)
    except Exception:
        raise ValueError(f"bad tile name {name!r}; expected 'Tnnn-iii'")
    if not (0 < n <= _SPACE and 0 <= i < n):
        raise ValueError(f"bad tile name {name!r}")
    return n, i


def mgrs_to_roi(name: str) -> dict:
    """Tile name -> its exact hash interval (``sits_mgrs_to_roi``)."""
    n, i = parse_tile(name)
    return {"lo": (_SPACE * i) // n, "hi": (_SPACE * (i + 1)) // n}


def tiles_to_roi(names) -> dict:
    """Bounding interval of a tile list (``sits_tiles_to_roi``: the
    reference returns the bbox that covers the named tiles)."""
    rois = [mgrs_to_roi(t) for t in names]
    if not rois:
        raise ValueError("empty tile list")
    return {"lo": min(r["lo"] for r in rois), "hi": max(r["hi"] for r in rois)}


def roi_to_tiles(roi: dict, n: int = 64) -> list[str]:
    """Tiles of an n-grid intersecting the ROI (``sits_roi_to_tiles``)."""
    lo, hi = int(roi["lo"]), int(roi["hi"])
    if not (0 <= lo < hi <= _SPACE):
        raise ValueError(f"bad roi {roi}")
    first = (lo * n) // _SPACE
    last = ((hi - 1) * n) // _SPACE
    return [tile_name(n, i) for i in range(first, last + 1)]


def roi_to_mgrs(roi: dict, n: int = 60) -> list[str]:
    """ROI -> covering tiles on the default coarse grid
    (``sits_roi_to_mgrs``; MGRS has 60 longitude zones, hence n=60)."""
    return roi_to_tiles(roi, n=n)


def mixed_hash(ids) -> np.ndarray:
    """Keys -> their position in the grid's hash space: the SAME
    splitmix64 mix the partitioner applies (``hashagg.part_of_values``)
    for integer keys, the same seeded string hash otherwise."""
    import pandas as pd

    arr = np.asarray(ids)
    if arr.dtype.kind in "iu":
        x = arr.astype(np.int64).view(np.uint64).copy()
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        return x
    return pd.util.hash_array(np.asarray(arr, dtype=object)).astype(np.uint64)


def tiles_of_ids(ids, n: int = 64) -> np.ndarray:
    """Tile index per key on an n-grid (range partitioning, matching
    the interval arithmetic above exactly)."""
    h = mixed_hash(ids)
    return (h // np.uint64(_SPACE // n)).clip(max=n - 1).astype(np.int64)


def roi_filter_ids(ids, roi: dict) -> np.ndarray:
    """Boolean mask: which keys fall inside the ROI interval — the
    row-scoping primitive behind a tile-scoped job."""
    h = mixed_hash(ids)
    lo, hi = int(roi["lo"]), int(roi["hi"])
    mask = h >= np.uint64(lo)
    if hi < _SPACE:  # hi == 2^64 (last tile) has no upper bound in uint64
        mask &= h < np.uint64(hi)
    return mask
