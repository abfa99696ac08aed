"""Zero-copy Arrow <-> numpy helpers shared by stages and queries.

The hot-path contract (VERDICT r1 #9/#10): embedding / list columns must
never round-trip through ``to_pylist()`` — flatten the list buffer
zero-copy and reshape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_matrix(col, dtype=np.float64) -> np.ndarray:
    """Fixed-width ``list<numeric>`` column -> (n, d) matrix, zero-copy
    flatten + reshape (all rows must share one length; raises otherwise)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if isinstance(arr, pa.ExtensionArray):
        # Ray tensor extension column (from_numpy datasets): already (n, d)
        return np.ascontiguousarray(
            np.asarray(arr.to_numpy(zero_copy_only=False)), dtype=dtype
        )
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError("list_matrix requires equal-length lists")
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat.reshape(n, d), dtype=dtype)


def ragged(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Variable-length list column -> (flat values, lens, offsets[n+1])."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return flat, lens, offs


def dict_lookup(keys_col, lut_keys: pa.Array, lut_vals: pa.Array):
    """Vectorized dimension lookup: ``pc.index_in`` + ``take`` (replaces
    per-row Python dict gets). Missing keys -> null."""
    idx = pc.index_in(keys_col, value_set=lut_keys)
    return lut_vals.take(idx)
