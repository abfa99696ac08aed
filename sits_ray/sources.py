"""Local fileset catalog — the ``sits_cube(source=...)`` entry point for
the Parquet-only data model (``R/sits_cube.R:132-476``, local filesets
``R/sits_cube_local.R:92-267``): a cube is a CATALOG of assets (one row
per file with its time extent and row counts, read from Parquet footers
only — no data pass), and every read goes through the catalog so file-
and row-group-level pruning happens before any byte of data moves.

Scale shape: footer scans are one Ray task per file (a 100 TB collection
catalogs in parallel, ~KBs of IO per file); the catalog itself is a tiny
Arrow table held on the driver / broadcast, exactly like the reference's
cube tibble.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd


@ray.remote
def _file_entry(path: str, ts_col: str) -> dict:
    md = pq.ParquetFile(path).metadata
    schema = md.schema.to_arrow_schema()
    ts_idx = schema.get_field_index(ts_col) if ts_col in schema.names else -1
    ts_min = ts_max = None
    if ts_idx >= 0:
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ts_idx).statistics
            if st is None or not st.has_min_max:
                continue
            ts_min = st.min if ts_min is None else min(ts_min, st.min)
            ts_max = st.max if ts_max is None else max(ts_max, st.max)
    return {
        "file": path,
        "n_rows": md.num_rows,
        "n_row_groups": md.num_row_groups,
        "size_bytes": os.path.getsize(path),
        "ts_min": ts_min,
        "ts_max": ts_max,
    }


def open_catalog(input_path: str, ts_col: str = "ts") -> pa.Table:
    """Catalog a directory (or single file) of Parquet assets from footers
    only; one row per file with its time extent."""
    paths = (
        sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        if os.path.isdir(input_path)
        else [input_path]
    )
    rows = ray.get([_file_entry.remote(p, ts_col) for p in paths])
    cols: dict = {k: [r[k] for r in rows] for k in
                  ("file", "n_rows", "n_row_groups", "size_bytes")}
    out = {
        "file": pa.array(cols["file"]),
        "n_rows": pa.array(cols["n_rows"], pa.int64()),
        "n_row_groups": pa.array(cols["n_row_groups"], pa.int64()),
        "size_bytes": pa.array(cols["size_bytes"], pa.int64()),
        "ts_min": pa.array([r["ts_min"] for r in rows], pa.timestamp("us")),
        "ts_max": pa.array([r["ts_max"] for r in rows], pa.timestamp("us")),
    }
    return pa.table(out)


def prune_files(catalog: pa.Table, ts_lo=None, ts_hi=None) -> list[str]:
    """Files whose [ts_min, ts_max] extent intersects [ts_lo, ts_hi)."""
    files = catalog["file"].to_pylist()
    mn = catalog["ts_min"].to_pylist()
    mx = catalog["ts_max"].to_pylist()
    out = []
    for f, lo, hi in zip(files, mn, mx):
        if lo is None or hi is None:  # no stats: cannot prune, keep
            out.append(f)
            continue
        if ts_hi is not None and lo >= ts_hi:
            continue
        if ts_lo is not None and hi < ts_lo:
            continue
        out.append(f)
    return out


def read_cube(
    catalog: pa.Table,
    ts_lo=None,
    ts_hi=None,
    columns: list[str] | None = None,
    ts_col: str = "ts",
):
    """Catalog-pruned Dataset read: only intersecting files are opened,
    and the residual [ts_lo, ts_hi) predicate is applied per batch (row
    groups outside the range were already skipped by the file extent)."""
    import pyarrow.compute as pc

    files = prune_files(catalog, ts_lo, ts_hi)
    if not files:
        return rd.from_arrow(pa.table({}))
    ds = rd.read_parquet(files, columns=columns)
    if ts_lo is None and ts_hi is None:
        return ds

    def residual(t: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        if ts_lo is not None:
            mask = pc.and_(mask, pc.greater_equal(t[ts_col], pa.scalar(ts_lo)))
        if ts_hi is not None:
            mask = pc.and_(mask, pc.less(t[ts_col], pa.scalar(ts_hi)))
        return t.filter(mask)

    return ds.map_batches(residual, batch_format="pyarrow")
