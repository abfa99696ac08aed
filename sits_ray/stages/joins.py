"""Adaptive key-unique joins: broadcast the measured-small build side.

``Dataset.join`` spawns ``num_partitions`` aggregator actors per call
with a fixed ~2-4 s setup cost on this host (BASELINE.md r3) — the
right shape when both sides are corpus-sized, pure overhead when the
build side is a bounded intermediate (candidate pairs, component
labels, pruned candidate texts — all O(candidates) by construction).
This module picks per call: if the build side's MEASURED row count is
at or below ``broadcast_rows``, the table ships ONCE via ``ray.put``
and every left batch does a vectorized searchsorted lookup against it
(zero shuffle, zero actors — the "broadcast small sides" pattern);
otherwise it falls back to ``Dataset.join``. The decision costs one
metadata ``count()`` on an already-materialized Dataset, so
corpus-sized sides always take the distributed join at scale.

Contract (both paths produce the same rows and columns, row order
unspecified): output = every left column, then the build side's value
columns renamed via ``value_cols``; the build-side key column is
dropped (Ray's own join drops it — pinned in tests/test_joins.py).
The build side must be KEY-UNIQUE on ``right_on`` (asserted on the
broadcast path; every call site joins against a groupby output or a
per-doc table). ``inner`` drops unmatched left rows; ``left_outer``
null-fills the value columns.

Keys must be integers (doc/node ids everywhere in this repo): the
lookup is one ``np.searchsorted`` per batch against the sorted key
vector — no Python rows, no per-batch rebuild (the broadcast pair is
fetched zero-copy from the worker's plasma segment on every call).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _right_as_table(right) -> pa.Table:
    """Materialized Dataset | pa.Table -> one pyarrow Table (zero-copy
    gather of the block refs; callers only pass bounded intermediates)."""
    if isinstance(right, pa.Table):
        return right
    import ray

    # to_arrow_refs() hands back raw blocks: pa.Table for arrow-backed
    # datasets (zero-copy) but pandas DataFrames for pandas-backed ones
    refs = right.to_arrow_refs()
    tabs = []
    for b in ray.get(list(refs)):
        if not isinstance(b, pa.Table):
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_rows:
            tabs.append(b)
    if not tabs:
        sch = right.schema()
        base = getattr(sch, "base_schema", sch)
        if isinstance(base, pa.Schema):
            return base.empty_table()
        # an empty pandas-backed dataset can lose its column schema
        # entirely (names=[]); there is nothing typed to build from
        raise ValueError(
            "empty pandas-backed build side without a recoverable schema; "
            "pass a typed pa.Table instead"
        )
    return pa.concat_tables(tabs, promote_options="default").combine_chunks()


def broadcast_join_unique(
    left,
    right_table: pa.Table,
    on: str,
    right_on: str,
    value_cols: dict[str, str],
    join_type: str = "inner",
):
    """ray.put the key-unique build table once; vectorized per-batch
    lookup. See module docstring for the exact column contract."""
    import ray

    if join_type not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    keys = right_table[right_on].combine_chunks().to_numpy(zero_copy_only=False)
    if keys.dtype.kind not in "iu":
        raise TypeError(
            f"broadcast_join_unique needs integer keys, got {keys.dtype}"
        )
    order = np.argsort(keys, kind="stable")
    keys_sorted = keys[order]
    if keys_sorted.size and not (np.diff(keys_sorted) > 0).all():
        raise ValueError(
            f"build side is not key-unique on {right_on!r} — the broadcast "
            "lookup would silently drop matches; use Dataset.join"
        )
    vals = right_table.select(list(value_cols)).take(pa.array(order))
    ref = ray.put((keys_sorted, vals))
    inner = join_type == "inner"

    def lookup(t: pa.Table) -> pa.Table:
        clash = set(value_cols.values()) & set(t.column_names)
        if clash:
            raise ValueError(
                f"value columns {sorted(clash)} would overwrite left "
                "columns — rename them in value_cols"
            )
        ks, vt = ray.get(ref)  # zero-copy plasma fetch, once per call
        k = t[on].combine_chunks().to_numpy(zero_copy_only=False)
        if ks.size == 0:
            found = np.zeros(k.size, dtype=bool)
            idx = np.zeros(k.size, dtype=np.int64)
        else:
            idx = np.searchsorted(ks, k)
            idx = np.minimum(idx, ks.size - 1)
            found = ks[idx] == k
        if inner:
            if not found.all():
                t = t.filter(pa.array(found))
                idx = idx[found]
            taken = vt.take(pa.array(idx))
            cols = {name: t[name] for name in t.column_names}
            for src, dst in value_cols.items():
                cols[dst] = taken[src]
        else:
            cols = {name: t[name] for name in t.column_names}
            if ks.size == 0:
                for src, dst in value_cols.items():
                    cols[dst] = pa.nulls(t.num_rows, type=vt.schema.field(src).type)
            else:
                taken = vt.take(pa.array(idx))
                fa = pa.array(found)
                for src, dst in value_cols.items():
                    arr = taken[src].combine_chunks()
                    cols[dst] = pc.if_else(fa, arr, pa.scalar(None, type=arr.type))
        return pa.table(cols)

    return left.map_batches(lookup, batch_format="pyarrow")


def adaptive_join_unique(
    left,
    right,
    on: str,
    right_on: str,
    value_cols: dict[str, str],
    join_type: str = "inner",
    num_partitions: int | None = None,
    broadcast_rows: int = 65536,
    broadcast_bytes: int = 256 << 20,
):
    """Join ``left`` against a KEY-UNIQUE ``right`` (Dataset, will be
    materialized — every call site passes a bounded intermediate — or a
    pa.Table): broadcast lookup when the measured build side is
    <= ``broadcast_rows`` rows AND <= ``broadcast_bytes`` (both read
    from Dataset metadata, no extra pass), ``Dataset.join`` otherwise."""
    keep = [right_on, *(c for c in value_cols if c != right_on)]
    if isinstance(right, pa.Table):
        right_mat = right.select(keep)
        n_right = right_mat.num_rows
        b_right = right_mat.nbytes
        int_key = pa.types.is_integer(right_mat.schema.field(right_on).type)
    else:
        from ray.data.dataset import MaterializedDataset

        names = None
        if isinstance(right, MaterializedDataset):
            sch0 = getattr(right.schema(), "base_schema", right.schema())
            names = list(getattr(sch0, "names", []) or [])
        if names is not None and set(names) == set(keep):
            # already materialized and already narrowed: re-projecting
            # would spin a whole new pipeline (~0.3 s) for a no-op
            right_mat = right
        else:
            right_mat = right.select_columns(keep).materialize()
        n_right = right_mat.count()
        b_right = right_mat.size_bytes() or 0
        sch = getattr(right_mat.schema(), "base_schema", right_mat.schema())
        if isinstance(sch, pa.Schema):
            int_key = pa.types.is_integer(sch.field(right_on).type)
        else:  # PandasBlockSchema: names + numpy dtypes
            try:
                dt = dict(zip(sch.names, sch.types))[right_on]
                int_key = np.dtype(dt).kind in "iu"
            except (KeyError, TypeError, AttributeError):
                int_key = False
    # non-integer keys take the distributed join — the broadcast lookup
    # is a searchsorted over an int64 key vector
    if int_key and n_right <= broadcast_rows and b_right <= broadcast_bytes:
        return broadcast_join_unique(
            left, _right_as_table(right_mat), on, right_on, value_cols,
            join_type=join_type,
        )
    import ray.data as rd

    from sits_ray.stages.dedup import _join_partitions

    if isinstance(right_mat, pa.Table):  # large literal table: wrap
        right_mat = rd.from_arrow(right_mat)
    j = left.join(
        right_mat,
        join_type=join_type,
        num_partitions=_join_partitions(num_partitions),
        on=(on,),
        right_on=(right_on,),
    )
    if any(src != dst for src, dst in value_cols.items()):
        rename = {s: d for s, d in value_cols.items() if s != d}

        def _ren(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [rename.get(c, c) for c in t.column_names]
            )

        j = j.map_batches(_ren, batch_format="pyarrow")
    return j
