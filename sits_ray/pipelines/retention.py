"""Retention expiry — the policy half of the rollup/retention engine.

A retention pass drops rolled-up points older than a per-tier cutoff
(e.g. keep 1m for 7 days, 1h for 90, 1d forever). Partitions are
conv-hash keyed, so every partition spans the full time range and expiry
is a per-partition streaming REWRITE (read -> suffix filter -> atomic
replace), never a directory drop. The reference's analog is the ledger
discipline of ``R/api_regularize.R:134-145`` — the filesystem is the
resume state: each partition's manifest entry carries an ``expired_to_us``
watermark, so re-running the same policy skips finished partitions and a
crash mid-pass re-runs only unfinished ones (filtering already-filtered
data is a no-op).

Scale shape: one Ray task per (tier, partition) — no shuffle at all; the
task's working set is one partition file (bounded by the flagship's
``part_budget_bytes`` sizing rule). Both stores are expired in one task:
the long Parquet rows and the Gorilla block store (decode -> suffix-slice
each conversation's series at ``searchsorted(ts, cutoff)`` -> re-encode),
keeping the two bit-consistent.
"""

from __future__ import annotations

import glob
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from sits_ray.state.manifest import Manifest


def _cutoff_us(cutoff) -> int:
    return int(np.datetime64(cutoff, "us").astype(np.int64))


def _atomic_rewrite(path: str, table: pa.Table) -> None:
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".parquet.tmp")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _expire_long(part_dir: str, cutoff_us: int) -> tuple[int, int]:
    """Suffix-filter every parquet file of one long partition in place.
    Returns (rows_kept, rows_dropped)."""
    kept = dropped = 0
    for f in sorted(glob.glob(os.path.join(part_dir, "*.parquet"))):
        t = pq.read_table(f)
        keep = pc.greater_equal(
            t["bucket_ts"], pa.scalar(cutoff_us, pa.timestamp("us"))
        )
        n_keep = pc.sum(keep).as_py() or 0
        if n_keep == t.num_rows:
            kept += t.num_rows
            continue
        t2 = t.filter(keep)
        _atomic_rewrite(f, t2)
        kept += t2.num_rows
        dropped += t.num_rows - t2.num_rows
    return kept, dropped


def _slice_nested(t: pa.Table, cutoff_us: int,
                  hi_us: int | None = None) -> pa.Table:
    """Drop points before the cutoff (and, when ``hi_us`` is given, at or
    after it — the cube_copy time-ROI crop) from every list column of a
    nested tier table. Series are time-sorted, so the keep mask is a
    per-row contiguous run — one vectorized global mask, no
    per-conversation Python."""
    ts = t["bucket_ts"].combine_chunks()
    offs = ts.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    flat_ts = ts.flatten().to_numpy(zero_copy_only=False)
    flat_us = flat_ts.astype("datetime64[us]").astype(np.int64)
    keep = flat_us >= cutoff_us
    if hi_us is not None:
        keep &= flat_us < hi_us
    new_lens = np.zeros(t.num_rows, dtype=np.int64)
    nonempty = offs[:-1] < offs[1:]
    if nonempty.any():
        sums = np.add.reduceat(keep.astype(np.int64), offs[:-1][nonempty])
        new_lens[nonempty] = sums
    row_keep = new_lens > 0
    new_offs = np.concatenate([[0], np.cumsum(new_lens[row_keep])]).astype(np.int32)

    def sliced(col) -> pa.ListArray:
        arr = col.combine_chunks()
        flat = arr.flatten().filter(pa.array(keep))
        return pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), flat)

    cols = {}
    for name in t.column_names:
        col = t[name]
        if pa.types.is_list(col.type):
            cols[name] = sliced(col)
        elif name == "n_buckets":
            cols[name] = pa.array(new_lens[row_keep], col.type)
        else:
            cols[name] = col.combine_chunks().filter(pa.array(row_keep))
    return pa.table(cols)


def _expire_blocks(part_dir: str, cutoff_us: int) -> tuple[int, int]:
    """Decode one block partition, suffix-slice each conversation's series
    at the cutoff, re-encode (bit-exact Gorilla round-trip for the kept
    suffix). Returns (points_kept, points_dropped)."""
    from sits_ray.stages.compressor import GorillaDecode, GorillaEncode

    dec, enc = GorillaDecode(), GorillaEncode()
    kept = dropped = 0
    for f in sorted(glob.glob(os.path.join(part_dir, "*.parquet"))):
        t = pq.read_table(f)
        before = int(pc.sum(t["n_points"]).as_py() or 0)
        # tier/part_id may be absent inside the file (hive dirs carry them)
        for miss, val in (("tier", ""), ("part_id", 0)):
            if miss not in t.column_names:
                t = t.append_column(
                    miss,
                    pa.array(
                        [val] * t.num_rows,
                        pa.string() if miss == "tier" else pa.int32(),
                    ),
                )
        nested = pa.table(dec(t))
        sliced = _slice_nested(nested, cutoff_us)
        out = enc(sliced)
        out = out.drop_columns(["tier", "part_id"])
        after = int(pc.sum(out["n_points"]).as_py() or 0)
        if after != before:
            _atomic_rewrite(f, out)
        kept += after
        dropped += before - after
    return kept, dropped


@ray.remote
def _expire_part(out_dir: str, tier: str, part_id: int, cutoff_us: int,
                 expire_blocks: bool) -> dict:
    long_dir = os.path.join(out_dir, "long", f"tier={tier}", f"part_id={part_id}")
    kept, dropped = _expire_long(long_dir, cutoff_us)
    b_kept = b_dropped = 0
    if expire_blocks:
        blk_dir = os.path.join(out_dir, "blocks", f"tier={tier}", f"part_id={part_id}")
        if os.path.isdir(blk_dir):
            b_kept, b_dropped = _expire_blocks(blk_dir, cutoff_us)
    return {
        "tier": tier, "part_id": part_id, "rows_kept": kept,
        "rows_dropped": dropped, "block_points_dropped": b_dropped,
    }


def retention_expire(out_dir: str, cutoffs: dict[str, object],
                     expire_blocks: bool = True,
                     max_in_flight: int = 16) -> dict:
    """Apply a per-tier retention cutoff to a flagship store.

    ``cutoffs``: tier -> timestamp-like (ISO string / datetime64); points
    with ``bucket_ts < cutoff`` are dropped from the long store and the
    Gorilla block store. Idempotent and resumable: each partition's
    manifest entry records ``expired_to_us``; re-running with the same or
    older cutoff skips the partition outright. ``max_in_flight`` bounds
    concurrent partition tasks (one partition file working set each).
    """
    manifest = Manifest(out_dir)
    todo: list[tuple] = []
    skipped = 0
    for e in manifest.entries():
        cut = cutoffs.get(e.tier)
        if cut is None:
            continue
        cut_us = _cutoff_us(cut)
        if e.expired_to_us >= cut_us:
            skipped += 1
            continue
        todo.append((e, cut_us))

    result: dict = {"parts_expired": 0, "parts_skipped": skipped, "tiers": {}}
    pending: dict = {}
    idx = 0

    def launch():
        nonlocal idx
        while idx < len(todo) and len(pending) < max_in_flight:
            e, cut_us = todo[idx]
            ref = _expire_part.remote(out_dir, e.tier, e.part_id, cut_us, expire_blocks)
            pending[ref] = (e, cut_us)
            idx += 1

    launch()
    while pending:
        done_refs, _ = ray.wait(list(pending), num_returns=1)
        ref = done_refs[0]
        e, cut_us = pending.pop(ref)
        s = ray.get(ref)
        e.output_rows = s["rows_kept"]
        e.expired_to_us = cut_us
        manifest.put(e)
        result["parts_expired"] += 1
        agg = result["tiers"].setdefault(
            e.tier, {"rows_dropped": 0, "block_points_dropped": 0}
        )
        agg["rows_dropped"] += s["rows_dropped"]
        agg["block_points_dropped"] += s["block_points_dropped"]
        launch()
    return result


# --- tier demotion: cascade-then-expire -------------------------------------

@ray.remote
def _demote_part(out_dir: str, from_tier: str, to_tier: str, part_id: int,
                 cutoff_us: int, expire_blocks: bool) -> dict:
    """One partition's demotion: cascade the sub-cutoff prefix of the
    finer tier into coarse rows, publish them ATOMICALLY into the coarse
    long layout, then expire the prefix from the finer stores.

    Crash-safe ordering: the demoted file (named by cutoff) is written
    and renamed BEFORE any expiry touches the source, and its presence
    gates recomputation — so a crash between the two steps re-runs only
    the idempotent expiry, never a cascade over a half-expired source."""
    from sits_ray.stages.cascade import cascade_partition

    long_dir = os.path.join(out_dir, "long", f"tier={from_tier}",
                            f"part_id={part_id}")
    to_dir = os.path.join(out_dir, "long", f"tier={to_tier}",
                          f"part_id={part_id}")
    os.makedirs(to_dir, exist_ok=True)
    dem_path = os.path.join(to_dir, f"demoted_{cutoff_us}.parquet")
    demoted_rows = 0
    if not os.path.exists(dem_path):
        tabs = [pq.read_table(f)
                for f in sorted(glob.glob(os.path.join(long_dir, "*.parquet")))]
        if tabs:
            t = pa.concat_tables(tabs, promote_options="default")
            old = t.filter(
                pc.less(t["bucket_ts"], pa.scalar(cutoff_us, pa.timestamp("us")))
            )
            if old.num_rows:
                old = old.append_column(
                    "part_id",
                    pa.array(np.full(old.num_rows, part_id, dtype=np.int32)),
                )
                dem = cascade_partition(old, to_tier, gapfill=False)
                dem = dem.drop_columns(["tier", "part_id"])  # hive-encoded
                demoted_rows = dem.num_rows
                fd, tmp = tempfile.mkstemp(dir=to_dir, suffix=".parquet.tmp")
                os.close(fd)
                pq.write_table(dem, tmp)
                os.replace(tmp, dem_path)
    else:
        demoted_rows = pq.read_metadata(dem_path).num_rows
    kept, dropped = _expire_long(long_dir, cutoff_us)
    b_dropped = 0
    if expire_blocks:
        blk_dir = os.path.join(out_dir, "blocks", f"tier={from_tier}",
                               f"part_id={part_id}")
        if os.path.isdir(blk_dir):
            _, b_dropped = _expire_blocks(blk_dir, cutoff_us)
    return {"part_id": part_id, "rows_kept": kept, "rows_dropped": dropped,
            "demoted_rows": demoted_rows, "block_points_dropped": b_dropped}


def retention_demote(out_dir: str, cutoff, from_tier: str = "1m",
                     to_tier: str = "1h", expire_blocks: bool = True,
                     max_in_flight: int = 16) -> dict:
    """Demote expired fine-tier history into the coarse tier — the
    classic continuous-aggregate retention policy ("keep 1m for a week,
    1h forever"): per partition, cascade the ``bucket_ts < cutoff``
    prefix of ``from_tier`` into ``to_tier`` rows
    (``stages/cascade.cascade_partition`` semantics: exact count sums,
    sequential fold of the finer latency sums, nearest-rank p95 flagged
    approximate), publish them atomically into the coarse long layout,
    then expire the prefix from the finer long + Gorilla block stores.

    ``cutoff`` must align to the coarse tier width (a partial coarse
    bucket would mix demoted and raw history — same rule as the salt
    window validation). Idempotent and resumable: the demoted file is
    keyed by cutoff and gates recomputation; the finer tier's manifest
    ``expired_to_us`` watermark skips finished partitions outright; the
    per-file expiry rewrite is a no-op on re-run."""
    from sits_ray.timeline import period_us

    cut_us = _cutoff_us(cutoff)
    w = period_us(to_tier)
    if cut_us % w != 0:
        raise ValueError(
            f"cutoff {cutoff} not aligned to the {to_tier} tier width"
        )
    manifest = Manifest(out_dir)
    todo = []
    skipped = 0
    for e in manifest.entries():
        if e.tier == to_tier:
            # a flagship-built coarse tier already covers the demoted
            # span from raw — appending cascaded rows would double-count
            raise ValueError(
                f"store already has a built {to_tier} tier; demotion "
                f"targets a tier the flagship did not build"
            )
        if e.tier != from_tier:
            continue
        if e.expired_to_us >= cut_us:
            skipped += 1
            continue
        todo.append(e)

    result = {"parts_demoted": 0, "parts_skipped": skipped,
              "rows_dropped": 0, "demoted_rows": 0,
              "block_points_dropped": 0}
    pending: dict = {}
    idx = 0

    def launch():
        nonlocal idx
        while idx < len(todo) and len(pending) < max_in_flight:
            e = todo[idx]
            ref = _demote_part.remote(out_dir, from_tier, to_tier,
                                      e.part_id, cut_us, expire_blocks)
            pending[ref] = e
            idx += 1

    launch()
    while pending:
        done_refs, _ = ray.wait(list(pending), num_returns=1)
        ref = done_refs[0]
        e = pending.pop(ref)
        s = ray.get(ref)
        e.output_rows = s["rows_kept"]
        e.expired_to_us = cut_us
        manifest.put(e)
        result["parts_demoted"] += 1
        result["rows_dropped"] += s["rows_dropped"]
        result["demoted_rows"] += s["demoted_rows"]
        result["block_points_dropped"] += s["block_points_dropped"]
        launch()
    return result
