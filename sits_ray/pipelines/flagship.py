"""Flagship retention pipeline: raw transcripts -> gap-filled 1m/1h/1d tier
tables (long Parquet, hive-partitioned by (tier, part_id)) + Gorilla block
Parquet + per-partition lineage manifests, resumable.

Mirrors the reference's regularize orchestration (``.gc_regularize``,
``R/api_gdalcubes.R:450-681``): enumerate work, skip partitions already in
the ledger (input fingerprint must match — late data invalidates exactly
the touched partitions), execute the distributed plan, append manifests.

Dataflow (one pass, streaming — nothing materializes the raw input):

    read_parquet(columns=pruned)                   # prune at the read
      -> map_batches(prepare_turns)                # vectorized derive, drop text
      [-> filter out finished part_ids]            # resume
      -> groupby(conv_id).map_groups(_conv_series) # THE shuffle; all tiers
      -> materialize nested tier series            # small vs raw (bounded by
                                                   # time-range/width per conv)
      -> branch A: nested_to_long -> write_parquet(long/, partition_cols)
      -> branch B: GorillaEncode actor pool -> write_parquet(blocks/, ...)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from sits_ray.stages.compressor import compress as compress_stage
from sits_ray.stages.regularize import (
    nested_to_long,
    prepare_turns,
    rollup_nested,
)
from sits_ray.state.manifest import Manifest, PartEntry, clean_partition_dirs

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "tool", "ts"]


def run_flagship(
    input_path: str,
    out_dir: str,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    n_parts: int = 32,
    resume: bool = True,
    write_blocks: bool = True,
    gapfill: bool = True,
    dedup: bool = False,
    encoder_concurrency: int | tuple[int, int] = (1, 4),
) -> dict:
    """Run (or resume) the full rollup. Returns summary metrics."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)

    ds = rd.read_parquet(input_path, columns=TRANSCRIPT_COLUMNS)
    prepared = ds.map_batches(
        prepare_turns, batch_format="pyarrow", fn_kwargs=dict(n_parts=n_parts)
    )

    # input fingerprint: rows per hash partition (tiny aggregate)
    counts = prepared.groupby("part_id").aggregate(Count(alias_name="n")).take_all()
    input_rows_by_part = {int(r["part_id"]): int(r["n"]) for r in counts}

    done: set[int] = set()
    if resume:
        done = manifest.done_parts(input_rows_by_part, tiers)
    todo = set(input_rows_by_part) - done
    # stale or partial outputs for partitions being rebuilt are removed first
    manifest.invalidate(todo, tiers)
    clean_partition_dirs(os.path.join(out_dir, "long"), tiers, todo)
    clean_partition_dirs(os.path.join(out_dir, "blocks"), tiers, todo)

    result = {
        "parts_total": len(input_rows_by_part),
        "parts_skipped": len(done),
        "parts_built": len(todo),
        "tiers": {},
    }
    if not todo:
        return result

    if done:
        todo_arr = pa.array(sorted(todo), pa.int32())
        prepared = prepared.map_batches(
            lambda t: t.filter(pc.is_in(t["part_id"], value_set=todo_arr)),
            batch_format="pyarrow",
        )

    nested = rollup_nested(prepared, tiers=tiers, gapfill=gapfill, dedup=dedup)
    nested = nested.materialize()

    long_ds = nested_to_long(nested)
    long_ds.write_parquet(
        os.path.join(out_dir, "long"), partition_cols=["tier", "part_id"]
    )
    if write_blocks:
        blocks = compress_stage(nested, concurrency=encoder_concurrency)
        blocks.write_parquet(
            os.path.join(out_dir, "blocks"), partition_cols=["tier", "part_id"]
        )

    # lineage entries per (tier, part): output rows + conv counts
    stats = (
        nested.groupby(["tier", "part_id"])
        .aggregate(Count(alias_name="n_series"))
        .take_all()
    )
    rows = (
        nested_to_long(nested)
        .groupby(["tier", "part_id"])
        .aggregate(Count(alias_name="n_rows"))
        .take_all()
    )
    rows_by = {(r["tier"], int(r["part_id"])): int(r["n_rows"]) for r in rows}
    for s in stats:
        tier, part_id = s["tier"], int(s["part_id"])
        files_dir = os.path.join(out_dir, "long", f"tier={tier}", f"part_id={part_id}")
        files = sorted(os.listdir(files_dir)) if os.path.isdir(files_dir) else []
        manifest.put(
            PartEntry(
                tier=tier,
                part_id=part_id,
                input_rows=input_rows_by_part.get(part_id, 0),
                output_rows=rows_by.get((tier, part_id), 0),
                n_convs=int(s["n_series"]),
                files=files,
            )
        )
        result["tiers"].setdefault(tier, 0)
        result["tiers"][tier] += rows_by.get((tier, part_id), 0)
    return result


def read_tier(out_dir: str, tier: str):
    """Read one tier's long table back (partition-pruned at the read)."""
    return rd.read_parquet(os.path.join(out_dir, "long", f"tier={tier}"))
