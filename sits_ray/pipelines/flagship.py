"""Flagship retention pipeline: raw transcripts -> gap-filled 1m/1h/1d tier
tables (long Parquet, hive-partitioned by (tier, part_id)) + Gorilla block
Parquet + per-partition lineage manifests, resumable.

Mirrors the reference's regularize orchestration (``.gc_regularize``,
``R/api_gdalcubes.R:450-681``): enumerate work, skip partitions already in
the ledger (input fingerprint must match — late data invalidates exactly
the touched partitions), execute the distributed plan, append manifests.

Physical plan (fused exchange; see ``sits_ray/stages/exchange.py`` for why
the shuffle is an explicit map-reduce rather than ``Dataset.groupby``):

    stage 1 (task per input file): read(pruned) -> prepare_turns ->
        hash-split by part_id  [fingerprint counts fall out for free]
    [manifest diff decides which partitions to (re)build]
    stage 2 (task per partition): concat -> _part_series (all tiers, one
        vectorized pass) -> explode -> Gorilla encode -> atomic
        per-partition Parquet writes (long/ + blocks/) -> stats row

The unfused composable Dataset path (``rollup_tiers`` ->
``nested_to_long`` / ``compress`` actor pool) remains the API used by the
query layer and tests; this module is the throughput-optimized retention
job built from the same kernels.
"""

from __future__ import annotations

import glob
import os
import time

import ray.data as rd

from sits_ray.stages.exchange import rollup_exchange_fused
from sits_ray.state.manifest import Manifest, PartEntry, clean_partition_dirs

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "tool", "ts"]


def run_flagship(
    input_path: str,
    out_dir: str,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    n_parts: int | str = 32,
    resume: bool = True,
    write_blocks: bool = True,
    gapfill: bool = True,
    dedup: bool = False,
    salt_turn_threshold: int | None = None,
    salt_window_us: int = 7 * 86_400_000_000,
    stage2_num_cpus: float = 1,
    part_budget_bytes: int = 512 * 1024 * 1024,
) -> dict:
    """Run (or resume) the full rollup. Returns summary metrics.

    ``n_parts="auto"`` derives the partition count from input bytes so a
    stage-2 task's working set stays under ``part_budget_bytes``
    (stages/exchange.optimal_n_parts — the reference's
    ``.jobs_optimal_block`` rule). NOTE: resume compares per-partition
    fingerprints, so a changed n_parts re-keys every partition — pass an
    explicit count when appending to an existing store."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    phases: dict[str, float] = {}
    result: dict = {"tiers": {}, "phases": phases}
    # transform-config fingerprint (r4 review): outputs built under
    # different settings must rebuild even when the INPUT fingerprint
    # matches — e.g. write_blocks False->True or a dedup flip
    config_fp = json.dumps(
        {"tiers": list(tiers), "gapfill": gapfill, "dedup": dedup,
         "write_blocks": write_blocks,
         "salt": [salt_turn_threshold, salt_window_us]},
        sort_keys=True,
    )

    paths = (
        sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        if os.path.isdir(input_path)
        else [input_path]
    )
    if n_parts == "auto":
        from sits_ray.stages.exchange import optimal_n_parts

        n_parts = optimal_n_parts(paths, part_budget_bytes=part_budget_bytes)
        result["n_parts"] = n_parts

    state: dict = {}

    def decide(input_rows_by_part: dict[int, int],
               input_chk_by_part: dict[int, int] | None = None) -> set[int]:
        done: set[int] = set()
        if resume:
            done = manifest.done_parts(
                input_rows_by_part, tiers, input_chk_by_part,
                config_fp=config_fp,
            )
        todo = set(input_rows_by_part) - done
        # stale or partial outputs for rebuilt partitions are removed first
        manifest.invalidate(todo, tiers)
        clean_partition_dirs(os.path.join(out_dir, "long"), tiers, todo)
        clean_partition_dirs(os.path.join(out_dir, "blocks"), tiers, todo)
        # ghost partitions (ADVICE r1): in the ledger but absent from the
        # new input fingerprint — changed data emptied them; read_tier must
        # not serve their stale rows
        ghost = {
            e.part_id for e in manifest.entries() if e.tier in tiers
        } - set(input_rows_by_part)
        if ghost:
            # dirs FIRST, ledger last (r4 review): ghost detection is
            # derived from the ledger, so deleting entries before dirs
            # leaves orphaned data forever if we crash in between;
            # this order is self-healing (entries still present -> ghost
            # recomputed -> dirs re-cleaned on the next run)
            clean_partition_dirs(os.path.join(out_dir, "long"), tiers, ghost)
            clean_partition_dirs(os.path.join(out_dir, "blocks"), tiers, ghost)
            manifest.invalidate(ghost, tiers)
        state["done"] = done
        state["todo"] = todo
        state["chk"] = input_chk_by_part or {}
        state["rows"] = dict(input_rows_by_part)
        return todo

    def commit_part(rows: list[dict]) -> None:
        # called by the exchange the moment one partition's files are on
        # disk (r4 review): a driver crash or a failed sibling partition
        # costs ONE partition of resume credit, not the whole run
        for s2 in rows:
            tier, part_id = s2["tier"], int(s2["part_id"])
            files_dir = os.path.join(
                out_dir, "long", f"tier={tier}", f"part_id={part_id}"
            )
            files = sorted(
                f for f in os.listdir(files_dir) if f.endswith(".parquet")
            ) if os.path.isdir(files_dir) else []
            manifest.put(
                PartEntry(
                    tier=tier,
                    part_id=part_id,
                    input_rows=state.get("rows", {}).get(part_id, 0),
                    output_rows=int(s2["n_rows"]),
                    n_convs=int(s2["n_series"]),
                    files=files,
                    input_checksum=int(state.get("chk", {}).get(part_id, 0)),
                    config_fp=config_fp,
                )
            )

    t0 = time.perf_counter()
    stats_rows, input_rows_by_part, cpu_meta = rollup_exchange_fused(
        paths,
        out_dir,
        tiers=tiers,
        gapfill=gapfill,
        dedup=dedup,
        n_parts=n_parts,
        columns=TRANSCRIPT_COLUMNS,
        write_blocks=write_blocks,
        decide_parts=decide,
        salt_turn_threshold=salt_turn_threshold,
        salt_window_us=salt_window_us,
        stage2_num_cpus=stage2_num_cpus,
        on_part_done=commit_part,
    )
    phases["exchange_fused"] = round(time.perf_counter() - t0, 2)
    phases.update(cpu_meta)  # per-stage worker CPU seconds (scaling audit)

    result.update(
        parts_total=len(input_rows_by_part),
        parts_skipped=len(state["done"]),
        parts_built=len(state["todo"]),
    )

    for s in stats_rows:  # manifests were committed per-partition above
        tier = s["tier"]
        result["tiers"].setdefault(tier, 0)
        result["tiers"][tier] += int(s["n_rows"])
    # include rows of partitions that were skipped via resume in the totals
    for e in manifest.entries():
        if e.part_id in state["done"] and e.tier in tiers:
            result["tiers"][e.tier] = result["tiers"].get(e.tier, 0) + e.output_rows
    return result


def read_tier(out_dir: str, tier: str):
    """Read one tier's long table back (partition-pruned at the read)."""
    return rd.read_parquet(os.path.join(out_dir, "long", f"tier={tier}"))


def read_tier_blocks(out_dir: str, tier: str, concurrency=(1, 4)):
    """Decode-on-read: the compressed Gorilla block store -> long tier rows
    (bit-exact with ``read_tier``; the `long/` copy exists for engines that
    can't decode blocks — at scale you keep only `blocks/` plus coarse
    long tiers)."""
    from sits_ray.stages.compressor import decompress
    from sits_ray.stages.regularize import nested_to_long

    blocks = rd.read_parquet(os.path.join(out_dir, "blocks", f"tier={tier}"))

    def fix_types(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        # hive partition columns come back as dictionary/string
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name == "tier":
                col = pc.cast(col, pa.string())
            elif name == "part_id":
                col = pc.cast(col, pa.int32())
            cols[name] = col
        return pa.table(cols)

    blocks = blocks.map_batches(fix_types, batch_format="pyarrow")
    return nested_to_long(decompress(blocks, concurrency=concurrency))
