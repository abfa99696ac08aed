"""Per-partition lineage manifests — the resume ledger.

The reference resumes by using the output directory as a filesystem
ledger: skip a job if its output file exists (regularize
``R/api_regularize.R:134-145``, classify blocks ``R/api_classify.R:120-122``)
and re-derive missing jobs by diffing desired vs present
(``R/api_gdalcubes.R:506-513``). We make the ledger explicit: one JSON
entry per (tier, part_id) hash partition recording the input fingerprint
(row count per partition — late/changed data invalidates exactly the
touched partitions, SURVEY.md §7.5), output row count and file list.

Entries are written atomically (tmp + rename) AFTER the partition's
Parquet is on disk, so a crash between write and manifest re-runs that
partition idempotently.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import asdict, dataclass


@dataclass
class PartEntry:
    tier: str
    part_id: int
    input_rows: int
    output_rows: int
    n_convs: int
    files: list[str]
    #: order-independent content checksum of the partition's input rows
    #: (count+hash fingerprint, SURVEY.md §7.5): same-count late data with
    #: different content invalidates the partition too (VERDICT r1 #10)
    input_checksum: int = 0
    #: retention watermark (pipelines/retention.py): points before this
    #: epoch-us cutoff have been expired from the partition's outputs; a
    #: re-run with cutoff <= watermark skips the partition (idempotent)
    expired_to_us: int = 0


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifests")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, tier: str, part_id: int) -> str:
        return os.path.join(self.dir, f"{tier}-{part_id:05d}.json")

    def get(self, tier: str, part_id: int) -> PartEntry | None:
        p = self._path(tier, part_id)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return PartEntry(**json.load(fh))

    def put(self, entry: PartEntry) -> None:
        p = self._path(entry.tier, entry.part_id)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(asdict(entry), fh)
        os.replace(tmp, p)

    def entries(self) -> list[PartEntry]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    out.append(PartEntry(**json.load(fh)))
        return out

    def done_parts(self, input_rows_by_part: dict[int, int], tiers: tuple[str, ...],
                   input_chk_by_part: dict[int, int] | None = None) -> set[int]:
        """Partitions complete for ALL tiers with matching input fingerprint
        (row count AND, when provided, content checksum)."""
        done: set[int] = set()
        for part_id, n_in in input_rows_by_part.items():
            ok = True
            for tier in tiers:
                e = self.get(tier, int(part_id))
                if e is None or e.input_rows != int(n_in):
                    ok = False
                    break
                if input_chk_by_part is not None and e.input_checksum != int(
                    input_chk_by_part.get(part_id, 0)
                ):
                    ok = False
                    break
            if ok:
                done.add(int(part_id))
        return done

    def invalidate(self, part_ids: set[int], tiers: tuple[str, ...]) -> None:
        for part_id in part_ids:
            for tier in tiers:
                p = self._path(tier, part_id)
                if os.path.exists(p):
                    os.remove(p)


def clean_partition_dirs(root: str, tiers: tuple[str, ...], part_ids: set[int]) -> None:
    """Remove (possibly partial) hive dirs for partitions about to be rebuilt."""
    for tier in tiers:
        for part_id in part_ids:
            d = os.path.join(root, f"tier={tier}", f"part_id={part_id}")
            if os.path.isdir(d):
                shutil.rmtree(d)
