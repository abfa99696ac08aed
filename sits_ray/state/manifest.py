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
import dataclasses
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
    #: fingerprint of the TRANSFORM configuration the outputs were built
    #: under (r4 review: resume must not serve outputs built with
    #: different gapfill/dedup/write_blocks/salt settings just because
    #: the input matched)
    config_fp: str = ""


def _fsync_dir(d: str) -> None:
    """fsync a directory so a just-renamed file survives power loss (an
    os.replace alone is atomic but NOT durable on ext4/xfs)."""
    try:
        fd = os.open(d, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


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
        return self._load(p)

    @staticmethod
    def _load(p: str) -> PartEntry | None:
        """A corrupt/truncated ledger file (crash before the rename's
        data hit disk) is treated as ABSENT — the partition rebuilds —
        instead of wedging every future resume with a JSONDecodeError
        (r4 review). Unknown keys from future fields are dropped, known
        missing ones take their defaults."""
        try:
            with open(p) as fh:
                d = json.load(fh)
            fields = {f.name for f in dataclasses.fields(PartEntry)}
            return PartEntry(**{k: v for k, v in d.items() if k in fields})
        except (json.JSONDecodeError, TypeError, OSError, ValueError):
            return None

    def put(self, entry: PartEntry) -> None:
        p = self._path(entry.tier, entry.part_id)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(asdict(entry), fh)
            fh.flush()
            os.fsync(fh.fileno())  # durable BEFORE the rename publishes it
        os.replace(tmp, p)
        _fsync_dir(self.dir)  # make the rename itself durable

    def entries_map(self) -> dict:
        """One directory pass -> {(tier, part_id): entry} (r4 review:
        done_parts opened one file per (partition, tier); at 65k parts x
        3 tiers that is ~200k syscalls per no-op resume)."""
        out: dict = {}
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                e = self._load(os.path.join(self.dir, f))
                if e is not None:
                    out[(e.tier, int(e.part_id))] = e
        return out

    def entries(self) -> list[PartEntry]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                e = self._load(os.path.join(self.dir, f))
                if e is not None:
                    out.append(e)
        return out

    def done_parts(self, input_rows_by_part: dict[int, int], tiers: tuple[str, ...],
                   input_chk_by_part: dict[int, int] | None = None,
                   config_fp: str | None = None) -> set[int]:
        """Partitions complete for ALL tiers with matching input fingerprint
        (row count AND, when provided, content checksum) AND — when
        provided — the same transform-config fingerprint (outputs built
        under different gapfill/dedup/salt/blocks settings must rebuild
        even on identical input; r4 review)."""
        done: set[int] = set()
        led = self.entries_map()
        for part_id, n_in in input_rows_by_part.items():
            ok = True
            for tier in tiers:
                e = led.get((tier, int(part_id)))
                if e is None or e.input_rows != int(n_in):
                    ok = False
                    break
                if input_chk_by_part is not None and e.input_checksum != int(
                    input_chk_by_part.get(part_id, 0)
                ):
                    ok = False
                    break
                if config_fp is not None and e.config_fp != config_fp:
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
