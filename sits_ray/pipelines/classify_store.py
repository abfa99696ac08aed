"""Resumable block classification — the ``sits_classify.raster_cube``
analog (``R/sits_classify.R:162-197``, block skip-if-done
``R/api_classify.R:120-122``): score a partitioned vector store into a
probability store, one output block per input file, each block recorded
in the same manifest ledger the flagship uses — a crashed or re-run job
skips blocks whose input fingerprint (row count + order-independent id
checksum) is unchanged, rebuilds exactly the touched ones.

Physical plan (raw Ray tasks, one per input file — the Dataset API has no
per-file resume boundary, and the block IS the reference's unit of work):

    fingerprint pass (task per file): footer row count + id-column
        checksum  [cheap: reads one thin column]
    [manifest diff -> todo files]
    score pass (task per todo file): read(pruned) -> chunked vectorized
        scoring with the broadcast model (ray.put once, fetched per task,
        zero-copy numpy) -> atomic per-block Parquet + manifest entry

At cluster scale each task reads only its own file and writes only its
own block directory; the manifest directory is the single shared-storage
coordination point (same assumption as the flagship store).
"""

from __future__ import annotations

import glob
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from sits_ray.state.manifest import Manifest, PartEntry

_TIER = "probs"  # manifest namespace for the probability store

_HASH_P = np.uint64((1 << 61) - 1)
_HASH_R = np.uint64(2_654_435_761)


def _id_checksum(ids: np.ndarray) -> int:
    """Order-independent content checksum of the block's id column."""
    with np.errstate(over="ignore"):
        h = (ids.astype(np.uint64) * _HASH_R) % _HASH_P
        return int(h.sum() % _HASH_P)


@ray.remote
def _fingerprint_file(path: str, id_col: str) -> tuple[int, int]:
    t = pq.read_table(path, columns=[id_col])
    return t.num_rows, _id_checksum(t[id_col].to_numpy())


@ray.remote
def _score_file(
    path: str,
    part_id: int,
    out_dir: str,
    model_ref,
    vec_col: str,
    id_col: str,
    batch_rows: int,
) -> dict:
    from sits_ray.stages.classify import SeriesScorer

    scorer = SeriesScorer(model_ref, vec_col=vec_col, id_col=id_col)
    t = pq.read_table(path, columns=[id_col, vec_col])
    if t.num_rows == 0:
        # empty input block: record it in the ledger, write nothing
        # (read_probs reads only existing part dirs)
        return {"part_id": part_id, "input_rows": 0, "output_rows": 0,
                "input_checksum": 0}
    out = pa.concat_tables(
        scorer(t.slice(o, batch_rows)) for o in range(0, t.num_rows, batch_rows)
    )
    dest = os.path.join(out_dir, _TIER, f"part_id={part_id}")
    os.makedirs(dest, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dest, suffix=".tmp")
    os.close(fd)
    pq.write_table(out, tmp, compression="zstd")
    os.replace(tmp, os.path.join(dest, "part-0.parquet"))
    return {
        "part_id": part_id,
        "input_rows": t.num_rows,
        "output_rows": out.num_rows,
        "input_checksum": _id_checksum(t[id_col].to_numpy()),
    }


def run_classify_store(
    input_path: str,
    out_dir: str,
    model: dict,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    resume: bool = True,
    batch_rows: int = 4096,
) -> dict:
    """Score every input file into ``out_dir/probs/part_id=N/`` blocks,
    skipping blocks already present with a matching input fingerprint."""
    paths = (
        sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        if os.path.isdir(input_path)
        else [input_path]
    )
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)

    fps = ray.get([_fingerprint_file.remote(p, id_col) for p in paths])
    todo: list[int] = []
    for i, (n_rows, chk) in enumerate(fps):
        e = manifest.get(_TIER, i)
        blk = os.path.join(out_dir, _TIER, f"part_id={i}", "part-0.parquet")
        if (
            resume
            and e is not None
            and e.input_rows == n_rows
            and e.input_checksum == chk
            and os.path.exists(blk)
        ):
            continue
        todo.append(i)
    manifest.invalidate(set(todo), (_TIER,))

    model_ref = ray.put(model)
    stats = ray.get(
        [
            _score_file.remote(
                paths[i], i, out_dir, model_ref, vec_col, id_col, batch_rows
            )
            for i in todo
        ]
    )
    for s in stats:
        manifest.put(
            PartEntry(
                tier=_TIER,
                part_id=int(s["part_id"]),
                input_rows=int(s["input_rows"]),
                output_rows=int(s["output_rows"]),
                n_convs=int(s["output_rows"]),
                files=["part-0.parquet"],
                input_checksum=int(s["input_checksum"]),
            )
        )
    done = len(paths) - len(todo)
    return {"blocks_total": len(paths), "blocks_built": len(todo),
            "blocks_skipped": done}


def read_probs(out_dir: str):
    """Probability store back as a Dataset (partition-pruned read)."""
    return rd.read_parquet(os.path.join(out_dir, _TIER))
