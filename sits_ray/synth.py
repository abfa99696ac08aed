"""Deterministic synthetic transcript generator (seed=42, per FIXTURES.md).

Produces the authoritative input shape from BASELINE.json ``input_hint``:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Mirrors the reference's packaged-fixture strategy (``/root/reference/data/``,
documented ``R/data.R:3-78``): small deterministic inputs for unit tests,
the same generator scaled up for bench. Fully vectorized numpy; writes
multiple Parquet files so ``ray.data.read_parquet`` parallelizes the read.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = np.int64(1_748_736_000_000_000)  # 2025-06-01T00:00:00Z in microseconds
WINDOW_DAYS = 30
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "exec", "read", "write", "browse", "edit"])
_VOCAB = None


def _vocab(rng: np.random.Generator) -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        lens = rng.integers(3, 10, size=1000)
        _VOCAB = np.array(["".join(letters[rng.integers(0, 26, size=ln)]) for ln in lens])
    return _VOCAB


def generate_transcripts(
    n_convs: int = 50,
    mean_turns: int = 25,
    seed: int = 42,
    mega_conv: bool = True,
    dup_turns: int = 0,
    conv_offset: int = 0,
) -> pa.Table:
    """Deterministic transcript table.

    ``mega_conv=True`` inflates conv 0 so it holds ~30% of all turns (skew /
    salting tests). ``dup_turns`` appends that many duplicated rows
    (dedup tests).
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(np.random.default_rng(1234))

    n_turns = np.maximum(
        1, rng.lognormal(np.log(mean_turns), 0.6, size=n_convs).astype(np.int64)
    )
    if n_convs > 0:
        n_turns[rng.integers(0, n_convs)] = 1  # one single-turn conv
    if mega_conv and n_convs > 1:
        n_turns[0] = max(n_turns[0], int(0.45 * n_turns.sum()))
    total = int(n_turns.sum())

    conv_idx = np.repeat(np.arange(n_convs), n_turns)
    conv_id = np.char.add(
        "conv", np.char.zfill((conv_idx + conv_offset).astype(str), 8)
    )
    offsets = np.concatenate([[0], np.cumsum(n_turns)])
    turn_idx = (np.arange(total) - offsets[conv_idx]).astype(np.int32)

    role = ROLES[(turn_idx + rng.integers(0, 3, size=total)) % 3]

    # tool column: "" unless the turn is tool-ish; Zipf-weighted tool names
    zipf_w = 1.0 / np.arange(1, len(TOOLS) + 1)
    zipf_w /= zipf_w.sum()
    is_tool = rng.random(total) < 0.25
    tool = np.where(is_tool, rng.choice(TOOLS, size=total, p=zipf_w), "")

    # timestamps: per-conv start uniform in a 30-day window; lognormal gaps
    # (median ~20 s, heavy tail), strictly increasing with turn_idx
    conv_start = BASE_TS_US + rng.integers(
        0, WINDOW_DAYS * 86_400_000_000, size=n_convs, dtype=np.int64
    )
    gaps_us = np.maximum(
        1, (rng.lognormal(np.log(20.0), 1.6, size=total) * 1e6).astype(np.int64)
    )
    gaps_us[offsets[:-1]] = 0  # first turn of each conv sits at conv_start
    # inject one >1h silence gap into a mid-sized conv (gap-fill tests)
    big = np.flatnonzero(n_turns >= 5)
    if big.size:
        j = offsets[big[0]] + 2
        gaps_us[j] = np.int64(3 * 3600 * 1_000_000)
    csum = np.cumsum(gaps_us)
    # segment-local cumulative gap sum (first gap of each conv is 0)
    ts = conv_start[conv_idx] + (csum - np.repeat(csum[offsets[:-1]], n_turns))

    # text: seeded pseudo-text, ~lognormal length (mean ~200 chars), built
    # as a vectorized gather of random slices from a word-pool buffer and
    # assembled directly into an Arrow StringArray (offsets + one value
    # buffer) — no per-row Python joins, so 10^7-turn bench inputs
    # generate in seconds
    pool = (" ".join(_vocab(np.random.default_rng(99)).tolist()) + " ") * 4
    pool_arr = np.frombuffer(pool.encode("ascii"), dtype=np.uint8)
    text_len = np.clip(
        rng.lognormal(np.log(190.0), 0.5, size=total), 8, 1600
    ).astype(np.int64)
    starts_pool = rng.integers(0, pool_arr.size - 1601, size=total)
    t_off = np.concatenate([[0], np.cumsum(text_len)])
    # assemble the value buffer in bounded chunks (fresh-page faults are
    # expensive in this sandbox; ~40 MB working set per chunk)
    bufs = []
    CH = 200_000
    for a in range(0, total, CH):
        b = min(a + CH, total)
        lens_c = text_len[a:b]
        off_c = np.concatenate([[0], np.cumsum(lens_c)])
        flat = np.repeat(starts_pool[a:b], lens_c) + (
            np.arange(int(off_c[-1])) - np.repeat(off_c[:-1], lens_c)
        )
        bufs.append(pool_arr[flat].tobytes())
    # int32 string offsets wrap silently past 2 GiB of text per call
    # (ADVICE r1): fail loudly instead of building a corrupt StringArray
    if int(t_off[-1]) >= 2**31:
        raise ValueError(
            f"text payload {int(t_off[-1])} bytes exceeds int32 StringArray "
            "offsets; generate with more files (smaller per-file payload)"
        )
    text_arr = pa.StringArray.from_buffers(
        length=total,
        value_offsets=pa.py_buffer(t_off.astype(np.int32).tobytes()),
        data=pa.py_buffer(b"".join(bufs)),
    )

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": text_arr,
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    if dup_turns > 0:
        take = rng.integers(0, total, size=dup_turns)
        tbl = pa.concat_tables([tbl, tbl.take(pa.array(take))])
    return tbl


def write_transcripts_scaled(
    out_dir: str,
    n_convs: int,
    mean_turns: int = 40,
    seed: int = 42,
    files: int = 32,
) -> str:
    """Bench-scale writer: convs split across ``files`` Parquet parts, each
    generated independently (chunked — bounded memory at 10^7+ turns).
    Deterministic per (n_convs, mean_turns, seed, files); idempotent via a
    _SUCCESS marker. The mega-conversation lives in part 0 only."""
    marker = os.path.join(out_dir, "_SUCCESS")
    tag = f"scaled:{n_convs}:{mean_turns}:{seed}:{files}"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per = (n_convs + files - 1) // files
    jobs = []
    off = 0
    for i in range(files):
        n = min(per, n_convs - off)
        if n <= 0:
            break
        jobs.append((i, n, off))
        off += n

    def _gen_one(i: int, n: int, off: int) -> None:
        tbl = generate_transcripts(
            n_convs=n, mean_turns=mean_turns, seed=seed + i,
            mega_conv=(i == 0), conv_offset=off,
        )
        pq.write_table(tbl, os.path.join(out_dir, f"part-{i:04d}.parquet"))

    try:
        import ray

        parallel = ray.is_initialized() and len(jobs) > 1
    except ImportError:
        parallel = False
    if parallel:
        gen = ray.remote(_gen_one)
        ray.get([gen.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _gen_one(*j)
    with open(marker, "w") as fh:
        fh.write(tag)
    return out_dir


def write_transcripts(
    out_dir: str,
    n_convs: int = 50,
    mean_turns: int = 25,
    seed: int = 42,
    files: int = 4,
    **kw,
) -> str:
    """Write the generated table as ``files`` Parquet parts; idempotent
    (skips if a _SUCCESS marker exists with matching params)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    tag = f"{n_convs}:{mean_turns}:{seed}:{files}:{sorted(kw.items())}"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_transcripts(n_convs=n_convs, mean_turns=mean_turns, seed=seed, **kw)
    n = tbl.num_rows
    step = max(1, (n + files - 1) // files)
    for i in range(files):
        part = tbl.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(out_dir, f"part-{i:04d}.parquet"))
    with open(marker, "w") as fh:
        fh.write(tag)
    return out_dir
