"""Explicit hash-partition exchange for the flagship rollup.

WHY raw Ray tasks here (the documented last-resort, used deliberately):
the rollup needs a *hash partition* exchange — all rows of a partition in
one place, no ordering between partitions — but ``Dataset.groupby`` in
local Ray implements it as a sample-sort whose cost grows superlinearly
with block count (measured on 9.6M rows: 8 blocks -> 7s, 64 blocks ->
70s; the hash-shuffle strategy measured 54s). Few-large-blocks keeps the
sort fast but caps parallelism at the block count, which destroyed
N->4N scaling (eff 0.4). A classic two-stage map-reduce exchange through
the object store gives file x partition parallelism with zero sort:

    stage 1 (one task per input file):  read(pruned) -> prepare_turns ->
        split by part_id -> n_parts separate object refs + a counts row
    stage 2 (one task per partition):   concat that partition's chunks
        from every file -> _part_series (vectorized kernel)

The results re-enter Ray Data via ``from_arrow_refs`` so everything
downstream (explode, Gorilla actor pool, partitioned writes) stays on the
Dataset API. Partitioning assumptions: inputs are a directory of Parquet
files (file count >= CPUs for full stage-1 parallelism — the generator
writes 32+ parts); partition chunks for one file fit in worker memory
(bounded by file size). Task retries cover worker failure; the manifest
diff covers driver restart (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from sits_ray.stages.regularize import _part_series, prepare_turns


def _validate_salt_window(salt_turn_threshold, salt_window_us, tiers):
    """CLAUDE.md invariant, now ENFORCED (ADVICE r1): the salt window must
    be a multiple of every tier width, else a tier bucket can span two salt
    groups and emit duplicate (conv, tier, bucket) rows with partial
    aggregates."""
    if not salt_turn_threshold:
        return
    from sits_ray.stages.regularize import TIER_WIDTH_US

    for t in tiers:
        w = TIER_WIDTH_US[t]
        if salt_window_us % w != 0:
            raise ValueError(
                f"salt_window_us={salt_window_us} is not a multiple of tier "
                f"{t!r} width {w}; aggregates would be split across salt groups"
            )


def optimal_n_parts(
    paths: list[str],
    part_budget_bytes: int = 512 * 1024 * 1024,
    expansion: float = 4.0,
    min_parts: int | None = None,
    max_parts: int = 65_536,
) -> int:
    """Partition count from INPUT BYTES (VERDICT r2 next #10; the
    reference sizes its processing blocks from memory-per-core the same
    way, ``.jobs_optimal_block``, ``R/api_jobs.R:24-63``): stage 2
    concatenates one whole partition per task, so the partition's
    in-memory size (compressed input x ``expansion`` for parquet->arrow
    decode / ``x n_parts``) must stay under a worker's budget.

    ``min_parts`` defaults to the session CPU count (stage-2 parallelism
    floor); the result is the smallest count that satisfies both."""
    import math
    import os

    total = sum(os.path.getsize(p) for p in paths)
    if min_parts is None:
        import ray as _ray

        min_parts = (
            int(_ray.cluster_resources().get("CPU", 8))
            if _ray.is_initialized()
            else 8
        )
    need = math.ceil(total * expansion / max(part_budget_bytes, 1))
    return int(np.clip(max(need, min_parts), 1, max_parts))


def _heavy_counts_one(path: str, key: str, floor: int):
    """Per-file candidate counts for global heavy-conv detection: one
    conv-id-column read, value counts filtered to >= floor."""
    t = pq.read_table(path, columns=[key])
    vc = pa.compute.value_counts(t[key].combine_chunks())
    counts = vc.field("counts").to_numpy()
    sel = counts >= floor
    return vc.field("values").take(pa.array(np.flatnonzero(sel))).to_pylist(), counts[sel]


def _heavy_windows_one(path: str, key: str, ts_col: str, window_us: int,
                       heavy: frozenset):
    """Distinct (conv, window) pairs of the heavy convs in one file."""
    t = pq.read_table(path, columns=[key, ts_col])
    conv = t[key].combine_chunks()
    mask = pa.compute.is_in(conv, value_set=pa.array(list(heavy), conv.type))
    t = t.filter(mask)
    if t.num_rows == 0:
        return []
    w = t[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64) // window_us
    names = t[key].to_pylist()
    return list({(n, int(x)) for n, x in zip(names, w)})


def detect_heavy_convs(paths, threshold: int, key: str = "conv_id",
                       ts_col: str = "ts",
                       window_us: int = 7 * 86_400_000_000,
                       candidate_floor: int | None = None):
    """Global mega-conversation detection across ALL input files
    (VERDICT r2 next #5: the per-file heuristic salts inconsistently when
    a heavy conv spans files — the same (conv, bucket) would then be
    emitted from two partitions with partial aggregates).

    Pass 1 (conv-id column only): each file returns convs with >=
    ``candidate_floor`` rows (default ``threshold // 256``, min 1); the
    driver sums candidates — totals >= threshold are heavy. Detection
    bound (documented): a conv spread so evenly that no file holds
    threshold/256 of its turns is missed; lower ``candidate_floor`` for
    pathological spreads. Missing a heavy conv costs partition balance,
    never correctness — what correctness requires is that every file
    salts the SAME set, which this global set guarantees.

    Pass 2 (heavy convs only): distinct (conv, salt-window) pairs, from
    which the WINDOW SUCCESSION map is built — each file routes the donor
    of its last row in window w to the conv's global next window, so the
    kernel's max-ts donor is the true global predecessor even when the
    predecessor lives in another file.

    Returns ``(heavy_set, succ_map)`` with
    ``succ_map[conv][w] = next window of conv after w``."""
    import ray as _ray

    if candidate_floor is None:
        candidate_floor = max(1, threshold // 256)
    counts_fn = _ray.remote(_heavy_counts_one)
    res = _ray.get([counts_fn.remote(p, key, candidate_floor) for p in paths])
    totals: dict = {}
    for names, counts in res:
        for n, c in zip(names, counts):
            totals[n] = totals.get(n, 0) + int(c)
    heavy = frozenset(n for n, c in totals.items() if c >= threshold)
    succ_map: dict = {}
    if heavy:
        win_fn = _ray.remote(_heavy_windows_one)
        pair_lists = _ray.get(
            [win_fn.remote(p, key, ts_col, window_us, heavy) for p in paths]
        )
        windows: dict = {}
        for pairs in pair_lists:
            for n, w in pairs:
                windows.setdefault(n, set()).add(w)
        for n, ws in windows.items():
            ordered = sorted(ws)
            succ_map[n] = {
                a: b for a, b in zip(ordered[:-1], ordered[1:])
            }
    return heavy, succ_map


#: stage-1 emits ``n_tasks x (n_parts + 2)`` object refs; beyond this
#: many the driver's per-ref bookkeeping (submission latency + ref-table
#: memory, measured in BASELINE.md "ref fan-out" table) outweighs the
#: extra read parallelism, so files coalesce into groups. The floor of
#: session-CPU groups keeps stage-1 parallelism intact either way.
DEFAULT_MAX_STAGE1_REFS = 262_144


def _coalesce_paths(paths, n_parts: int, max_stage1_refs: int | None,
                    min_groups: int | None = None) -> list[list[str]]:
    """Bound stage 1's object-ref fan-out (VERDICT r4 "at-scale design
    risk"): with ``n_files x n_parts`` refs past ``max_stage1_refs``,
    hash-free CONTIGUOUS grouping of the path list (preserves any
    time/key ordering of the input layout for locality) shrinks the ref
    matrix to ``n_groups x n_parts``. Grouping never changes results:
    stage 2 concatenates per-partition chunks across tasks and every
    per-task artifact (counts, order-independent checksums, donors
    under GLOBAL heavy_info) is a commutative merge — pinned by
    test_exchange_coalesce byte-identity.

    ``min_groups`` (default: session CPUs) floors stage-1 parallelism;
    when the floor wins, refs = min_groups x n_parts > max_stage1_refs
    by design (parallelism is worth more than the last refs)."""
    if max_stage1_refs is None or len(paths) * n_parts <= max_stage1_refs:
        return [[p] for p in paths]
    if min_groups is None:
        import ray as _ray

        min_groups = (
            int(_ray.cluster_resources().get("CPU", 8))
            if _ray.is_initialized()
            else 8
        )
    n_groups = max(1, max_stage1_refs // max(n_parts, 1))
    n_groups = min(len(paths), max(n_groups, min(min_groups, len(paths))))
    chunks = np.array_split(np.arange(len(paths)), n_groups)
    return [[paths[i] for i in ch] for ch in chunks if len(ch)]


def _split_one(
    path: str | list[str],
    columns: list[str],
    n_parts: int,
    key: str,
    ts_col: str,
    order_col: str,
    tool_col: str | None,
    salt_turn_threshold: int | None = None,
    salt_window_us: int = 7 * 86_400_000_000,
    heavy_info=None,
):
    import time as _time

    _cpu0 = _time.process_time()
    if isinstance(path, (list, tuple)):
        # coalesced file-group (ref fan-out bound): one task reads the
        # whole group; all downstream per-task state merges commutatively
        tbl = pa.concat_tables(
            [pq.read_table(p, columns=columns) for p in path]
        )
    else:
        tbl = pq.read_table(path, columns=columns)
    prep = prepare_turns(
        tbl, key=key, ts_col=ts_col, order_col=order_col,
        tool_col=tool_col, n_parts=n_parts,
    )
    if salt_turn_threshold:
        prep = _salt_heavy_convs(
            prep, n_parts, salt_turn_threshold, salt_window_us,
            heavy_info=heavy_info,
        )
    pid = prep["part_id"].to_numpy()
    order = np.argsort(pid, kind="stable")
    sorted_tbl = prep.take(pa.array(order))
    counts = np.bincount(pid, minlength=n_parts).astype(np.int64)
    # order-independent per-partition content checksum (count+hash input
    # fingerprint, SURVEY.md §7.5 / VERDICT r1 #10: same-count late data
    # must invalidate): commutative uint64 sum of a (conv, ts, order,
    # is_tool) mix. conv_id and is_tool are part of the mix (r4 review:
    # a same-count correction that reassigns a turn between co-partition
    # conversations, or flips a tool flag, must not be skipped by
    # resume); conv hashes once per distinct conversation via the
    # dictionary trick.
    import zlib as _zlib

    ts_mix = prep["ts"].to_numpy().astype("datetime64[us]").astype(np.int64).view(np.uint64)
    ord_mix = prep["order"].to_numpy().view(np.uint64)
    cd = pc.dictionary_encode(prep["conv_id"].combine_chunks())
    with np.errstate(over="ignore"):
        # multiply on the UNIQUES (vocab-sized), fan out pre-multiplied;
        # in-place xors + a where-add for the tool bit keep the extra
        # full-row passes to one fresh array (first-touch pages are the
        # measured cost on this host, CLAUDE.md environment facts)
        conv_uniq = np.array(
            [_zlib.crc32(c.encode()) for c in cd.dictionary.to_pylist()],
            dtype=np.uint64,
        ) * np.uint64(0x165667B19E3779F9)
        mix = conv_uniq[np.asarray(cd.indices)]
        t = ord_mix * np.uint64(0xC2B2AE3D27D4EB4F)
        t += np.uint64(1)
        np.bitwise_xor(mix, t, out=mix)
        np.multiply(ts_mix, np.uint64(0x9E3779B97F4A7C15), out=t)
        np.bitwise_xor(mix, t, out=mix)
        tool = prep["is_tool"].to_numpy(zero_copy_only=False)
        np.add(mix, np.uint64(0x27D4EB2F165667C5), out=mix, where=tool)
    chk = np.zeros(n_parts, dtype=np.uint64)
    np.add.at(chk, pid, mix)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    chunks = [
        sorted_tbl.slice(int(offsets[p]), int(counts[p])) for p in range(n_parts)
    ]
    # counts carries the task's CPU time (ms) as a trailing element so
    # the driver can report per-stage CPU efficiency without extra returns
    counts = np.append(counts, int((_time.process_time() - _cpu0) * 1000))
    return (*chunks, counts, chk)


def _salt_heavy_convs(
    prep: pa.Table, n_parts: int, threshold: int, window_us: int,
    heavy_info=None,
) -> pa.Table:
    """Salted repartitioning of mega-conversations (SURVEY.md §7.8 /
    north rule): heavy conversations are split into TIME windows
    (``window_us`` must be a multiple of the coarsest tier width so no
    tier bucket ever spans two salt groups — aggregates, p95 included,
    stay exact per bucket). Each window routes to
    ``crc32(conv#salt) % n_parts``.

    Exact latency across the window boundary: the last turn before each
    window start is DUPLICATED into the next window as a ``donor`` row —
    it contributes only its timestamp as the predecessor (the kernel
    weights it out of every aggregate).

    ``heavy_info = (heavy_set, succ_map)`` from
    :func:`detect_heavy_convs` makes the decision GLOBAL (VERDICT r2 next
    #5): every file salts the same convs — required for correctness when
    a conv spans files — and donors route to the conv's global next
    window via ``succ_map`` so the kernel's max-ts donor is the true
    global predecessor (the kernel keeps only the latest donor per
    window). Without ``heavy_info`` the legacy per-file heuristic applies
    (exact only for conversation-sharded files).
    """
    import zlib

    n = prep.num_rows
    conv_arr = prep["conv_id"].combine_chunks()
    d = pa.compute.dictionary_encode(conv_arr)
    codes = np.asarray(d.indices)
    uniq_names = d.dictionary.to_pylist()
    succ_map = None
    if heavy_info is not None:
        heavy_set, succ_map = heavy_info
        heavy_codes = np.flatnonzero(
            np.fromiter(
                (v in heavy_set for v in uniq_names), bool, len(uniq_names)
            )
        )
    else:
        counts = np.bincount(codes, minlength=len(d.dictionary))
        heavy_codes = np.flatnonzero(counts >= threshold)
    salt = np.zeros(n, dtype=np.int64)
    donor = np.zeros(n, dtype=bool)
    if heavy_codes.size == 0:
        return prep.append_column("salt", pa.array(salt)).append_column(
            "donor", pa.array(donor)
        )
    ts = prep["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    order = prep["order"].to_numpy()
    is_heavy = np.isin(codes, heavy_codes)
    salt[is_heavy] = ts[is_heavy] // window_us

    hidx = np.flatnonzero(is_heavy)
    hsel = hidx[np.lexsort((order[hidx], ts[hidx], codes[hidx]))]
    hc, ht, hs = codes[hsel], ts[hsel], salt[hsel]
    if succ_map is not None:
        # donors: THIS FILE's last row of every (conv, window) group is
        # duplicated into the conv's GLOBAL next window; the kernel keeps
        # only the latest donor per window, which is then the true global
        # predecessor regardless of which file holds it
        grp_last = np.r_[(hc[1:] != hc[:-1]) | (hs[1:] != hs[:-1]), True]
        cand = np.flatnonzero(grp_last)
        dsrc, dsalt = [], []
        for i in cand:
            nxt = succ_map.get(uniq_names[hc[i]], {}).get(int(hs[i]))
            if nxt is not None:
                dsrc.append(hsel[i])
                dsalt.append(nxt)
        donor_src = np.asarray(dsrc, dtype=np.int64)
        donor_salt = np.asarray(dsalt, dtype=np.int64)
    else:
        # legacy per-file rule: rows whose in-file successor is in a later
        # window donate into the successor's window
        succ_same_conv = np.r_[hc[1:] == hc[:-1], False]
        succ_new_window = np.r_[hs[1:] != hs[:-1], False]
        donor_src = hsel[succ_same_conv & succ_new_window]
        donor_salt = salt[np.roll(hsel, -1)[np.flatnonzero(succ_same_conv & succ_new_window)]] \
            if donor_src.size else np.empty(0, np.int64)

    # recompute part ids for salted rows
    pid = prep["part_id"].to_numpy().copy()

    def salted_pid(code_arr, salt_arr):
        out = np.empty(code_arr.size, dtype=np.int32)
        for i, (c, s) in enumerate(zip(code_arr, salt_arr)):
            out[i] = zlib.crc32(f"{uniq_names[c]}#{s}".encode()) % n_parts
        return out

    # per-(conv,salt) unique pairs only, then fan out. Signed salts kept
    # intact (no 32-bit truncation): a pre-1970 timestamp yields a negative
    # salt, and truncating here while the donor path below uses the exact
    # salt would route a window's donor to a different partition than its
    # group (ADVICE r1) — np.unique over the 2-column pair avoids packing.
    pair_mat = np.stack([codes[is_heavy], salt[is_heavy]], axis=1)
    uniq_pairs, inv = np.unique(pair_mat, axis=0, return_inverse=True)
    up_pid = salted_pid(uniq_pairs[:, 0], uniq_pairs[:, 1])
    pid[is_heavy] = up_pid[inv]

    base = prep.drop_columns(["part_id"]).append_column(
        "part_id", pa.array(pid, pa.int32())
    )
    base = base.append_column("salt", pa.array(salt)).append_column(
        "donor", pa.array(donor)
    )
    if donor_src.size == 0:
        return base
    dup = base.take(pa.array(donor_src))
    dup_pid = salted_pid(codes[donor_src], donor_salt)
    dup = (
        dup.drop_columns(["part_id", "salt", "donor"])
        .append_column("part_id", pa.array(dup_pid, pa.int32()))
        .append_column("salt", pa.array(donor_salt))
        .append_column("donor", pa.array(np.ones(donor_src.size, dtype=bool)))
    )
    return pa.concat_tables([base, dup]).combine_chunks()


def _call_decide(decide_parts, input_rows_by_part, input_chk_by_part):
    """decide_parts may take (rows) or (rows, checksums)."""
    import inspect

    # only SIGNATURE INSPECTION is guarded: an exception raised inside the
    # decide body must propagate (swallowing it would re-run decide's side
    # effects and silently drop checksum-based invalidation)
    try:
        two_arg = len(inspect.signature(decide_parts).parameters) >= 2
    except (TypeError, ValueError):
        two_arg = False
    if two_arg:
        return decide_parts(input_rows_by_part, input_chk_by_part)
    return decide_parts(input_rows_by_part)


def _durable_publish(tmp: str, dst: str) -> None:
    """fsync-then-rename-then-fsync-dir: os.replace alone is atomic but
    NOT durable — on ext4/xfs a crash after the rename can persist the
    name with truncated contents, which resume would then trust (r4
    review). The extra fsyncs are per PARTITION file, not per batch."""
    import os

    with open(tmp, "rb") as fh:
        os.fsync(fh.fileno())
    os.replace(tmp, dst)
    from sits_ray.state.manifest import _fsync_dir

    _fsync_dir(os.path.dirname(dst))


def _stage1(
    paths, tiers, n_parts, key, ts_col, order_col, tool_col, columns,
    decide_parts, only_parts, salt_turn_threshold, salt_window_us,
    heavy_info, max_stage1_refs=DEFAULT_MAX_STAGE1_REFS,
):
    """Shared stage-1 orchestration for BOTH exchange variants (r4
    review: the fused and unfused paths had drifted copies — one
    fingerprint/salting fix must land in both by construction). Returns
    ``(refmat, input_rows_by_part, input_chk_by_part, parts,
    stage1_cpu_ms)``. ``refmat`` has one row per file GROUP (see
    :func:`_coalesce_paths`), not per file."""
    import ray as _ray

    _validate_salt_window(salt_turn_threshold, salt_window_us, tiers)
    if columns is None:
        cols = [key, ts_col, order_col] + ([tool_col] if tool_col else [])
    else:
        cols = columns
    if salt_turn_threshold and heavy_info is None:
        # detection is GLOBAL (set + succession map), so grouping below
        # cannot change which convs salt or where donors route
        heavy_info = detect_heavy_convs(
            paths, salt_turn_threshold, key=key, ts_col=ts_col,
            window_us=salt_window_us,
        )
    heavy_ref = _ray.put(heavy_info) if heavy_info is not None else None
    groups = _coalesce_paths(paths, n_parts, max_stage1_refs)
    split = _ray.remote(num_returns=n_parts + 2)(_split_one)
    refmat = [
        split.remote(g[0] if len(g) == 1 else list(g), cols, n_parts, key,
                     ts_col, order_col, tool_col,
                     salt_turn_threshold, salt_window_us, heavy_ref)
        for g in groups
    ]
    counts_raw = np.stack(_ray.get([r[n_parts] for r in refmat]))
    stage1_cpu_ms = int(counts_raw[:, n_parts].sum())
    counts = counts_raw[:, :n_parts].sum(axis=0)
    chks = np.sum(
        np.stack(_ray.get([r[n_parts + 1] for r in refmat])),
        axis=0, dtype=np.uint64,
    )
    input_rows_by_part = {p: int(c) for p, c in enumerate(counts) if c > 0}
    input_chk_by_part = {p: int(chks[p]) for p in input_rows_by_part}
    if decide_parts is not None:
        only_parts = _call_decide(decide_parts, input_rows_by_part, input_chk_by_part)
    parts = sorted(
        p for p in input_rows_by_part if only_parts is None or p in only_parts
    )
    return refmat, input_rows_by_part, input_chk_by_part, parts, stage1_cpu_ms


def _build_part(tiers, gapfill, dedup, *chunks):
    tables = [c for c in chunks if c.num_rows]
    if not tables:
        return None
    g = pa.concat_tables(tables).combine_chunks()
    return _part_series(g, tiers, gapfill, dedup)


def _build_write_part(
    tiers, gapfill, dedup, out_dir, write_blocks, *chunks
):
    """Fused stage-2 task: kernel -> explode -> Gorilla encode -> atomic
    per-partition Parquet writes -> small stats table.

    Fusing write+encode into the build task removes three whole-dataset
    passes (explode, encoder actor pool spin-up, manifest count scan) and
    makes each partition's output a single atomically-renamed file — the
    per-asset resume granularity of the reference
    (``R/api_regularize.R:134-145``)."""
    import os
    import time as _time

    from sits_ray.stages.compressor import GorillaEncode
    from sits_ray.stages.regularize import explode_table

    _cpu0 = _time.process_time()
    tables = [c for c in chunks if c.num_rows]
    if not tables:
        return None
    g = pa.concat_tables(tables).combine_chunks()
    nested = _part_series(g, tiers, gapfill, dedup)
    part_id = int(nested["part_id"][0].as_py())
    enc = GorillaEncode() if write_blocks else None
    stats = {"tier": [], "part_id": [], "n_series": [], "n_rows": [],
             "cpu_ms": []}
    for tier in tiers:
        sub = nested.filter(pa.compute.equal(nested["tier"], tier))
        long_tbl = explode_table(sub).drop_columns(["tier", "part_id"])
        d = os.path.join(out_dir, "long", f"tier={tier}", f"part_id={part_id}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "part-0.parquet.tmp")
        # dictionary-encode only the low-cardinality columns (ids, counts,
        # bucket grid, fill flag): the float latency metrics are
        # high-cardinality, so the writer's default dict attempt burns CPU
        # and falls back with no size win — measured 0.29 -> 0.15 s per
        # partition AND a smaller file with the explicit list
        dict_cols = [
            c for c in ("conv_id", "bucket_ts", "turn_count", "tool_calls",
                        "n_latency", "filled")
            if c in long_tbl.column_names
        ]
        pq.write_table(long_tbl, tmp, use_dictionary=dict_cols)
        _durable_publish(tmp, os.path.join(d, "part-0.parquet"))
        if enc is not None:
            bd = os.path.join(out_dir, "blocks", f"tier={tier}", f"part_id={part_id}")
            os.makedirs(bd, exist_ok=True)
            btmp = os.path.join(bd, "part-0.parquet.tmp")
            btbl = enc(sub)
            nonbin = [
                c for c, t in zip(btbl.schema.names, btbl.schema.types)
                if not pa.types.is_binary(t)
            ]
            # min/max statistics of compressed block BYTES prune nothing;
            # keep stats (and dict) on the scalar columns only
            pq.write_table(btbl, btmp, use_dictionary=nonbin,
                           write_statistics=nonbin)
            _durable_publish(btmp, os.path.join(bd, "part-0.parquet"))
        stats["tier"].append(tier)
        stats["part_id"].append(part_id)
        stats["n_series"].append(sub.num_rows)
        stats["n_rows"].append(long_tbl.num_rows)
        stats["cpu_ms"].append(0)
    if stats["cpu_ms"]:
        stats["cpu_ms"][-1] = int((_time.process_time() - _cpu0) * 1000)
    return pa.table(stats)


def rollup_exchange_fused(
    paths: list[str],
    out_dir: str,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    gapfill: bool = True,
    dedup: bool = False,
    n_parts: int = 64,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    tool_col: str | None = "tool",
    columns: list[str] | None = None,
    write_blocks: bool = True,
    decide_parts=None,
    salt_turn_threshold: int | None = None,
    salt_window_us: int = 7 * 86_400_000_000,
    stage2_num_cpus: float = 1,
    heavy_info=None,
    on_part_done=None,
    max_stage1_refs: int | None = DEFAULT_MAX_STAGE1_REFS,
):
    """Fused exchange: stage 1 split, stage 2 build+encode+write per
    partition. Returns ``(stats_rows, input_rows_by_part)`` where
    stats_rows is a list of dicts (tier, part_id, n_series, n_rows).

    ``stage2_num_cpus`` caps stage-2 concurrency (concurrent tasks =
    session cpus / stage2_num_cpus): the build task is memory-bandwidth-
    heavy, and on bandwidth-limited hosts running one per core inflates
    per-task CPU ~4x for NO wall gain (BASELINE.md round-2 accounting:
    231 CPU-s at 8 concurrent vs 1012 CPU-s at 32). Multi-node clusters
    bring bandwidth per node, so the default stays 1."""
    import ray as _ray

    refmat, input_rows_by_part, input_chk_by_part, parts, stage1_cpu_ms = _stage1(
        paths, tiers, n_parts, key, ts_col, order_col, tool_col, columns,
        decide_parts, None, salt_turn_threshold, salt_window_us, heavy_info,
        max_stage1_refs,
    )
    build = _ray.remote(num_cpus=stage2_num_cpus)(_build_write_part)
    stat_refs = [
        build.remote(
            tiers, gapfill, dedup, out_dir, write_blocks,
            *[refmat[f][p] for f in range(len(refmat))],
        )
        for p in parts
    ]
    stats_rows: list[dict] = []
    # ray.wait loop, NOT one bulk ray.get: each partition's manifest can
    # be committed the moment its files are on disk (on_part_done), so a
    # failure in partition N or a driver crash costs ONE partition of
    # resume credit, not all of them (r4 review; the per-asset resume
    # granularity the reference has)
    remaining = list(stat_refs)
    while remaining:
        ready, remaining = _ray.wait(remaining, num_returns=1)
        t = _ray.get(ready[0])
        if t is None:
            continue
        rows = t.to_pylist()
        stats_rows.extend(rows)
        if on_part_done is not None:
            on_part_done(
                [{k: v for k, v in r.items() if k != "cpu_ms"} for r in rows]
            )
    stage2_cpu_ms = sum(r.get("cpu_ms", 0) for r in stats_rows)
    for r in stats_rows:
        r.pop("cpu_ms", None)
    cpu_meta = {"stage1_cpu_sec": round(stage1_cpu_ms / 1000, 2),
                "stage2_cpu_sec": round(stage2_cpu_ms / 1000, 2)}
    return stats_rows, input_rows_by_part, cpu_meta


def rollup_exchange(
    paths: list[str],
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    gapfill: bool = True,
    dedup: bool = False,
    n_parts: int = 64,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    tool_col: str | None = "tool",
    columns: list[str] | None = None,
    only_parts: set[int] | None = None,
    decide_parts=None,
    salt_turn_threshold: int | None = None,
    salt_window_us: int = 7 * 86_400_000_000,
    heavy_info=None,
    max_stage1_refs: int | None = DEFAULT_MAX_STAGE1_REFS,
):
    """Two-stage exchange rollup.

    Returns ``(nested_dataset, input_rows_by_part)`` where the counts dict
    is the per-partition input fingerprint (computed as a by-product of
    stage 1 — no separate fingerprint pass over the input).
    ``only_parts`` restricts stage 2 to the given partitions (resume);
    ``decide_parts(input_rows_by_part) -> set[int]`` is called between the
    stages for the same purpose when the fingerprint must inform the
    decision (manifest diff)."""
    refmat, input_rows_by_part, input_chk_by_part, parts, _cpu_ms = _stage1(
        paths, tiers, n_parts, key, ts_col, order_col, tool_col, columns,
        decide_parts, only_parts, salt_turn_threshold, salt_window_us,
        heavy_info, max_stage1_refs,
    )
    build = ray.remote(_build_part)
    # every scheduled part has input rows (parts ⊆ input_rows_by_part), so
    # no build returns an empty/None table
    nested_refs = [
        build.remote(tiers, gapfill, dedup, *[refmat[f][p] for f in range(len(refmat))])
        for p in parts
    ]
    import ray.data as rd

    nested = rd.from_arrow_refs(nested_refs)
    return nested, input_rows_by_part
