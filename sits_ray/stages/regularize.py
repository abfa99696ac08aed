"""Temporal regularization / tier rollup — the flagship pipeline.

Recasts sits' regularization (``sits_regularize``: irregular collection ->
fixed-interval composite cube, reference ``R/sits_regularize.R:162-246``,
``R/api_gdalcubes.R:450-681``) for the transcript domain: irregular
per-conversation turn events -> regular per-conversation metric series at
the retention tiers 1m/1h/1d, with explicit empty buckets synthesized and
linearly gap-filled (the analog of the reference's placeholder assets,
``R/api_regularize.R:90-109``, and ``impute_linear``).

Ray Data shape (SURVEY.md §3.1): ``read_parquet`` ->
``map_batches(prepare_turns)`` (projection + vectorized derivations,
*before* the shuffle so heavy ``text`` never moves) ->
``groupby(part_id).map_groups(_part_series)`` — ONE call per hash
partition, fully vectorized across every conversation inside it (numpy
segment reductions; no per-conversation Python) -> one nested row per
(conv, tier) holding the regular series as Arrow list columns (the sits
nested-tibble analog, ``R/api_tibble.R:20-32``) -> either
``nested_to_long`` (explode, no shuffle) or the Gorilla actor-pool
encoder (:mod:`sits_ray.stages.compressor`).

Pinned cross-engine contracts (verified bit-exact vs DuckDB in
tools/check_correctness.py):

* ordering: rows sorted stably by ``(conv, ts, order_col)`` before any
  kernel (SURVEY.md §2.11); latency of turn i = seconds since turn i-1,
  first turn NULL (== SQL ``lag`` semantics);
* latency seconds = ``days*86400 + rem/1e6`` of the microsecond delta
  (== DuckDB ``epoch(interval)`` day-split);
* bucket sums are IEEE-sequential in time order (== SQL aggregation over
  window-ordered rows); deterministic across parallelism levels;
* p95 is nearest-rank: sorted[ceil(.95*n)-1] (== ``quantile_disc``);
* gap-fill: leading<-first valid, trailing<-last valid, interior
  ``first + i*(next-first)/gaps`` (reference ``src/linear_interp.cpp:25-73``).

Scale notes (100 TB design): the shuffle key is the hash partition, so
group count == n_parts regardless of conversation count; a
mega-conversation is bounded by its partition (1/n_parts of the data),
and its *output* is bounded by time-range/width regardless of turn count.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TIER_WIDTH_US = {
    "1m": 60_000_000,
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
}

#: metrics carried per tier bucket. count-like are zero on gap-filled rows;
#: continuous are linearly interpolated (reference impute semantics).
COUNT_METRICS = ("turn_count", "tool_calls", "n_latency")
SUM_METRICS = ("sum_latency",)
CONT_METRICS = ("mean_latency", "p95_latency", "min_latency", "max_latency")
ALL_METRICS = COUNT_METRICS + SUM_METRICS + CONT_METRICS


def part_of(conv_id, n_parts: int) -> int:
    """Stable partition id of a conversation (crc32 hash-partitioning)."""
    key = conv_id if isinstance(conv_id, str) else str(conv_id)
    return zlib.crc32(key.encode()) % n_parts


def delta_us_to_seconds(d_us: np.ndarray) -> np.ndarray:
    """Microsecond deltas -> seconds as ``days*86400 + rem/1e6`` — the pinned
    latency definition (matches SQL ``epoch(ts - lag(ts))``, which splits
    timestamp differences into days + microseconds before converting)."""
    d = np.asarray(d_us, dtype=np.int64)
    days, rem = np.divmod(d, 86_400_000_000)
    return days * 86400.0 + rem / 1e6


def prepare_turns(
    batch: pa.Table,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    tool_col: str | None = "tool",
    n_parts: int = 32,
) -> pa.Table:
    """Vectorized pre-shuffle projection: keep only the rollup inputs and
    derive ``is_tool`` + ``part_id`` so ``text`` never crosses the shuffle
    (SURVEY.md §7.5 'wide records')."""
    cols = {
        "conv_id": batch[key],
        "ts": batch[ts_col],
        "order": pc.cast(batch[order_col], pa.int64()),
    }
    if tool_col is not None and tool_col in batch.column_names:
        t = batch[tool_col]
        cols["is_tool"] = pc.and_(pc.is_valid(t), pc.not_equal(t, ""))
    else:
        cols["is_tool"] = pa.array(np.zeros(batch.num_rows, dtype=bool))
    # crc32 only once per distinct conversation in the batch, then fan out
    # through the dictionary indices (typical batches repeat each conv ~turns
    # times, so this is ~2 orders of magnitude fewer Python hash calls)
    d = pc.dictionary_encode(
        batch[key].combine_chunks()
        if isinstance(batch[key], pa.ChunkedArray)
        else batch[key]
    )
    pid_uniq = np.array(
        [part_of(c, n_parts) for c in d.dictionary.to_pylist()], dtype=np.int32
    )
    cols["part_id"] = pa.array(pid_uniq[np.asarray(d.indices)])
    return pa.table(cols)


def _seg_starts(*keys: np.ndarray) -> np.ndarray:
    """Start index of each run in already-sorted parallel key arrays."""
    n = keys[0].size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return np.flatnonzero(change)


def _seq_segment_sums(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """IEEE-sequential per-segment sums (the pinned summation contract).

    Vectorized across segments of equal length: k-1 elementwise adds give
    every segment the exact left-to-right addition order, bit-identical to
    a scalar loop. Rare long segments (>64) fall back to Python sum."""
    lens = (ends - starts).astype(np.int64)
    out = np.zeros(starts.size, dtype=np.float64)
    small = lens <= 64
    for k in np.unique(lens[small]):
        if k == 0:
            continue
        m = lens == k
        idx = starts[m]
        s = vals[idx].copy()
        for j in range(1, int(k)):
            s += vals[idx + j]
        out[m] = s
    for i in np.flatnonzero(~small):
        out[i] = sum(vals[starts[i] : ends[i]].tolist(), 0.0)
    return out


def _ragged_linear_interp(
    v: np.ndarray, series_start: np.ndarray, series_end_excl: np.ndarray
) -> np.ndarray:
    """linear_interp (src/linear_interp.cpp rules) over concatenated
    variable-length series. ``series_start`` maps each element to its
    series' first index, ``series_end_excl`` to one past its last."""
    n = v.size
    out = v.copy()
    if n == 0:
        return out
    isnan = np.isnan(v)
    if not isnan.any():
        return out
    idx = np.arange(n, dtype=np.int64)
    prev = np.maximum.accumulate(np.where(isnan, -1, idx))
    nxt_r = np.minimum.accumulate(np.where(isnan, n, idx)[::-1])[::-1]
    # the two accumulate passes are inherently full-width; everything
    # after only matters at the NaN positions — gather once and do the
    # remaining ~8 passes on the subset (bit-identical: same ops on the
    # same operand values)
    iz = np.flatnonzero(isnan)
    pz = prev[iz]
    nz = nxt_r[iz]
    # a prev/next pointer outside the series boundary means "none"
    has_prev = pz >= series_start[iz]
    has_next = nz < series_end_excl[iz]
    pv = v[np.clip(pz, 0, n - 1)]
    nv = v[np.clip(nz, 0, n - 1)]
    interior = has_prev & has_next
    if interior.any():
        pvi, nvi = pv[interior], nv[interior]
        gaps = (nz[interior] - pz[interior]).astype(np.float64)
        i_off = (iz[interior] - pz[interior]).astype(np.float64)
        out[iz[interior]] = pvi + (i_off * (nvi - pvi) / gaps)
    lead = ~has_prev & has_next
    out[iz[lead]] = nv[lead]
    trail = has_prev & ~has_next
    out[iz[trail]] = pv[trail]
    return out


def _list_array(flat: np.ndarray, offsets: np.ndarray, typ) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, typ)
    )


def _part_series(
    g: pa.Table,
    tiers: tuple[str, ...],
    gapfill: bool,
    dedup: bool,
) -> pa.Table:
    """Whole-partition kernel: every conversation of one hash partition,
    vectorized end-to-end (no per-conversation Python)."""
    part_id = int(g["part_id"][0].as_py()) if g.num_rows else 0
    conv_dict = pc.dictionary_encode(g["conv_id"].combine_chunks())
    conv_codes = np.asarray(conv_dict.indices)
    conv_values = conv_dict.dictionary  # unique conv ids, arbitrary order
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    order = g["order"].to_numpy()
    is_tool = g["is_tool"].to_numpy(zero_copy_only=False)
    nrows = g.num_rows
    # salted repartitioning support (stages/exchange._salt_heavy_convs):
    # a mega-conversation arrives as (conv, salt) time-window groups; donor
    # rows carry only the predecessor timestamp across the boundary and are
    # weighted out of every aggregate.
    salt = (
        g["salt"].to_numpy() if "salt" in g.column_names
        else np.zeros(nrows, dtype=np.int64)
    )
    live = (
        ~g["donor"].to_numpy(zero_copy_only=False) if "donor" in g.column_names
        else np.ones(nrows, dtype=bool)
    )

    sel = np.lexsort((order, ts, salt, conv_codes))
    conv_codes, ts, order, is_tool, salt, live = (
        conv_codes[sel], ts[sel], order[sel], is_tool[sel].astype(np.int64),
        salt[sel], live[sel],
    )
    if dedup:
        # exact dedup of replayed turns: first occurrence per (conv, salt,
        # order) (reference groupby-first dedup, R/api_data.R:215-223).
        # SCOPE (ADVICE r1): adjacency after the (conv, salt, ts, order)
        # sort means this covers byte-identical replays only — a replayed
        # turn re-logged with a DIFFERENT timestamp (same turn_idx) is kept
        # as a distinct observation by design (its ts is new information).
        # LIVE rows only (r4 review): a donor carries the turn_idx of the
        # previous window's last turn, so a live replay of that turn at a
        # new ts can sort adjacent to it — dropping the live row would
        # lose a real observation while keeping the weighted-out donor.
        # Donor duplicates are handled by the dedicated donor-drop below.
        keep = np.r_[
            True,
            (conv_codes[1:] != conv_codes[:-1])
            | (salt[1:] != salt[:-1])
            | (order[1:] != order[:-1])
            | ~(live[1:] & live[:-1]),
        ]
        conv_codes, ts, order, is_tool, salt, live = (
            conv_codes[keep], ts[keep], order[keep], is_tool[keep],
            salt[keep], live[keep],
        )

    if not live.all():
        # cross-file salting delivers MULTIPLE donor rows per (conv, salt)
        # window (one per input file holding the predecessor window); only
        # the LATEST — the true global predecessor — may survive, or a
        # stale donor's valid latency would leak into n_lat and donor-only
        # artifact buckets would materialize. Donors sort before all live
        # rows of their window (ts < window start), so "donor followed by
        # donor in the same group" identifies every stale one.
        is_donor = ~live
        same_grp = (conv_codes[1:] == conv_codes[:-1]) & (salt[1:] == salt[:-1])
        drop = np.r_[is_donor[:-1] & is_donor[1:] & same_grp, False]
        if drop.any():
            keep2 = ~drop
            conv_codes, ts, order, is_tool, salt, live = (
                conv_codes[keep2], ts[keep2], order[keep2], is_tool[keep2],
                salt[keep2], live[keep2],
            )

    n = ts.size
    # group = (conv, salt) run; unsalted data degenerates to group == conv
    grp_starts = _seg_starts(conv_codes, salt)
    gcode = np.zeros(n, dtype=np.int64)
    if n:
        gcode[grp_starts] = 1
        gcode = np.cumsum(gcode) - 1
    g2conv = conv_codes[grp_starts] if n else np.empty(0, np.int64)
    lat = np.empty(n, dtype=np.float64)
    if n:
        lat[0] = np.nan
        lat[1:] = delta_us_to_seconds(ts[1:] - ts[:-1])
        lat[grp_starts] = np.nan  # first row of each group has no latency
    lat_valid = ~np.isnan(lat)
    lat0 = np.where(lat_valid, lat, 0.0)
    live_i = live.astype(np.int64)
    # one global stable float sort of lat, shared by every tier: per tier,
    # lexsort((lat, seg_id)) == stable-sort the lat-ordered indices by
    # segment (int key -> radix), so the O(n log n) float pass runs once
    # instead of len(tiers) times. lat is non-negative-or-canonical-NaN
    # by construction (sorted ts deltas; NaN set explicitly), so its
    # uint64 bit pattern is order-identical (NaN = 0x7ff8... sorts after
    # every finite, same as float argsort) and radix-sorts ~25% faster;
    # a signbit anywhere (can't happen) falls back to the float sort
    if n:
        lat_order = np.argsort(
            lat if np.signbit(lat).any() else lat.view(np.uint64),
            kind="stable",
        )
    else:
        lat_order = np.empty(0, np.int64)

    out_chunks: list[pa.Table] = []
    for tier in tiers:
        w = TIER_WIDTH_US[tier]
        b = (ts // w) * w  # nondecreasing within each group
        starts = _seg_starts(gcode, b)
        ends = np.r_[starts[1:], n]
        seg_conv = gcode[starts]
        uniq_b = b[starts]
        counts = np.add.reduceat(live_i, starts) if n else np.empty(0, np.int64)
        tools = np.add.reduceat(is_tool * live_i, starts) if n else np.empty(0, np.int64)
        n_lat = np.add.reduceat(lat_valid.astype(np.int64), starts) if n else np.empty(0, np.int64)
        s_lat = _seq_segment_sums(lat0, starts, ends)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_lat = np.where(n_lat > 0, s_lat / n_lat, np.nan)
        # min/max/p95 via one sort of (segment, lat); NaNs sort last per segment
        seg_id = np.repeat(np.arange(starts.size), ends - starts)
        osel = lat_order[np.argsort(seg_id[lat_order], kind="stable")]
        lat_sorted = lat[osel]
        mn = np.where(n_lat > 0, lat_sorted[starts], np.nan)
        hi = np.clip(starts + np.maximum(n_lat - 1, 0), 0, max(n - 1, 0))
        mx = np.where(n_lat > 0, lat_sorted[hi], np.nan)
        k95 = np.clip(np.ceil(0.95 * n_lat).astype(np.int64) - 1, 0, None)
        p95 = np.where(
            n_lat > 0, lat_sorted[np.clip(starts + k95, 0, max(n - 1, 0))], np.nan
        )

        # donor-only buckets (a donor alone in the previous window's last
        # bucket) are artifacts of the salt boundary, not observations
        keep_seg = (counts > 0) | (n_lat > 0)
        if not keep_seg.all():
            starts, ends = starts[keep_seg], ends[keep_seg]
            seg_conv, uniq_b = seg_conv[keep_seg], uniq_b[keep_seg]
            counts, tools, n_lat, s_lat = (
                counts[keep_seg], tools[keep_seg], n_lat[keep_seg], s_lat[keep_seg]
            )
            mean_lat, mn, mx, p95 = (
                mean_lat[keep_seg], mn[keep_seg], mx[keep_seg], p95[keep_seg]
            )

        # per-group series boundaries in segment space
        conv_seg_starts = _seg_starts(seg_conv)
        conv_seg_ends = np.r_[conv_seg_starts[1:], starts.size]
        series_conv = seg_conv[conv_seg_starts]

        if gapfill and starts.size:
            first_b = uniq_b[conv_seg_starts]
            last_b = uniq_b[conv_seg_ends - 1]
            glen = ((last_b - first_b) // w + 1).astype(np.int64)
            goff = np.concatenate([[0], np.cumsum(glen)])
            total = int(goff[-1])
            rep = np.repeat(np.arange(series_conv.size), glen)
            # full regular grid per conv (the valid-timeline rule applied
            # per series: start=min bucket, end=max bucket, step=w)
            grid = np.repeat(first_b, glen) + (
                np.arange(total, dtype=np.int64) - np.repeat(goff[:-1], glen)
            ) * w
            # scatter observed segments into grid positions
            conv_goff = goff[:-1]  # grid offset per conv index (dense)
            pos = (
                np.repeat(conv_goff, conv_seg_ends - conv_seg_starts)
                + (uniq_b - np.repeat(first_b, conv_seg_ends - conv_seg_starts)) // w
            )
            filled = np.ones(total, dtype=bool)
            filled[pos] = False

            def scatter(vals, fill):
                out = np.full(total, fill, dtype=np.float64)
                out[pos] = vals
                return out

            g_counts = scatter(counts, 0).astype(np.int64)
            g_tools = scatter(tools, 0).astype(np.int64)
            g_nlat = scatter(n_lat, 0).astype(np.int64)
            g_sum = scatter(s_lat, 0.0)
            srs_start = np.repeat(conv_goff, glen)
            srs_end = np.repeat(goff[1:], glen)
            g_cont = {}
            for name, vals in (
                ("mean_latency", mean_lat), ("p95_latency", p95),
                ("min_latency", mn), ("max_latency", mx),
            ):
                g_cont[name] = _ragged_linear_interp(
                    scatter(vals, np.nan), srs_start, srs_end
                )
            row_off = goff
            tier_tbl = _nested_table(
                conv_values, g2conv[series_conv], tier, part_id, grid, row_off,
                g_counts, g_tools, g_nlat, g_sum, g_cont, filled,
            )
        else:
            seg_off = np.concatenate(
                [conv_seg_starts, [starts.size]]
            ).astype(np.int64)
            tier_tbl = _nested_table(
                conv_values, g2conv[series_conv], tier, part_id, uniq_b, seg_off,
                counts, tools, n_lat, s_lat,
                {
                    "mean_latency": mean_lat, "p95_latency": p95,
                    "min_latency": mn, "max_latency": mx,
                },
                np.zeros(starts.size, dtype=bool),
            )
        out_chunks.append(tier_tbl)
    return pa.concat_tables(out_chunks) if out_chunks else _nested_table(
        conv_values, np.empty(0, np.int64), tiers[0], part_id,
        np.empty(0, np.int64), np.zeros(1, np.int64),
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0), {m: np.empty(0) for m in CONT_METRICS}, np.empty(0, bool),
    )


def _nested_table(
    conv_values, series_conv, tier, part_id, flat_bucket, offsets,
    counts, tools, n_lats, sums, cont, filled,
) -> pa.Table:
    n_series = series_conv.size
    offs = np.asarray(offsets, dtype=np.int64)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    conv_col = conv_values.take(pa.array(series_conv, pa.int64()))
    return pa.table(
        {
            "conv_id": conv_col,
            "tier": pa.array([tier] * n_series, pa.string()),
            "part_id": pa.array(np.full(n_series, part_id, dtype=np.int32)),
            "n_buckets": pa.array(lens, pa.int64()),
            "bucket_ts": _list_array(flat_bucket, offs, pa.timestamp("us")),
            "turn_count": _list_array(counts, offs, pa.int64()),
            "tool_calls": _list_array(tools, offs, pa.int64()),
            "n_latency": _list_array(n_lats, offs, pa.int64()),
            "sum_latency": _list_array(sums, offs, pa.float64()),
            "mean_latency": _list_array(cont["mean_latency"], offs, pa.float64()),
            "p95_latency": _list_array(cont["p95_latency"], offs, pa.float64()),
            "min_latency": _list_array(cont["min_latency"], offs, pa.float64()),
            "max_latency": _list_array(cont["max_latency"], offs, pa.float64()),
            "filled": _list_array(filled, offs, pa.bool_()),
        }
    )


def rollup_nested(
    prepared,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    gapfill: bool = True,
    dedup: bool = False,
):
    """``groupby(part_id).map_groups`` over prepared turns -> nested tier
    series (THE shuffle, SURVEY.md §7.4). One vectorized call per hash
    partition; all tiers computed in one pass so raw turns shuffle once."""
    return prepared.groupby("part_id").map_groups(
        lambda g: _part_series(g, tiers, gapfill, dedup),
        batch_format="pyarrow",
    )


def explode_table(batch: pa.Table) -> pa.Table:
    """Nested series rows -> long tier rows (pure Arrow, no shuffle)."""
    lens = pc.list_value_length(batch["bucket_ts"]).to_numpy()
    rep = np.repeat(np.arange(batch.num_rows), lens)
    cols = {
        "conv_id": batch["conv_id"].take(pa.array(rep)),
        "tier": batch["tier"].take(pa.array(rep)),
        "part_id": batch["part_id"].take(pa.array(rep)),
        "bucket_ts": pc.list_flatten(batch["bucket_ts"]),
    }
    for m in (*ALL_METRICS, "filled"):
        cols[m] = pc.list_flatten(batch[m])
    return pa.table(cols)


def nested_to_long(nested):
    """Explode nested series rows into the long tier table
    (conv_id, tier, bucket_ts, metrics..., filled) — a stateless
    ``map_batches``; no shuffle."""
    return nested.map_batches(explode_table, batch_format="pyarrow")


def rollup_tiers(
    ds,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    gapfill: bool = True,
    dedup: bool = False,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    tool_col: str | None = "tool",
    n_parts: int = 32,
):
    """Full rollup: prune/derive -> one part_id shuffle -> nested tier series.

    Returns the nested Dataset; use :func:`nested_to_long` for the long
    form and :class:`sits_ray.stages.compressor.GorillaEncode` for the
    compressed tier blocks.
    """
    prepared = ds.map_batches(
        prepare_turns,
        batch_format="pyarrow",
        fn_kwargs=dict(
            key=key, ts_col=ts_col, order_col=order_col,
            tool_col=tool_col, n_parts=n_parts,
        ),
    )
    return rollup_nested(prepared, tiers=tiers, gapfill=gapfill, dedup=dedup)
