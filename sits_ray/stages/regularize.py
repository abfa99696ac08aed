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
``groupby(conv_id).map_groups(series_fn, batch_format="pyarrow")`` — one
nested row per (conv, tier) holding the regular series as Arrow list
columns (the sits nested-tibble analog, ``R/api_tibble.R:20-32``) ->
either ``nested_to_long`` (explode, no shuffle) for relational consumers
or the Gorilla actor-pool encoder (:mod:`sits_ray.stages.compressor`).

Ordering invariant: within a group, rows are stably sorted by
``(ts, order_col)`` before any kernel (SURVEY.md §2.11). Latency of turn i
is ``ts_i - ts_{i-1}`` in seconds; the first turn has no latency (NULL),
matching SQL ``lag`` semantics so the DuckDB oracle can replicate it.

Scale notes (100 TB design): the per-conv group carries only the pruned
columns (conv_id, ts, order, is_tool[, value]); a 10^6-turn
mega-conversation group is ~32 MB, and its *output* is bounded by
time-range/width regardless of turn count. For conversations beyond that,
``salt_turns`` splits groups into contiguous turn ranges with a one-row
overlap so latency stays exact (see ``rollup_tiers``).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sits_ray.kernels.gapfill import linear_interp

TIER_WIDTH_US = {
    "1m": 60_000_000,
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
}

#: metrics carried per tier bucket. count-like are zero on gap-filled rows;
#: continuous are linearly interpolated (reference impute semantics).
COUNT_METRICS = ("turn_count", "tool_calls")
SUM_METRICS = ("sum_latency",)
CONT_METRICS = ("mean_latency", "p95_latency", "min_latency", "max_latency")
ALL_METRICS = COUNT_METRICS + SUM_METRICS + CONT_METRICS


def part_of(conv_id, n_parts: int) -> int:
    """Stable partition id of a conversation (crc32 hash-partitioning)."""
    key = conv_id if isinstance(conv_id, str) else str(conv_id)
    return zlib.crc32(key.encode()) % n_parts


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
    conv = batch[key].to_pylist()
    cols["part_id"] = pa.array(
        np.array([part_of(c, n_parts) for c in conv], dtype=np.int32)
    )
    return pa.table(cols)


def delta_us_to_seconds(d_us: np.ndarray) -> np.ndarray:
    """Microsecond deltas -> seconds as ``days*86400 + rem/1e6`` — the pinned
    latency definition (matches SQL ``epoch(ts - lag(ts))``, which splits
    timestamp differences into days + microseconds before converting)."""
    d = np.asarray(d_us, dtype=np.int64)
    days, rem = np.divmod(d, 86_400_000_000)
    return days * 86400.0 + rem / 1e6


def _segment_starts(sorted_vals: np.ndarray) -> np.ndarray:
    if sorted_vals.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero(np.r_[True, sorted_vals[1:] != sorted_vals[:-1]])


def _conv_series(
    g: pa.Table,
    tiers: tuple[str, ...],
    gapfill: bool,
    dedup: bool,
) -> pa.Table:
    """Per-group kernel: one conversation -> one nested row per tier."""
    conv_id = g["conv_id"][0].as_py()
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    order = g["order"].to_numpy()
    is_tool = g["is_tool"].to_numpy(zero_copy_only=False)
    part_id = int(g["part_id"][0].as_py()) if "part_id" in g.column_names else 0

    sel = np.lexsort((order, ts))
    ts, order, is_tool = ts[sel], order[sel], is_tool[sel]
    if dedup:
        # exact dedup of replayed turns: first occurrence per order value
        # (reference groupby-first dedup, R/api_data.R:215-223)
        keep = np.r_[True, order[1:] != order[:-1]]
        ts, order, is_tool = ts[keep], order[keep], is_tool[keep]

    lat = np.empty(ts.size, dtype=np.float64)
    if ts.size:
        lat[0] = np.nan
        lat[1:] = delta_us_to_seconds(np.diff(ts))
    lat_valid = ~np.isnan(lat)
    lat0 = np.where(lat_valid, lat, 0.0)

    out_rows: dict[str, list] = {
        "conv_id": [], "tier": [], "part_id": [], "n_buckets": [],
        "bucket_ts": [], "filled": [],
        **{m: [] for m in ALL_METRICS},
    }
    for tier in tiers:
        w = TIER_WIDTH_US[tier]
        b = (ts // w) * w  # nondecreasing since ts sorted
        starts = _segment_starts(b)
        ends = np.r_[starts[1:], b.size]
        uniq = b[starts]
        counts = (ends - starts).astype(np.int64)
        tools = np.add.reduceat(is_tool.astype(np.int64), starts) if starts.size else np.empty(0, np.int64)
        n_lat = np.add.reduceat(lat_valid.astype(np.int64), starts) if starts.size else np.empty(0, np.int64)
        # pinned summation contract: IEEE sequential sum in time order
        # (== SQL aggregate over window-ordered rows; deterministic across
        # parallelism levels). Builtin sum is left-to-right float adds.
        lat_list = lat0.tolist()
        s_lat = np.fromiter(
            (sum(lat_list[a:b], 0.0) for a, b in zip(starts, ends)),
            dtype=np.float64,
            count=starts.size,
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_lat = np.where(n_lat > 0, s_lat / n_lat, np.nan)
        # min/max/p95 over valid latencies: sort (bucket, lat) once;
        # NaNs sort to the end of each bucket segment under lexsort
        osel = np.lexsort((lat, b))
        lat_sorted = lat[osel]
        mn = np.where(n_lat > 0, lat_sorted[starts], np.nan)
        k95 = np.ceil(0.95 * n_lat).astype(np.int64) - 1
        k95 = np.clip(k95, 0, None)
        mx_idx = starts + np.maximum(n_lat - 1, 0)
        mx = np.where(n_lat > 0, lat_sorted[np.clip(mx_idx, 0, max(b.size - 1, 0))], np.nan)
        p95 = np.where(n_lat > 0, lat_sorted[np.clip(starts + k95, 0, max(b.size - 1, 0))], np.nan)

        if gapfill and uniq.size:
            grid = np.arange(uniq[0], uniq[-1] + w, w, dtype=np.int64)
            pos = ((uniq - grid[0]) // w).astype(np.int64)
            filled = np.ones(grid.size, dtype=bool)
            filled[pos] = False

            def scatter(vals, fill=0):
                out = np.full(grid.size, fill, dtype=np.float64)
                out[pos] = vals
                return out

            cont = np.vstack([
                scatter(mean_lat, np.nan), scatter(p95, np.nan),
                scatter(mn, np.nan), scatter(mx, np.nan),
            ])
            cont = linear_interp(cont)
            row = {
                "bucket_ts": grid,
                "turn_count": scatter(counts).astype(np.int64),
                "tool_calls": scatter(tools).astype(np.int64),
                "sum_latency": scatter(s_lat),
                "mean_latency": cont[0], "p95_latency": cont[1],
                "min_latency": cont[2], "max_latency": cont[3],
                "filled": filled,
            }
        else:
            row = {
                "bucket_ts": uniq, "turn_count": counts, "tool_calls": tools,
                "sum_latency": s_lat, "mean_latency": mean_lat,
                "p95_latency": p95, "min_latency": mn, "max_latency": mx,
                "filled": np.zeros(uniq.size, dtype=bool),
            }
        out_rows["conv_id"].append(conv_id)
        out_rows["tier"].append(tier)
        out_rows["part_id"].append(part_id)
        out_rows["n_buckets"].append(len(row["bucket_ts"]))
        for k in ("bucket_ts", "filled", *ALL_METRICS):
            out_rows[k].append(row[k])

    return pa.table(
        {
            "conv_id": pa.array(out_rows["conv_id"], g["conv_id"].type),
            "tier": pa.array(out_rows["tier"], pa.string()),
            "part_id": pa.array(out_rows["part_id"], pa.int32()),
            "n_buckets": pa.array(out_rows["n_buckets"], pa.int64()),
            "bucket_ts": pa.array(
                [a.tolist() for a in out_rows["bucket_ts"]],
                pa.list_(pa.timestamp("us")),
            ),
            "turn_count": pa.array([a.tolist() for a in out_rows["turn_count"]], pa.list_(pa.int64())),
            "tool_calls": pa.array([a.tolist() for a in out_rows["tool_calls"]], pa.list_(pa.int64())),
            "sum_latency": pa.array([a.tolist() for a in out_rows["sum_latency"]], pa.list_(pa.float64())),
            "mean_latency": pa.array([a.tolist() for a in out_rows["mean_latency"]], pa.list_(pa.float64())),
            "p95_latency": pa.array([a.tolist() for a in out_rows["p95_latency"]], pa.list_(pa.float64())),
            "min_latency": pa.array([a.tolist() for a in out_rows["min_latency"]], pa.list_(pa.float64())),
            "max_latency": pa.array([a.tolist() for a in out_rows["max_latency"]], pa.list_(pa.float64())),
            "filled": pa.array([a.tolist() for a in out_rows["filled"]], pa.list_(pa.bool_())),
        }
    )


def rollup_nested(
    prepared,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    gapfill: bool = True,
    dedup: bool = False,
):
    """``groupby(conv_id).map_groups`` over prepared turns -> nested tier
    series (THE shuffle, SURVEY.md §7.4). All tiers are computed in one
    pass over each group, so raw turns shuffle exactly once."""
    return prepared.groupby("conv_id").map_groups(
        lambda g: _conv_series(g, tiers, gapfill, dedup),
        batch_format="pyarrow",
    )


def nested_to_long(nested):
    """Explode nested series rows into the long tier table
    (conv_id, tier, bucket_ts, metrics..., filled) — a stateless
    ``map_batches``; no shuffle."""

    def explode(batch: pa.Table) -> pa.Table:
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

    return nested.map_batches(explode, batch_format="pyarrow")


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
    """Full rollup: prune/derive -> one conv_id shuffle -> nested tier series.

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
