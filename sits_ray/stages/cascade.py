"""Continuous-aggregate tier cascade: re-aggregate a finer tier into a
coarser one WITHOUT touching raw data (SURVEY.md §7.7 — the incremental
retention-maintenance path; the one-pass rollup from raw stays the exact
path for full rebuilds).

Semantics per coarse (conv, bucket):

* ``turn_count`` / ``tool_calls`` / ``n_latency``: sums (exact);
* ``sum_latency``: IEEE-sequential sum of the finer sums in time order
  (deterministic; differs from the raw-path sum only in association
  order, < 1 ulp relative);
* ``mean_latency`` = sum_latency / n_latency (exact given the above);
* ``min/max_latency``: min/max (exact);
* ``p95_latency``: nearest-rank over the finer buckets' p95 values —
  an APPROXIMATION (exact p95 is not re-aggregable from quantiles);
  flagged by the ``p95_exact=false`` column. Pipelines needing exact
  coarse p95 use the one-pass rollup from raw.

Gap-filled finer rows (``filled=true``) are excluded from re-aggregation
— they carry interpolated values, not observations; the coarse tier is
re-gap-filled on its own grid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sits_ray.kernels.gapfill import linear_interp
from sits_ray.kernels.reduce import nearest_rank
from sits_ray.stages.regularize import TIER_WIDTH_US, _seq_segment_sums


def cascade_tier(long_ds, to_tier: str, gapfill: bool = True):
    """Long finer-tier Dataset -> long coarser-tier Dataset.

    One ``groupby(conv_id)`` shuffle over the (already small) finer tier.
    """
    w = TIER_WIDTH_US[to_tier]

    _EMPTY = pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype=object),
            "tier": pd.Series([], dtype=object),
            "part_id": pd.Series([], dtype="int32"),
            "bucket_ts": pd.Series([], dtype="datetime64[us]"),
            "turn_count": pd.Series([], dtype="int64"),
            "tool_calls": pd.Series([], dtype="int64"),
            "n_latency": pd.Series([], dtype="int64"),
            "sum_latency": pd.Series([], dtype="float64"),
            "mean_latency": pd.Series([], dtype="float64"),
            "p95_latency": pd.Series([], dtype="float64"),
            "min_latency": pd.Series([], dtype="float64"),
            "max_latency": pd.Series([], dtype="float64"),
            "filled": pd.Series([], dtype=bool),
            "p95_exact": pd.Series([], dtype=bool),
        }
    )

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g[~g["filled"]].sort_values("bucket_ts")
        if g.empty:
            return _EMPTY.copy()
        ts = g["bucket_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        b = (ts // w) * w
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], b.size]
        uniq = b[starts]
        tc = np.add.reduceat(g["turn_count"].to_numpy(), starts)
        tool = np.add.reduceat(g["tool_calls"].to_numpy(), starts)
        nl = np.add.reduceat(g["n_latency"].to_numpy(), starts)
        sl = _seq_segment_sums(g["sum_latency"].to_numpy(dtype=np.float64), starts, ends)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(nl > 0, sl / nl, np.nan)
        mn_src = g["min_latency"].to_numpy(dtype=np.float64)
        mx_src = g["max_latency"].to_numpy(dtype=np.float64)
        mn = np.fmin.reduceat(mn_src, starts)
        mx = np.fmax.reduceat(mx_src, starts)
        p95_src = g["p95_latency"].to_numpy(dtype=np.float64)
        p95 = np.array(
            [
                nearest_rank(p95_src[a:e][~np.isnan(p95_src[a:e])], 0.95)
                if (~np.isnan(p95_src[a:e])).any()
                else np.nan
                for a, e in zip(starts, ends)
            ]
        )
        out = pd.DataFrame(
            {
                "conv_id": g["conv_id"].iloc[0],
                "tier": to_tier,
                "part_id": g["part_id"].iloc[0],
                "bucket_ts": uniq,
                "turn_count": tc.astype("int64"),
                "tool_calls": tool.astype("int64"),
                "n_latency": nl.astype("int64"),
                "sum_latency": sl,
                "mean_latency": mean,
                "p95_latency": p95,
                "min_latency": mn,
                "max_latency": mx,
                "filled": False,
                "p95_exact": False,
            }
        )
        if gapfill:
            grid = np.arange(uniq[0], uniq[-1] + w, w, dtype=np.int64)
            out = out.set_index("bucket_ts").reindex(grid).reset_index(names="bucket_ts")
            filled = out["turn_count"].isna()
            for c in ("turn_count", "tool_calls", "n_latency"):
                out[c] = out[c].fillna(0).astype("int64")
            out["sum_latency"] = out["sum_latency"].fillna(0.0)
            for c in ("mean_latency", "p95_latency", "min_latency", "max_latency"):
                out[c] = linear_interp(out[c].to_numpy(dtype=np.float64)[None, :])[0]
            out["filled"] = filled.to_numpy()
            out["conv_id"] = g["conv_id"].iloc[0]
            out["tier"] = to_tier
            out["part_id"] = g["part_id"].iloc[0]
            out["p95_exact"] = False
        out["bucket_ts"] = out["bucket_ts"].astype("datetime64[us]")
        return out

    return long_ds.groupby("conv_id").map_groups(per_conv, batch_format="pandas")
