"""Single-process reference implementation (pandas/numpy, no Ray).

The oracle twin for the distributed rollup, mirroring how the reference's
tests call the C++ kernels directly as oracles
(``tests/testthat/test-reduce.R:29-34``). Deliberately written with a
different code path (pandas groupby) than the Ray group kernel so the
bit-for-bit tier comparison (SURVEY.md §5) is a real cross-check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sits_ray.kernels.gapfill import na_linear_vector_interp
from sits_ray.kernels.reduce import nearest_rank
from sits_ray.stages.regularize import TIER_WIDTH_US, part_of


def rollup_reference(
    table: pa.Table,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    gapfill: bool = True,
    dedup: bool = False,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    tool_col: str | None = "tool",
    n_parts: int = 32,
) -> pd.DataFrame:
    """Long-format tier table computed single-process."""
    df = table.to_pandas() if isinstance(table, pa.Table) else table.copy()
    df = df.rename(columns={key: "conv_id", ts_col: "ts", order_col: "order"})
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    if tool_col is not None and tool_col in df.columns:
        df["is_tool"] = df[tool_col].fillna("").ne("")
    else:
        df["is_tool"] = False
    df = df.sort_values(["conv_id", "ts_us", "order"], kind="stable")
    if dedup:
        df = df.drop_duplicates(subset=["conv_id", "order"], keep="first")
    from sits_ray.stages.regularize import delta_us_to_seconds

    d = df.groupby("conv_id")["ts_us"].diff()
    df["lat"] = np.where(
        d.isna(), np.nan, delta_us_to_seconds(d.fillna(0).to_numpy(dtype=np.int64))
    )

    out = []
    for conv, g in df.groupby("conv_id", sort=True):
        for tier in tiers:
            w = TIER_WIDTH_US[tier]
            b = (g["ts_us"].to_numpy() // w) * w
            gg = g.assign(bucket=b)
            # pinned summation contract (SURVEY.md §7.5): IEEE double
            # SEQUENTIAL sum in time order (NaN -> 0), matching both the
            # distributed kernel and SQL aggregation over window-ordered rows.
            def _seq_sum(s):
                return float(sum(s.fillna(0.0).tolist(), 0.0))

            agg = gg.groupby("bucket").agg(
                turn_count=("bucket", "size"),
                tool_calls=("is_tool", "sum"),
                sum_latency=("lat", _seq_sum),
                n_latency=("lat", "count"),
                min_latency=("lat", "min"),
                max_latency=("lat", "max"),
            )
            agg["mean_latency"] = np.where(
                agg["n_latency"] > 0, agg["sum_latency"] / agg["n_latency"], np.nan
            )
            agg["p95_latency"] = gg.groupby("bucket")["lat"].apply(
                lambda s: nearest_rank(s.dropna().to_numpy(), 0.95)
                if s.notna().any()
                else np.nan
            )
            agg = agg.sort_index()
            if gapfill:
                grid = np.arange(agg.index[0], agg.index[-1] + w, w, dtype=np.int64)
                agg = agg.reindex(grid)
                filled = agg["turn_count"].isna()
                agg["turn_count"] = agg["turn_count"].fillna(0).astype("int64")
                agg["tool_calls"] = agg["tool_calls"].fillna(0).astype("int64")
                agg["n_latency"] = agg["n_latency"].fillna(0).astype("int64")
                agg["sum_latency"] = agg["sum_latency"].fillna(0.0)
                for c in ("mean_latency", "p95_latency", "min_latency", "max_latency"):
                    agg[c] = na_linear_vector_interp(agg[c].to_numpy(dtype=np.float64))
                agg["filled"] = filled.to_numpy()
            else:
                agg["filled"] = False
                agg["turn_count"] = agg["turn_count"].astype("int64")
                agg["tool_calls"] = agg["tool_calls"].astype("int64")
                agg["n_latency"] = agg["n_latency"].astype("int64")
            agg = agg.reset_index().rename(columns={"index": "bucket", "bucket": "bucket"})
            agg.insert(0, "conv_id", conv)
            agg.insert(1, "tier", tier)
            agg.insert(2, "part_id", np.int32(part_of(conv, n_parts)))
            out.append(agg)
    res = pd.concat(out, ignore_index=True)
    res["bucket_ts"] = res.pop("bucket").astype("datetime64[us]")
    cols = [
        "conv_id", "tier", "part_id", "bucket_ts",
        "turn_count", "tool_calls", "n_latency", "sum_latency",
        "mean_latency", "p95_latency", "min_latency", "max_latency", "filled",
    ]
    return res[cols]
