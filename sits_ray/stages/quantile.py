"""Exact global order statistics WITHOUT a global sort.

``sits_reduce``'s ``t_q*`` reducers (src/reduce_fns.cpp) take per-series
quantiles inside one kernel call; a GLOBAL quantile over 10^12 rows can't
sort. This module computes the exact nearest-rank quantile
(``sorted[ceil(q*n)-1]`` — the repo-pinned p95 rule, == DuckDB
``quantile_disc``) by iterative histogram refinement:

1. one aggregate pass for (count, min, max);
2. per round: one streaming pass producing, per block, a below-range
   counter and a B-bin equal-width histogram of the candidate range
   (combine-before-shuffle: only B+1 counters per block leave the task);
   the driver locates the bin holding the target rank and narrows the
   range to that bin PLUS one bin of margin on each side — every mask is
   a plain comparison and the rank is re-derived from the global count
   each round, so 1-ulp bin-edge fuzz can never mis-rank;
3. when the candidate population fits ``max_collect``, pull just those
   rows and take the order statistic exactly.

Each round shrinks the range ~bins/3 x, so 10^12 uniformly-spread float64
values converge in ~5 passes. No shuffle of data rows anywhere — the only
cross-task traffic is the counter table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _rank(q: float, n: int) -> int:
    """Nearest-rank index (1-based): ceil(q*n), clamped to [1, n]."""
    return min(max(int(math.ceil(q * n)), 1), n)


def _clean_col(ds, col: str):
    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(t[col], pa.float64())
        v = v.filter(pc.and_kleene(pc.is_valid(v), pc.invert(pc.is_nan(v))))
        return pa.table({col: v})

    return ds.map_batches(clean, batch_format="pyarrow")


def exact_quantile(ds, col: str, q: float, bins: int = 1024,
                   max_collect: int = 65536, max_rounds: int = 64) -> float:
    """Exact ``quantile_disc(col, q)`` over a Dataset: selection by
    histogram refinement (no sort, no full materialization). NaNs/nulls
    ignored, matching SQL aggregate semantics."""
    return exact_quantiles(ds, col, (q,), bins=bins,
                           max_collect=max_collect, max_rounds=max_rounds)[q]


def exact_quantiles(ds, col: str, qs, bins: int = 1024,
                    max_collect: int = 65536,
                    max_rounds: int = 64) -> dict[float, float]:
    """Several exact quantiles of one column: the cleaned value dataset is
    materialized ONCE and its (count, min, max) stats computed once —
    only the per-rank refinement passes repeat per quantile (3 quantiles
    previously paid 3 clean+materialize+stats passes)."""
    from ray.data.aggregate import Count, Max, Min

    vals = _clean_col(ds, col).materialize()
    stats = vals.aggregate(Count(col), Min(col), Max(col))
    n = int(stats[f"count({col})"])
    if n == 0:
        return {q: float("nan") for q in qs}
    lo0, hi0 = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    return {
        q: _refine(vals, col, n, lo0, hi0, q, bins, max_collect, max_rounds)
        for q in qs
    }


def _refine(vals, col: str, n: int, lo: float, hi: float, q: float,
            bins: int, max_collect: int, max_rounds: int) -> float:
    from sits_ray.stages.joins import _right_as_table

    k = _rank(q, n)  # global 1-based rank; invariant: k-th value in [lo, hi]

    for _ in range(max_rounds):
        if lo == hi:
            return lo

        def tallies(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            below = int((v < lo).sum())
            vr = v[(v >= lo) & (v <= hi)]
            idx = np.minimum(
                ((vr - lo) / (hi - lo) * bins).astype(np.int64), bins - 1
            )
            counts = np.bincount(np.maximum(idx, 0), minlength=bins)
            return pa.table(
                {"bin": np.arange(-1, bins, dtype=np.int64),
                 "cnt": np.concatenate([[below], counts]).astype(np.int64)}
            )

        # per-block tallies are (bins+1) counters each — reduce them on
        # the driver (blocks x 1 KB); a Dataset.groupby("bin") here was
        # the measured ~10k-rows/s pathology, ~6 s/round at 64 blocks
        tt = _right_as_table(
            vals.map_batches(tallies, batch_format="pyarrow")
        )
        counts = np.zeros(bins + 1, dtype=np.int64)
        np.add.at(
            counts, tt["bin"].to_numpy() + 1, tt["cnt"].to_numpy()
        )
        n_below, hist = int(counts[0]), counts[1:]
        kl = k - n_below  # rank within [lo, hi]; >=1 by the invariant
        cum = np.cumsum(hist)
        b = int(np.searchsorted(cum, kl))

        edge = lambda i: hi if i >= bins else lo + (hi - lo) * (i / bins)  # noqa: E731
        new_lo = lo if b == 0 else edge(b - 1)
        new_hi = hi if b >= bins - 1 else edge(b + 2)
        margin_cnt = int(hist[max(b - 1, 0):min(b + 2, bins)].sum())
        if new_lo == lo and new_hi == hi:
            # ulp-wide range: <= ~3*bins distinct doubles remain, but each
            # may carry billions of duplicates — resolve by DISTINCT-value
            # counting, never by collecting rows
            return _resolve_by_distinct(vals, col, lo, hi, k)
        lo, hi = new_lo, new_hi

        if margin_cnt <= max_collect:
            def pick(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
                v = t[col].to_numpy(zero_copy_only=False)
                below = int((v < lo).sum())
                keep = v[(v >= lo) & (v <= hi)]
                return pa.table(
                    {"below": pa.array([below], pa.int64()),
                     "vals": pa.array([keep.tolist()],
                                      pa.list_(pa.float64()))}
                )

            parts = vals.map_batches(pick, batch_format="pyarrow").to_pandas()
            n_below2 = int(parts["below"].sum())
            cand = np.sort(np.concatenate(
                [np.asarray(x, dtype=np.float64) for x in parts["vals"]]
            ))
            return float(cand[k - n_below2 - 1])
    raise RuntimeError("exact_quantile did not converge")


def _resolve_by_distinct(vals, col: str, lo: float, hi: float, k: int) -> float:
    """Terminal step for duplicate-heavy ranges: per block emit the
    below-range count plus (distinct value, count) pairs inside [lo, hi]
    (a handful of representable doubles), reduce, walk the cumulative
    counts to the global rank ``k``."""
    from sits_ray.stages.joins import _right_as_table

    def uniq(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        below = int((v < lo).sum())
        u, c = np.unique(v[(v >= lo) & (v <= hi)], return_counts=True)
        return pa.table(
            {"val": np.concatenate([[-np.inf], u]),
             "cnt": np.concatenate([[below], c]).astype(np.int64)}
        )

    # per-block pairs are O(distinct-in-range) = a few x bins rows each:
    # reduce on the driver (same rationale as the _refine tally path)
    tt = _right_as_table(vals.map_batches(uniq, batch_format="pyarrow"))
    agg = (
        pd.DataFrame({"val": tt["val"].to_numpy(), "cnt": tt["cnt"].to_numpy()})
        .groupby("val", sort=True)["cnt"].sum().reset_index()
    )
    n_below = 0
    if len(agg) and np.isneginf(agg.loc[0, "val"]):
        n_below = int(agg.loc[0, "cnt"])
        agg = agg.iloc[1:]
    cum = np.cumsum(agg["cnt"].to_numpy())
    i = int(np.searchsorted(cum, k - n_below))
    return float(agg["val"].to_numpy()[i])
