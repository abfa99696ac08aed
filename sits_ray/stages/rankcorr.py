"""Corpus-level Spearman rank correlation without a global sort.

Spearman's rho between event value and inter-event latency — the
corpus-level sibling of ``kendall_value_latency`` (Kendall: per
conversation, O(n^2) pair signs inside bounded groups; Spearman: one
global statistic over every (value, latency) pair in the corpus). The
reference's dependence diagnostics are per-series; the corpus-level
variant is the one a 100-TB monitor actually asks ("do slow turns carry
systematically different values?").

The classic blocker at scale is that Spearman needs GLOBAL ranks of
both variables. We never sort globally:

1. one conv-partitioned pass (the ``map_conv_partitions`` shuffle all
   per-series operators share) emits integer pairs
   ``qx = floor(value*100 + 0.5)`` cents (the acf/PQ quantization
   contract, computed in DOUBLE) and ``qy`` = the raw microsecond gap
   to the previous turn (an exact int64, monotone in the day-split
   latency seconds, so ranks are identical);
2. per-batch value-count partials fold to two bounded driver-side
   histograms (O(distinct values) rows, same shape as the drift
   monitors);
3. doubled midranks ``dmr = 2*before + t + 1`` (odd integers — no
   half-ranks) are broadcast as two sorted lookup arrays via
   ``ray.put``; a second pass maps each pair through ``searchsorted``
   and emits one int64 partial ``sum(dx*dy)`` per batch.

Everything up to the final expression is exact integer arithmetic
(Python bigints on the driver, HUGEINT in the SQL twin):
``rho = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))``
with each factor cast to double once — two IEEE correctly-rounded
sqrts, one multiply, one division, identical trees both sides. The
doubled-rank scaling cancels exactly in real arithmetic and both
engines compute the SAME integers, so bit-exactness holds.

At ~1e9+ pair rows the per-batch int64 product partial would need
int128 (dx*dy <= 4n^2); the histogram/midrank state stays bounded by
the distinct-value counts regardless of corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def spearman_pair_kernel(g: pa.Table) -> pa.Table:
    """Whole-partition kernel: per-conv time-ordered (value cents,
    gap microseconds) integer pairs for every turn with a predecessor."""
    from sits_ray.stages.eventops import _sorted_partition

    _, codes, ts, _, ex, starts, _ = _sorted_partition(g, ("value",))
    n = codes.size
    if n == 0:
        return pa.table({"qx": pa.array([], pa.int64()),
                         "qy": pa.array([], pa.int64())})
    v = ex["value"].astype(np.float64)
    qx = np.floor(v * 100.0 + 0.5).astype(np.int64)
    keep = np.ones(n, dtype=bool)
    keep[starts] = False  # first turn of each conv has no predecessor
    gap = np.empty(n, dtype=np.int64)
    gap[1:] = ts[1:] - ts[:-1]
    return pa.table({"qx": pa.array(qx[keep]), "qy": pa.array(gap[keep])})


def _doubled_midranks(hist: pd.DataFrame):
    """(sorted q, t counts) -> (q array, dmr array, Sd, Sdd) with
    dmr = 2*before + t + 1 and exact Python-int sums of dmr and dmr^2
    weighted by t."""
    qs = hist["q"].to_numpy(np.int64)
    t = hist["t"].to_numpy(np.int64)
    before = np.concatenate(([0], t.cumsum()[:-1]))
    dmr = 2 * before + t + 1
    sd = sum(int(c) * int(d) for c, d in zip(t, dmr))
    sdd = sum(int(c) * int(d) * int(d) for c, d in zip(t, dmr))
    return qs, dmr, sd, sdd


def spearman_value_latency(ds) -> pd.DataFrame:
    """Corpus Spearman rho between value and inter-event latency
    (module docstring). Returns one row (n, rho)."""
    from sits_ray.stages.eventops import map_conv_partitions

    pairs = map_conv_partitions(
        ds, spearman_pair_kernel, key="user_id", order_col="event_id",
        extra_cols=("value",),
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        out = []
        for which, col in (("x", "qx"), ("y", "qy")):
            c = pd.Series(t[col].to_numpy(zero_copy_only=False)).value_counts()
            out.append(pd.DataFrame({
                "which": which, "q": c.index.to_numpy(np.int64),
                "t": c.to_numpy(np.int64)}))
        d = pd.concat(out, ignore_index=True)
        return pa.table({"which": pa.array(d["which"]),
                         "q": pa.array(d["q"].to_numpy(np.int64)),
                         "t": pa.array(d["t"].to_numpy(np.int64))})

    h = (pairs.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
              .groupby(["which", "q"], sort=True)["t"].sum().reset_index())
    hx = h.loc[h["which"] == "x", ["q", "t"]].reset_index(drop=True)
    hy = h.loc[h["which"] == "y", ["q", "t"]].reset_index(drop=True)
    if hx.empty:
        return pd.DataFrame([{"n": np.int64(0), "rho": float("nan")}])
    n = int(hx["t"].sum())
    qx_s, dmr_x, sx, sxx = _doubled_midranks(hx)
    qy_s, dmr_y, sy, syy = _doubled_midranks(hy)
    ref = ray.put((qx_s, dmr_x, qy_s, dmr_y))

    def prod_partial(t: pa.Table) -> pa.Table:
        qxs, dx_tab, qys, dy_tab = ray.get(ref)
        dx = dx_tab[np.searchsorted(qxs, t["qx"].to_numpy(zero_copy_only=False))]
        dy = dy_tab[np.searchsorted(qys, t["qy"].to_numpy(zero_copy_only=False))]
        return pa.table({"sxy": pa.array([int(np.dot(dx, dy))], pa.int64())})

    parts = pairs.map_batches(prod_partial, batch_format="pyarrow").to_pandas()
    sxy = sum(int(v) for v in parts["sxy"])
    # sum of doubled midranks is n(n+1) identically — lets the common
    # factor n cancel ALGEBRAICALLY (rho = A / (sqrt(B) * sqrt(C)));
    # the smaller integers stay within the SQL twin's exact-cast range
    # (|x| < 2^85 two-limb cast) to ~2e8 pair rows
    assert sx == n * (n + 1) and sy == n * (n + 1)
    t2 = n * (n + 1) * (n + 1)
    a = sxy - t2
    b = sxx - t2
    c = syy - t2
    rho = (float(a) / (math.sqrt(float(b)) * math.sqrt(float(c)))
           if b > 0 and c > 0 else float("nan"))
    return pd.DataFrame([{"n": np.int64(n), "rho": rho}])
