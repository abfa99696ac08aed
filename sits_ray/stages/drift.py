"""Distribution-drift diagnostics over the event/tier stores.

Population Stability Index between the first and second half of the
time range — the ops-monitoring companion of the retention tiers (has
the latency distribution drifted week-over-week?). PSI =
``sum_bins (p_i - q_i) * ln(p_i / q_i)`` over equal-width value bins
(the ``hist_value`` binning convention), with the standard
epsilon-smoothing replaced by joint-support restriction (bins observed
in BOTH periods) so the statistic is a deterministic pure function of
the counts.

Scale shape: two stateless passes over the pruned (value, ts) columns —
per-batch (min, max) timestamp partials fold to the integer midpoint on
the driver, then per-batch (bin, period) count partials fold to the
bounded bin table; the corpus never shuffles and only O(bins x blocks)
rows reach the driver. Float contract: ``p = n/total`` is a
bigint/bigint double on both sides, ``ln`` goes through ``math.log`` on
the bounded driver-side bin table (libm == DuckDB ``ln``), and the
contribution expression tree matches the SQL twin exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col) -> np.ndarray:
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


def psi_drift(ds, value_col: str = "value", ts_col: str = "ts",
              bin_width: float = 10.0) -> pd.DataFrame:
    """Per-bin PSI contributions between time halves. Returns
    (bin, n_a, n_b, p, q, contrib) sorted by bin, restricted to bins
    with counts in both periods."""

    def span_partial(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        if us.size == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(us.min())]),
                         "hi": pa.array([int(us.max())])})

    span = ds.map_batches(span_partial, batch_format="pyarrow").to_pandas()
    if span.empty:
        raise ValueError("empty input")
    lo, hi = int(span["lo"].min()), int(span["hi"].max())
    mid = (lo + hi) // 2  # integer midpoint == the SQL (min+max)//2

    def count_partial(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        v = t[value_col].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        in_a = us <= mid
        df = pd.DataFrame({"bin": b, "a": in_a.astype(np.int64),
                           "b2": (~in_a).astype(np.int64)})
        g = df.groupby("bin", sort=False)[["a", "b2"]].sum().reset_index()
        return pa.table({"bin": pa.array(g["bin"].to_numpy()),
                         "n_a": pa.array(g["a"].to_numpy(np.int64)),
                         "n_b": pa.array(g["b2"].to_numpy(np.int64))})

    parts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby("bin", sort=True)[["n_a", "n_b"]].sum().reset_index()
    ta, tb = int(c["n_a"].sum()), int(c["n_b"].sum())
    keep = (c["n_a"] > 0) & (c["n_b"] > 0)
    c = c.loc[keep].reset_index(drop=True)
    p = c["n_a"].to_numpy(np.int64) / ta  # bigint/bigint -> double
    qv = c["n_b"].to_numpy(np.int64) / tb
    contrib = np.array(
        [(pi - qi) * math.log(pi / qi) for pi, qi in zip(p, qv)],
        dtype=np.float64,
    )
    return pd.DataFrame(
        {"bin": c["bin"].to_numpy(np.int64),
         "n_a": c["n_a"].to_numpy(np.int64),
         "n_b": c["n_b"].to_numpy(np.int64),
         "p": p, "q": qv, "contrib": contrib}
    )
