"""Histogram-Based Outlier Score (HBOS) over the event store.

Goldstein & Dengel 2012: score each record by the log of the inverse
relative histogram height of its feature bins, summed over independent
features — a linear-time unsupervised outlier detector that is the
standard first-pass anomaly audit before the heavier per-series
detectors (Hampel, CUSUM, matrix profile) run. Features here are the
``hist_value`` equal-width value bin and the hour-of-day — "an unusual
value at an unusual time" scores as the sum of two rarity terms.

The reference's per-series quality screens (`sits_clean`,
`sits_detect_change`) operate within one series; HBOS is the
corpus-level complement over the raw event firehose.

Scale shape: pass 1 emits per-batch (bin, count) partials for both
features — O(bins x blocks) rows to the driver, corpus never shuffles;
the driver folds them to two bounded ln-contribution tables (value
range / width, and 24 hours). Pass 2 broadcasts the tiny tables inside
the batch closure, scores each row with two dict lookups + one double
add, and keeps a per-batch top-k partial — O(blocks x k) rows merge on
the driver. Zero shuffles, two streaming passes.

Float contract (mirrored by the ``hbos_outliers`` SQL twin):
``contrib = ln(max_count / count)`` per bin with the division done in
doubles and ``ln`` via ``math.log`` (libm == DuckDB ``ln``) on the
bounded driver-side tables; the row score is ``contrib_value +
contrib_hour`` in that order. Ranking sorts (score desc, event_id asc)
— equal doubles on both sides make the order deterministic.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_US_PER_HOUR = 3_600_000_000


def hbos_outliers(ds, k: int = 20, value_col: str = "value",
                  ts_col: str = "ts", id_col: str = "event_id",
                  bin_width: float = 10.0) -> pd.DataFrame:
    """Top-``k`` HBOS outlier events (module docstring). Returns
    (event_id, vbin, hour, score) sorted by (score desc, event_id)."""

    def count_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        vbin = np.floor(v / bin_width).astype(np.int64)
        hour = (us // _US_PER_HOUR) % 24
        gv = pd.Series(vbin).value_counts()
        gh = pd.Series(hour).value_counts()
        return pa.table({
            "feat": pa.array(["v"] * len(gv) + ["h"] * len(gh)),
            "bin": pa.array(np.r_[gv.index.to_numpy(np.int64),
                                  gh.index.to_numpy(np.int64)]),
            "c": pa.array(np.r_[gv.to_numpy(np.int64),
                                gh.to_numpy(np.int64)]),
        })

    parts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    tot = parts.groupby(["feat", "bin"], sort=True)["c"].sum()
    contrib: dict[str, dict[int, float]] = {}
    for feat in ("v", "h"):
        cnt = tot.loc[feat]
        mc = int(cnt.max())
        contrib[feat] = {int(b): math.log(mc / int(c))
                         for b, c in cnt.items()}

    cv, ch = contrib["v"], contrib["h"]

    def score_topk(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        eid = t[id_col].to_numpy(zero_copy_only=False)
        vbin = np.floor(v / bin_width).astype(np.int64)
        hour = (us // _US_PER_HOUR) % 24
        df = pd.DataFrame({
            "event_id": eid, "vbin": vbin, "hour": hour,
            "score": pd.Series(vbin).map(cv).to_numpy(np.float64)
                     + pd.Series(hour).map(ch).to_numpy(np.float64),
        })
        df = df.sort_values(["score", "event_id"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = ds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    return (top.sort_values(["score", "event_id"], ascending=[False, True])
               .head(k).reset_index(drop=True))


def benford_digits(ds, value_col: str = "value") -> pd.DataFrame:
    """Benford first-significant-digit audit of a value column (Newcomb
    1881 / Benford 1938; Nigrini's fraud-screen usage) — the classic
    "were these numbers made up?" data-quality check over a metric
    firehose. Returns one row per digit 1-9: observed count, expected
    Benford share ``log10(1 + 1/d)``, and the chi-square contribution
    ``(obs - n*e)^2 / (n*e)``; ``sum(contrib)`` is the test statistic
    (8 degrees of freedom).

    Digit extraction is integer-exact on both engines: values quantize
    to cents (``floor(v * 100 + 0.5)`` in DOUBLE — the repo-wide
    quantize contract), non-positive cents are excluded, and the first
    digit is the leading character of the int64's decimal string (no
    float ``log10`` near power-of-ten boundaries). Scale shape: one
    streaming pass of per-batch 9-counter partials; only O(9 x blocks)
    rows reach the driver, the corpus never shuffles.

    Float contract (mirrored by the ``benford_value_digits`` SQL twin):
    ``e = ln(1 + 1/d) / ln(10)`` with both ``ln`` via ``math.log``
    (libm == DuckDB ``ln``) and ``1.0/d`` a double division; expected
    count ``n * e`` reused as a common subexpression; the squared
    deviation is written ``diff * diff`` (never ``pow`` — libm ``pow``
    is not guaranteed bit-equal to the product)."""

    def digit_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        if cents.size == 0:
            return pa.table({"digit": pa.array([], pa.int64()),
                             "n_obs": pa.array([], pa.int64())})
        first = pd.Series(cents).astype(str).str[0].astype(np.int64)
        cnt = np.bincount(first.to_numpy(), minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10)),
                         "n_obs": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(digit_partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby("digit", sort=True)["n_obs"].sum().reindex(
        range(1, 10), fill_value=0)
    n = int(c.sum())
    ln10 = math.log(10.0)
    rows = []
    for d in range(1, 10):
        e = math.log(1.0 + 1.0 / d) / ln10
        exp_n = n * e
        diff = int(c[d]) - exp_n
        rows.append((d, int(c[d]), e, diff * diff / exp_n))
    return pd.DataFrame(rows, columns=["digit", "n_obs", "p_expected",
                                       "contrib"]).astype(
        {"digit": np.int64, "n_obs": np.int64})
