"""Traffic-concentration audit: exact Gini + top-share over per-key
volumes, WITHOUT a global sort.

"5% of conversations carry 60% of events" is the first capacity-planning
fact anyone asks of a transcript corpus (Lorenz/Gini concentration —
the inequality twin of ``type_gini``'s DIVERSITY impurity). The naive
computation sorts all n per-conv totals; at corpus scale that is a
global sort of a corpus-cardinality table. This module's shape instead:

1. per-batch partial counts per conv (rows shrink to the batch's
   distinct convs before anything shuffles),
2. one ``hashagg.part_aggregate`` exchange co-locates each conv's
   partials; each partition folds its convs to totals and emits a
   VALUE HISTOGRAM (total -> frequency) — O(distinct totals) rows,
3. the driver folds the bounded histograms and evaluates Gini and the
   top-share cuts from tie-block arithmetic in exact Python ints.

Gini with x sorted ascending and 1-based ranks is
``(2*sum(i*x_i) - (n+1)*S) / (n*S)`` — within a tie block of value v,
frequency f, ranks r0+1..r0+f, the rank-weighted sum is
``v*(f*r0 + f*(f+1)/2)``, so the histogram determines the statistic
exactly (ties are value-identical; the intra-tie order is irrelevant).
Everything stays integer until three final divisions; the numerators
exceed int64 at planet scale, so the driver uses Python bigints and the
``gini_conv_volume`` SQL twin uses HUGEINT — both convert
round-to-nearest to double before the one division each.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _volume_histogram(ds, key_col: str, n_parts: int) -> pd.Series:
    """(total -> frequency) histogram of per-key row counts. Exact: each
    key's partial counts are co-located by the exchange before summing."""
    from sits_ray.stages.hashagg import part_aggregate

    def batch_partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(t[key_col].to_numpy(zero_copy_only=False)) \
            .value_counts()
        return pa.table({key_col: pa.array(vc.index.to_numpy(np.int64)),
                         "cnt": pa.array(vc.to_numpy(np.int64))})

    partials = ds.map_batches(batch_partial, batch_format="pyarrow")

    def part_hist(df: pd.DataFrame) -> pd.DataFrame:
        totals = df.groupby(key_col, sort=False)["cnt"].sum()
        h = totals.value_counts()
        return pd.DataFrame({"x": h.index.to_numpy(np.int64),
                             "f": h.to_numpy(np.int64)})

    hist = part_aggregate(partials, part_hist, key_col=key_col,
                          n_parts=n_parts).to_pandas()
    return hist.groupby("x", sort=True)["f"].sum()


def _top_share_num(xs: np.ndarray, fs: np.ndarray, m: int) -> int:
    """Sum of the m largest values given an ascending (value, freq)
    histogram — exact ints, ties value-identical."""
    total, left = 0, m
    for v, f in zip(xs[::-1], fs[::-1]):
        take = min(int(f), left)
        total += int(v) * take
        left -= take
        if left == 0:
            break
    return total


def gini_concentration(ds, key_col: str = "user_id",
                       n_parts: int = 32) -> pd.DataFrame:
    """One audit row (module docstring): n_convs, n_events, gini,
    top10_share, top1_share of per-``key_col`` event volumes."""
    h = _volume_histogram(ds, key_col, n_parts)
    xs = h.index.to_numpy(np.int64)
    fs = h.to_numpy(np.int64)
    n = int(fs.sum())
    s = int((xs.astype(object) * fs.astype(object)).sum())
    s1, r0 = 0, 0
    for v, f in zip(xs.tolist(), fs.tolist()):
        s1 += v * (f * r0 + f * (f + 1) // 2)
        r0 += f
    gini = float(2 * s1 - (n + 1) * s) / float(n * s)
    m10 = max(1, n // 10)
    m1 = max(1, n // 100)
    return pd.DataFrame([{
        "n_convs": np.int64(n), "n_events": np.int64(s),
        "gini": gini,
        "top10_share": _top_share_num(xs, fs, m10) / s,
        "top1_share": _top_share_num(xs, fs, m1) / s,
    }])
