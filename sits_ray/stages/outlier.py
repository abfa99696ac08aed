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


def lof_embeddings(ds, k: int = 5) -> pd.DataFrame:
    """Local Outlier Factor (Breunig et al., SIGMOD 2000) over the
    embedding table — the density-based member of the outlier family
    (HBOS: histogram rarity; Hampel/CUSUM/matrix-profile: per-series).
    LOF compares each point's local reachability density to its
    neighbors': ~1 inside any uniform-density region (whatever its
    scale), >> 1 for points whose neighborhood is much sparser than
    their neighbors' neighborhoods.

    Variant contract (pinned on both engines): squared Euclidean
    distances over the PQ family's ``floor(x*10000 + 0.5)`` int64
    quantization — monotone in true distance, so the kNN sets and
    k-distances are the classic ones while every distance, reach
    distance and reach SUM stays an exact int64. Neighbor sets are
    exactly k with (d2, id) tie-break (the with-ties variant is not
    deterministic). lrd ratios collapse algebraically:
    ``lrd(b)/lrd(a) = S(a)/S(b)`` with ``S(x) = sum of reach
    distances``, so ``lof(a) = fold_{b in N(a), rank order}
    (S(a)/S(b)) / k`` — k float divisions folded left-to-right from
    0.0 then ONE division by k, the exact tree the SQL twin replays.

    Scale shape: the quantized matrix broadcasts once (ray.put); each
    batch computes one exact int64 Gram block ``|a|^2 + |b|^2 - 2ab``
    and ships only its (rows x k) neighbor table; the driver finishes
    on the bounded n x k table. At corpus scale the broadcast side
    becomes the IVF-bucketed candidate set (stages/similarity.ivf
    layout) — same kernel, pruned candidates."""
    import ray

    t = ds.to_pandas()
    q = np.floor(
        np.stack(t["embedding"].to_numpy()).astype(np.float64) * 10000.0
        + 0.5
    ).astype(np.int64)
    ids = t["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    q, ids = q[order], ids[order]
    nn = (q * q).sum(axis=1)
    ref = ray.put((q, ids, nn))

    def knn_batch(b: pd.DataFrame) -> pd.DataFrame:
        qq, aid, an = ray.get(ref)
        bq = np.floor(
            np.stack(b["embedding"].to_numpy()).astype(np.float64) * 10000.0
            + 0.5
        ).astype(np.int64)
        bids = b["vec_id"].to_numpy(np.int64)
        bn = (bq * bq).sum(axis=1)
        d2 = bn[:, None] + an[None, :] - 2 * (bq @ qq.T)
        rows = []
        for i in range(len(bids)):
            d = d2[i].copy()
            self_pos = np.searchsorted(aid, bids[i])
            d[self_pos] = np.iinfo(np.int64).max  # exclude self
            sel = np.lexsort((aid, d))[:k]
            rows.append(pd.DataFrame({
                "a": bids[i], "rnk": np.arange(1, k + 1, dtype=np.int64),
                "b": aid[sel], "d2": d[sel]}))
        return pd.concat(rows, ignore_index=True)

    from sits_ray.stages.joins import _right_as_table

    kt = _right_as_table(ds.map_batches(knn_batch, batch_format="pandas"))
    knn = pd.DataFrame({c: kt[c].to_numpy() for c in ("a", "rnk", "b", "d2")})
    kdist = knn.groupby("a")["d2"].max()  # rank-k distance
    reach = np.maximum(kdist.reindex(knn["b"]).to_numpy(np.int64),
                       knn["d2"].to_numpy(np.int64))
    knn["r"] = reach
    s = knn.groupby("a")["r"].sum().astype(np.int64)  # S(x), exact int
    sa = s.reindex(knn["a"]).to_numpy(np.int64)
    sb = s.reindex(knn["b"]).to_numpy(np.int64)
    with np.errstate(divide="ignore"):
        knn["term"] = sa.astype(np.float64) / sb.astype(np.float64)
    knn = knn.sort_values(["a", "rnk"])
    out_rows = []
    for a_id, g in knn.groupby("a", sort=True):
        acc = 0.0
        for v in g["term"].to_numpy():   # left-to-right fold, rank order
            acc = acc + v
        out_rows.append({"vec_id": np.int64(a_id),
                         "kdist": np.int64(int(kdist[a_id])),
                         "s_reach": np.int64(int(s[a_id])),
                         "lof": acc / float(k)})
    return pd.DataFrame(out_rows)


def esd_daily_volume(ds, rounds: int = 5,
                     ts_col: str = "ts") -> pd.DataFrame:
    """Generalized ESD iterative outlier removal (Rosner 1983) over the
    daily event-volume series — the corpus-calendar anomaly audit next
    to the per-series detectors: each round removes the day whose count
    deviates most from the REMAINING days' mean, so one giant spike
    cannot mask a second one (the masking problem plain z-scores have).

    Integer-exact selection: with n remaining days, daily counts y and
    their sum s, the argmax of ``|n*y - s|`` (ties -> day asc) equals
    the argmax of |y - mean| without any division. The reported
    ``r_stat = (d/n) / sqrt((n*q - s^2)/(n*(n-1)))`` (q = sum of y^2) is
    a pinned float tree of exact-cast integers — the usual ESD test
    statistic. One per-batch day census, bounded driver walk; the SQL
    twin is a recursive CTE whose working set is the remaining-day
    table, the argmax expressed with window aggregates over it. Returns
    one row per round: (round, day_removed, n_before, d_num, r_stat)."""

    def census(t: pa.Table) -> pa.Table:
        us = t[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        day = us // 86400000000
        g = pd.Series(day).value_counts()
        return pa.table({"day": pa.array(g.index.to_numpy(np.int64)),
                         "y": pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(census, batch_format="pyarrow").to_pandas()
           .groupby("day", sort=True)["y"].sum().reset_index())
    remaining = {int(d): int(y) for d, y in zip(c["day"], c["y"])}
    rows = []
    for t in range(1, rounds + 1):
        if len(remaining) < 3:
            break
        n = len(remaining)
        s = sum(remaining.values())
        q = sum(y * y for y in remaining.values())
        # argmax |n*y - s|, ties -> day asc
        best_day, best_d = None, -1
        for d in sorted(remaining):
            dn = abs(n * remaining[d] - s)
            if dn > best_d:
                best_day, best_d = d, dn
        # all-equal remaining days: deviation and variance are both 0 —
        # report r_stat = 0 (the twin's CASE arm) instead of 0/0
        if n * q - s * s == 0:
            r_stat = 0.0
        else:
            var = float(n * q - s * s) / float(n * (n - 1))
            r_stat = (float(best_d) / float(n)) / math.sqrt(var)
        rows.append({"round": np.int64(t),
                     "day_removed": np.int64(best_day),
                     "n_before": np.int64(n),
                     "d_num": np.int64(best_d),
                     "r_stat": r_stat})
        del remaining[best_day]
    return pd.DataFrame(rows)


def changepoint_daily_volume(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Single least-squares change-point on the daily event-volume
    series (the corpus-calendar analog of sits_detect_change's abrupt-
    shift case, and the two-segment special case of the per-conv
    segmenter in segment_activity_1d): pick the split day b maximizing
    ``f(b) = s_l^2/n_l + s_r^2/n_r`` — equivalently minimizing the
    two-segment SSE — where s/n are the left/right count sums and sizes.

    Parity contract: every s and n is an exact integer from the day
    census; f(b) is the pinned double tree
    ``i2d(s_l^2)/i2d(n_l) + i2d(s_r^2)/i2d(n_r)``, IDENTICAL on both
    engines, so the argmax (f desc, day asc) agrees even where two
    splits are within 1 ulp. Returned ``gain = f - S^2/N`` is the
    between-segment sum of squares. One streaming census, bounded
    driver walk. Returns one row: (break_day, n_left, n_right,
    mean_left, mean_right, gain)."""

    def census(t: pa.Table) -> pa.Table:
        us = t[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        day = us // 86400000000
        g = pd.Series(day).value_counts()
        return pa.table({"day": pa.array(g.index.to_numpy(np.int64)),
                         "y": pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(census, batch_format="pyarrow").to_pandas()
           .groupby("day", sort=True)["y"].sum().reset_index())
    days = c["day"].to_numpy(np.int64)
    y = c["y"].to_numpy(np.int64)
    S = sum(int(v) for v in y)       # total events (exact int)
    N = len(y)                       # number of days
    best = None
    cs = 0
    for i in range(N - 1):               # split AFTER index i (1-based n_l)
        cs += int(y[i])
        nl, nr = i + 1, N - i - 1
        sl, sr = cs, S - cs
        f = float(sl * sl) / float(nl) + float(sr * sr) / float(nr)
        if best is None or f > best[0]:
            best = (f, int(days[i]), nl, nr, sl, sr)
    f, bday, nl, nr, sl, sr = best
    gain = f - float(S * S) / float(N)
    return pd.DataFrame([{
        "break_day": np.int64(bday),
        "n_left": np.int64(nl), "n_right": np.int64(nr),
        "mean_left": float(sl) / float(nl),
        "mean_right": float(sr) / float(nr),
        "gain": gain,
    }])
