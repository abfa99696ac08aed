"""Distribution-drift diagnostics over the event/tier stores.

Population Stability Index between the first and second half of the
time range — the ops-monitoring companion of the retention tiers (has
the latency distribution drifted week-over-week?). PSI =
``sum_bins (p_i - q_i) * ln(p_i / q_i)`` over equal-width value bins
(the ``hist_value`` binning convention), with the standard
epsilon-smoothing replaced by joint-support restriction (bins observed
in BOTH periods) so the statistic is a deterministic pure function of
the counts.

Jensen-Shannon divergence (``js_drift``) is the full-support companion:
``JSD(p, q) = 0.5 * KL(p || m) + 0.5 * KL(q || m)`` with
``m = (p + q) / 2``. Unlike PSI it needs no support restriction — a bin
empty in one period contributes only the other period's term (the
``0 * ln 0 = 0`` convention), so JSD is finite on ANY pair of
histograms and bounded by ``ln 2``, which makes it the right monitor
when new bins appear week-over-week (exactly the case PSI's
joint-support rule silently drops). Reference: Lin 1991, "Divergence
measures based on the Shannon entropy".

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
    # normalize to MICROSECONDS first: a bare int64 cast inherits the
    # column's unit (ns for pandas-born timestamps, us for parquet) and
    # the SQL twins are all epoch_us
    return pc.cast(pc.cast(col, pa.timestamp("us")),
                   pa.int64()).to_numpy(zero_copy_only=False)


def _period_bin_counts(ds, value_col: str, ts_col: str,
                       bin_width: float) -> tuple[pd.DataFrame, int, int]:
    """Shared two-pass core: integer-midpoint time split, then per-batch
    (bin, period) count partials folded to the bounded driver-side bin
    table. Returns (counts sorted by bin, total_a, total_b)."""

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
    return c, int(c["n_a"].sum()), int(c["n_b"].sum())


def psi_drift(ds, value_col: str = "value", ts_col: str = "ts",
              bin_width: float = 10.0) -> pd.DataFrame:
    """Per-bin PSI contributions between time halves. Returns
    (bin, n_a, n_b, p, q, contrib) sorted by bin, restricted to bins
    with counts in both periods."""
    c, ta, tb = _period_bin_counts(ds, value_col, ts_col, bin_width)
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


def ks_drift(ds, value_col: str = "value", ts_col: str = "ts") -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between time halves —
    the canonical nonparametric drift test (Smirnov 1939), completing
    the monitor family: PSI (binned, joint support), JSD (binned, full
    support), KS (bin-free, distribution shape). Values quantize to
    a 0.01-wide integer grid (``floor(v / 0.01)`` — the hist_value
    binning convention at cent granularity, monotone so the ECDF order
    is preserved); D = max |F_a - F_b| is evaluated as the exact integer
    maximization ``max |ca*tb - cb*ta|`` over cumulative counts (no
    float ECDFs), then divided ONCE. Ties in the maximizer resolve to
    the smallest cents value.

    Scale shape: same two passes as the binned monitors — integer
    midpoint split from (min, max) partials, then per-batch
    (cents, period) count partials; only O(distinct cents x blocks)
    rows reach the driver and the cumsum runs over the bounded sorted
    histogram. Returns one row: (n_a, n_b, d_num, ks_d, at_bin) with
    ``ks_d = d_num / (n_a * n_b)`` the one float division."""
    c, ta, tb = _period_bin_counts(ds, value_col, ts_col, bin_width=0.01)
    ca = c["n_a"].to_numpy(np.int64).cumsum()
    cb = c["n_b"].to_numpy(np.int64).cumsum()
    gap = np.abs(ca * tb - cb * ta)
    i = int(np.argmax(gap))  # first max == smallest bin (sorted)
    d_num = int(gap[i])
    return pd.DataFrame([{
        "n_a": np.int64(ta), "n_b": np.int64(tb),
        "d_num": np.int64(d_num),
        "ks_d": d_num / (ta * tb),
        "at_bin": np.int64(c["bin"].to_numpy(np.int64)[i]),
    }])


def mw_drift(ds, value_col: str = "value", ts_col: str = "ts") -> pd.DataFrame:
    """Mann-Whitney U rank-sum test between time halves — the
    stochastic-ordering member of the monitor family (PSI/JSD: binned
    divergences; KS: max ECDF gap; MW: has the LEVEL shifted?). The
    normalized statistic ``auc = U_a / (n_a * n_b)`` is exactly the
    AUROC of 'an early value exceeds a late value' (P(A > B) + 0.5
    P(A = B)), so 0.5 means no level drift.

    Integer-exact core: values quantize to the 0.01 cents grid (monotone
    — rank order preserved), tie groups get DOUBLED midranks
    ``dmr = 2*before + t + 1`` (always odd integers, no halves), so the
    rank sum ``r2a = sum n_a * dmr`` and ``u2 = 2*U_a = r2a - ta*(ta+1)``
    are exact Python bigints (SQL HUGEINT). The tie-corrected normal
    approximation uses the exact rational variance
    ``var = ta*tb*((n+1)*n*(n-1) - sum(t^3 - t)) / (12*n*(n-1))`` —
    integer numerator/denominator, divided once in doubles; z and auc
    each perform their float ops in the same tree as the SQL twin
    (cast-then-divide, one sqrt — sqrt is IEEE correctly-rounded so
    libm == DuckDB bit-exact).

    Scale shape: identical to the other monitors — two stateless passes,
    per-batch (cents, period) count partials, O(distinct cents x blocks)
    rows to the driver, rank arithmetic on the bounded sorted histogram.
    (At >= 1e10 rows the hugeint variance numerator would need the
    double-early path; int128 holds to ~1e9 rows per period.)

    Returns one row: (n_a, n_b, u2, auc, z)."""
    c, ta, tb = _period_bin_counts(ds, value_col, ts_col, bin_width=0.01)
    n_a = c["n_a"].to_numpy(np.int64)
    n_b = c["n_b"].to_numpy(np.int64)
    t = n_a + n_b
    before = np.concatenate(([0], t.cumsum()[:-1]))
    dmr = 2 * before + t + 1  # doubled midranks, odd integers
    r2a = sum(int(a) * int(d) for a, d in zip(n_a, dmr))
    u2 = r2a - ta * (ta + 1)
    n = ta + tb
    tie3 = sum(int(x) ** 3 - int(x) for x in t)
    # variance factored as (ta*tb) * (K / (12n(n-1))) so every integer
    # cast stays within the SQL twin's exact two-limb range (< 2^85;
    # the fused numerator ta*tb*K is ~n^5 and DuckDB's bare
    # HUGEINT->DOUBLE cast mis-rounds mid-width integers)
    kq = (n + 1) * n * (n - 1) - tie3
    var_den = 12 * n * (n - 1)
    z = (float(u2 - ta * tb)
         / (2.0 * math.sqrt(float(ta * tb) * (float(kq) / float(var_den)))))
    return pd.DataFrame([{
        "n_a": np.int64(ta), "n_b": np.int64(tb), "u2": np.int64(u2),
        "auc": float(u2) / float(2 * ta * tb), "z": z,
    }])


def js_drift(ds, value_col: str = "value", ts_col: str = "ts",
             bin_width: float = 10.0) -> pd.DataFrame:
    """Per-bin Jensen-Shannon contributions between time halves over the
    FULL support (module docstring). Returns (bin, n_a, n_b, p, q,
    contrib) sorted by bin, one row per bin observed in EITHER period;
    ``sum(contrib)`` is the JSD, bounded by ``ln 2``.

    Float contract (mirrored term-for-term by the ``js_drift_value``
    SQL twin): ``p = n_a/ta`` and ``q = n_b/tb`` are bigint/bigint
    doubles, ``m = (p + q) / 2.0e0``, each KL term is
    ``p * ln(p / m)`` gated to ``0.0`` when its count is zero, and
    ``contrib = 0.5e0 * (term_p + term_q)`` — ``math.log`` == DuckDB
    ``ln`` (libm) on the bounded driver-side bin table."""
    c, ta, tb = _period_bin_counts(ds, value_col, ts_col, bin_width)
    n_a = c["n_a"].to_numpy(np.int64)
    n_b = c["n_b"].to_numpy(np.int64)
    p = n_a / ta
    qv = n_b / tb
    contrib = np.empty(len(c), dtype=np.float64)
    for i in range(len(c)):
        m = (p[i] + qv[i]) / 2.0
        tp = p[i] * math.log(p[i] / m) if n_a[i] > 0 else 0.0
        tq = qv[i] * math.log(qv[i] / m) if n_b[i] > 0 else 0.0
        contrib[i] = 0.5 * (tp + tq)
    return pd.DataFrame(
        {"bin": c["bin"].to_numpy(np.int64), "n_a": n_a, "n_b": n_b,
         "p": p, "q": qv, "contrib": contrib}
    )


def welch_drift(ds, value_col: str = "value", ts_col: str = "ts") -> pd.DataFrame:
    """Welch's unequal-variance t-test between time halves — the
    parametric member of the monitor family (MW: stochastic ordering;
    KS: shape; Welch: mean shift in value units). Values quantize to
    the 0.01 cents grid so every moment is an exact integer (the MW
    contract); mean and variance are single divisions of exact-cast
    integers (``var = (n*qq - s^2) / (n*(n-1))`` on the cents scale),
    and t / Welch-Satterthwaite df are pinned float trees:
    ``se2 = v1/n1 + v2/n2``, ``t = (m1 - m2)/sqrt(se2)``,
    ``df = se2^2 / ((v1/n1)^2/(n1-1) + (v2/n2)^2/(n2-1))``. Same
    two-pass zero-shuffle shape as the other monitors. Returns one row
    (n_a, n_b, mean_a, mean_b, t_stat, df) in CENTS units."""
    c, ta, tb = _period_bin_counts(ds, value_col, ts_col, bin_width=0.01)
    b = c["bin"].to_numpy(np.int64)
    n_a = c["n_a"].to_numpy(np.int64)
    n_b = c["n_b"].to_numpy(np.int64)
    sa = sum(int(x) * int(y) for x, y in zip(b, n_a))
    sb = sum(int(x) * int(y) for x, y in zip(b, n_b))
    qa = sum(int(x) * int(x) * int(y) for x, y in zip(b, n_a))
    qb = sum(int(x) * int(x) * int(y) for x, y in zip(b, n_b))
    m1 = float(sa) / float(ta)
    m2 = float(sb) / float(tb)
    v1 = float(ta * qa - sa * sa) / float(ta * (ta - 1))
    v2 = float(tb * qb - sb * sb) / float(tb * (tb - 1))
    se_a = v1 / float(ta)
    se_b = v2 / float(tb)
    se2 = se_a + se_b
    t_stat = (m1 - m2) / math.sqrt(se2)
    df = (se2 * se2) / (se_a * se_a / float(ta - 1)
                        + se_b * se_b / float(tb - 1))
    return pd.DataFrame([{
        "n_a": np.int64(ta), "n_b": np.int64(tb),
        "mean_a": m1, "mean_b": m2, "t_stat": t_stat, "df": df,
    }])


def anova_oneway(ds, group_col: str = "event_type",
                 value_col: str = "value") -> pd.DataFrame:
    """One-way ANOVA F-test of value across groups — the k-group
    generalization of ``welch_drift``'s two-sample mean-shift monitor
    (pooled-variance form; Fisher 1925). Values quantize to the 0.01
    cents grid so every per-group moment (n, sum, sum-of-squares) is an
    exact integer folded from per-batch (group, bin) census partials —
    two streaming passes, zero shuffle, bounded driver state.

    Float contract (mirrored by the SQL twin): the between-group term
    ``t1 = sum_g (s_g^2 / n_g)`` folds in GROUP-NAME ASC order with
    exact two-limb integer->double casts per operand; then
    ``ssb = t1 - S^2/N``, ``ssw = Q - t1``,
    ``f = (ssb/(k-1)) / (ssw/(N-k))``, ``eta_sq = ssb/(ssb+ssw)`` are
    pinned float trees. Returns one row
    (k_groups, n_total, ssb, ssw, f_stat, eta_sq), cents scale."""

    def census(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(df[value_col].to_numpy(np.float64) / 0.01).astype(
            np.int64)
        g = (pd.DataFrame({"g": df[group_col].to_numpy(), "bin": b})
             .groupby(["g", "bin"], sort=False, observed=True)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(census, batch_format="pandas").to_pandas()
    c = parts.groupby(["g", "bin"], sort=True)["n"].sum().reset_index()

    stats: dict[str, tuple[int, int, int]] = {}
    for gname, sub in c.groupby("g", sort=True):
        bb = sub["bin"].to_numpy(np.int64)
        nn = sub["n"].to_numpy(np.int64)
        n = int(nn.sum())
        s = sum(int(x) * int(y) for x, y in zip(bb, nn))
        qq = sum(int(x) * int(x) * int(y) for x, y in zip(bb, nn))
        stats[str(gname)] = (n, s, qq)

    k = len(stats)
    N = sum(v[0] for v in stats.values())
    S = sum(v[1] for v in stats.values())
    Q = sum(v[2] for v in stats.values())
    t1 = 0.0
    for gname in sorted(stats):            # group-name asc fold (SQL order)
        n, s, _ = stats[gname]
        t1 = t1 + float(s * s) / float(n)
    ssb = t1 - float(S * S) / float(N)
    ssw = float(Q) - t1
    f = (ssb / float(k - 1)) / (ssw / float(N - k))
    return pd.DataFrame([{
        "k_groups": np.int64(k), "n_total": np.int64(N),
        "ssb": ssb, "ssw": ssw, "f_stat": f,
        "eta_sq": ssb / (ssb + ssw),
    }])


def chi2_independence(ds, type_col: str = "event_type",
                      ts_col: str = "ts") -> pd.DataFrame:
    """Pearson chi-square independence test of event type vs hour-of-day
    — the classic contingency-table audit next to mutual_info_type_hod
    (same table, frequentist statistic instead of information). One
    per-batch (type, hour) census fold to a bounded driver table; zero
    shuffle.

    Exactness contract (mirrored by the SQL twin): with cell counts O,
    row totals r, column totals c, grand total T, the identity
    ``chi2 = T * (sum_cells O^2/(r*c) - 1)`` keeps every numerator and
    denominator an exact integer; per-cell terms are single double
    divisions of two-limb exactly-cast integers, folded in
    (type asc, hour asc) order, and ``cramers_v =
    sqrt(chi2 / (T * min(R-1, C-1)))`` is a pinned float tree. Returns
    one row: (n_cells, n_rows, n_cols, dof, chi2, cramers_v)."""

    def census(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        hour = (us // 3600000000) % 24
        g = (pd.DataFrame({
                "t": t[type_col].to_numpy(zero_copy_only=False),
                "h": hour})
             .groupby(["t", "h"], sort=False).size()
             .rename("o").reset_index())
        return pa.table({"t": pa.array(g["t"]),
                         "h": pa.array(g["h"].to_numpy(np.int64)),
                         "o": pa.array(g["o"].to_numpy(np.int64))})

    c = (ds.map_batches(census, batch_format="pyarrow").to_pandas()
           .groupby(["t", "h"], sort=True)["o"].sum().reset_index())
    rt = c.groupby("t", sort=True)["o"].sum()
    ct = c.groupby("h", sort=True)["o"].sum()
    T = int(c["o"].sum())
    s = 0.0
    for _, row in c.iterrows():          # bounded: types x 24 cells
        o = int(row["o"])
        num = o * o
        den = int(rt[row["t"]]) * int(ct[row["h"]])
        s = s + float(num) / float(den)
    nr, nc = len(rt), len(ct)
    chi2 = float(T) * (s - 1.0)
    k = min(nr - 1, nc - 1)
    v = math.sqrt(chi2 / (float(T) * float(k)))
    return pd.DataFrame([{
        "n_cells": np.int64(len(c)), "n_rows": np.int64(nr),
        "n_cols": np.int64(nc), "dof": np.int64((nr - 1) * (nc - 1)),
        "chi2": chi2, "cramers_v": v,
    }])


def kruskal_wallis(ds, group_col: str = "event_type",
                   value_col: str = "value") -> pd.DataFrame:
    """Kruskal-Wallis rank one-way ANOVA across groups (Kruskal & Wallis
    1952) — the nonparametric sibling of ``anova_oneway``, from the SAME
    bounded (group, cents-bin) census: with m_b the global count of bin
    b (ascending), the DOUBLED midrank of every observation in b is the
    exact integer ``d_b = 2*cum_before(b) + m_b + 1``, so each group's
    doubled rank-sum ``Rg2 = sum_b c_gb * d_b`` is exact, and
    ``sum_g Rg^2/n_g = (1/4) sum_g Rg2^2/n_g`` folds in group-asc order
    as double divisions of exactly-cast integers (Rg2^2 reaches ~1e27
    at sf0.1 — three-limb cast).

    Float contract (mirrored by SQL): ``h = (3.0*s)/(N*(N+1)) -
    3.0*(N+1)`` (the 12/4 folded into 3), tie correction
    ``c = 1 - sum(m^3 - m)/(N^3 - N)``, ``h_corrected = h/c``. One
    streaming census, zero shuffle. Returns one row:
    (n_total, k_groups, h_stat, tie_correction, h_corrected)."""
    from sits_ray.stages.regression import i3d

    def census(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(df[value_col].to_numpy(np.float64) / 0.01).astype(
            np.int64)
        g = (pd.DataFrame({"g": df[group_col].to_numpy(), "b": b})
             .groupby(["g", "b"], sort=False, observed=True)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    c = (ds.map_batches(census, batch_format="pandas").to_pandas()
           .groupby(["g", "b"], sort=True)["cnt"].sum().reset_index())
    m = c.groupby("b", sort=True)["cnt"].sum()
    bins = m.index.to_numpy()
    mb = m.to_numpy(np.int64)
    cum = np.cumsum(mb)
    db = {int(b): 2 * int(cu) - int(mm) + 1
          for b, cu, mm in zip(bins, cum, mb)}    # = 2*cum_before + m + 1
    N = int(mb.sum())
    s = 0.0
    k = 0
    for gname, sub in c.groupby("g", sort=True):   # group-asc fold
        rg2 = sum(int(x) * db[int(b)]
                  for b, x in zip(sub["b"], sub["cnt"]))
        ng = int(sub["cnt"].sum())
        s = s + i3d(rg2 * rg2) / float(ng)
        k += 1
    h = (3.0 * s) / float(N * (N + 1)) - 3.0 * float(N + 1)
    tie = sum(int(x) ** 3 - int(x) for x in mb)
    corr = 1.0 - float(tie) / float(N ** 3 - N)
    return pd.DataFrame([{
        "n_total": np.int64(N), "k_groups": np.int64(k),
        "h_stat": h, "tie_correction": corr,
        "h_corrected": h / corr,
    }])


def runs_test_daily(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily event-volume
    series: are above-median and below-median days randomly interleaved,
    or do they clump (trend/regime) or alternate (oscillation)? The
    classic one-line randomness audit next to the heavier detectors
    (cusum, kleinberg, variance_ratio).

    Exactness contract (mirrored by the SQL twin): daily counts are
    integers; the median is the LOWER nearest-rank element; median-equal
    days drop (the standard treatment); the run count R and the
    above/below counts n1/n2 are integers; ``mu = 1 + 2*n1*n2/n``,
    ``var = 2*n1*n2*(2*n1*n2 - n) / (n^2*(n-1))``,
    ``z = (R - mu)/sqrt(var)`` are pinned float trees of exact casts.
    One streaming day census, bounded driver walk, zero shuffle.
    Returns one row: (n_days, n_above, n_below, n_runs, z)."""

    def census(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        day = us // 86400000000
        g = pd.Series(day).value_counts()
        return pa.table({"day": pa.array(g.index.to_numpy(np.int64)),
                         "y": pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(census, batch_format="pyarrow").to_pandas()
           .groupby("day", sort=True)["y"].sum().reset_index())
    ys = np.sort(c["y"].to_numpy(np.int64))
    med = int(ys[(len(ys) + 1) // 2 - 1])
    seq = c.loc[c["y"] != med].reset_index(drop=True)   # day-ordered
    sgn = (seq["y"].to_numpy(np.int64) > med)
    n1 = int(sgn.sum())
    n2 = int((~sgn).sum())
    n = n1 + n2
    runs = int(1 + (sgn[1:] != sgn[:-1]).sum()) if n else 0
    two = 2 * n1 * n2
    # one-sided or tiny sequences have no sampling distribution — report
    # z = 0 (the twin's CASE arm) instead of 0/0
    if n1 == 0 or n2 == 0 or n < 3:
        z = 0.0
    else:
        mu = 1.0 + float(two) / float(n)
        var = float(two * (two - n)) / float(n * n * (n - 1))
        z = (float(runs) - mu) / math.sqrt(var)
    return pd.DataFrame([{
        "n_days": np.int64(n), "n_above": np.int64(n1),
        "n_below": np.int64(n2), "n_runs": np.int64(runs), "z": z,
    }])


def mcnemar_tool_halves(ds, ts_col: str = "ts",
                        type_col: str = "event_type",
                        user_col: str = "user_id",
                        tool_type: str = "click") -> pd.DataFrame:
    """McNemar's paired test (McNemar 1947): did users CHANGE their
    tool-usage behavior between the two time halves? Each user is their
    own control — pair (used tool in first half, used tool in second
    half); only the discordant cells n01/n10 carry signal, and
    ``chi2 = (n01 - n10)^2 / (n01 + n10)`` is one exact-int double
    division. The paired complement of the two-sample monitors (welch/
    mannwhitney compare value distributions; this compares within-user
    flags).

    Scale shape: integer-midpoint span pass (the welch convention), then
    per-batch per-user flag partials OR-folded in one ``part_aggregate``
    keyed by user (all rows of a user co-located), each partition
    emitting only its 4-cell census — O(n_parts) rows to the driver.
    Returns one row: (n_users, n_both, n_neither, n10, n01, chi2)."""
    from sits_ray.stages.hashagg import part_aggregate

    def span_partial(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        if us.size == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(us.min())]),
                         "hi": pa.array([int(us.max())])})

    span = ds.map_batches(span_partial, batch_format="pyarrow").to_pandas()
    mid = (int(span["lo"].min()) + int(span["hi"].max())) // 2

    def flag_partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].to_numpy().astype("datetime64[us]").astype(
            np.int64)
        tool = df[type_col].to_numpy() == tool_type
        g = (pd.DataFrame({
                "u": df[user_col].to_numpy(),
                "a": (tool & (us <= mid)).astype(np.int64),
                "b": (tool & (us > mid)).astype(np.int64)})
             .groupby("u", sort=False)[["a", "b"]].max().reset_index())
        return g

    pre = ds.map_batches(flag_partial, batch_format="pandas")

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("u", sort=False)[["a", "b"]].max()
        a = f["a"].to_numpy(np.int64)
        b = f["b"].to_numpy(np.int64)
        return pd.DataFrame([{
            "n_users": np.int64(len(f)),
            "n_both": np.int64(int(((a == 1) & (b == 1)).sum())),
            "n_neither": np.int64(int(((a == 0) & (b == 0)).sum())),
            "n10": np.int64(int(((a == 1) & (b == 0)).sum())),
            "n01": np.int64(int(((a == 0) & (b == 1)).sum())),
        }])

    parts = part_aggregate(pre, cells, key_col="u").to_pandas()
    tot = parts.sum()
    n01, n10 = int(tot["n01"]), int(tot["n10"])
    chi2 = (0.0 if n01 + n10 == 0
            else float((n01 - n10) * (n01 - n10)) / float(n01 + n10))
    return pd.DataFrame([{
        "n_users": np.int64(int(tot["n_users"])),
        "n_both": np.int64(int(tot["n_both"])),
        "n_neither": np.int64(int(tot["n_neither"])),
        "n10": np.int64(n10), "n01": np.int64(n01), "chi2": chi2,
    }])


def brown_forsythe(ds, group_col: str = "event_type",
                   value_col: str = "value") -> pd.DataFrame:
    """Brown-Forsythe test (1974) of variance homogeneity across groups
    — the robust Levene variant: one-way ANOVA on absolute deviations
    from each group's MEDIAN. Completes the census trio (anova_oneway:
    means; kruskal_wallis: ranks; this: spreads).

    All from the same bounded (group, cents-bin) census: the group
    median is the lower nearest-rank bin (integer, from cumulative
    counts), so every deviation z = |bin - med_g| is an exact integer
    and the ANOVA moments are exact integer sums. The between-group fold
    runs group-asc with s^2 through the THREE-limb cast (s^2 can pass
    2^85); F is the same pinned tree as anova_oneway. Returns one row:
    (k_groups, n_total, ssb, ssw, f_stat)."""
    from sits_ray.stages.regression import i3d

    def census(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(df[value_col].to_numpy(np.float64) / 0.01).astype(
            np.int64)
        g = (pd.DataFrame({"g": df[group_col].to_numpy(), "b": b})
             .groupby(["g", "b"], sort=False, observed=True)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    c = (ds.map_batches(census, batch_format="pandas").to_pandas()
           .groupby(["g", "b"], sort=True)["cnt"].sum().reset_index())
    stats: dict[str, tuple[int, int, int]] = {}
    for gname, sub in c.groupby("g", sort=True):
        bb = sub["b"].to_numpy(np.int64)        # sorted asc within group
        nn = sub["cnt"].to_numpy(np.int64)
        cum = np.cumsum(nn)
        ng = int(cum[-1])
        med = int(bb[np.searchsorted(cum, (ng + 1) // 2)])
        z = np.abs(bb - med)
        s = sum(int(zz) * int(w) for zz, w in zip(z, nn))
        q = sum(int(zz) * int(zz) * int(w) for zz, w in zip(z, nn))
        stats[str(gname)] = (ng, s, q)
    k = len(stats)
    N = sum(v[0] for v in stats.values())
    S = sum(v[1] for v in stats.values())
    Q = sum(v[2] for v in stats.values())
    t1 = 0.0
    for gname in sorted(stats):                 # group-asc fold
        n, s, _ = stats[gname]
        t1 = t1 + i3d(s * s) / float(n)
    ssb = t1 - i3d(S * S) / float(N)
    ssw = float(Q) - t1
    f = (ssb / float(k - 1)) / (ssw / float(N - k))
    return pd.DataFrame([{
        "k_groups": np.int64(k), "n_total": np.int64(N),
        "ssb": ssb, "ssw": ssw, "f_stat": f,
    }])


def _daily_counts(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Shared bounded day census: one per-batch value_counts pass."""

    def census(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        day = us // 86400000000
        g = pd.Series(day).value_counts()
        return pa.table({"day": pa.array(g.index.to_numpy(np.int64)),
                         "y": pa.array(g.to_numpy(np.int64))})

    return (ds.map_batches(census, batch_format="pyarrow").to_pandas()
              .groupby("day", sort=True)["y"].sum().reset_index())


def seasonality_strength_dow(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Day-of-week seasonality strength of the event-volume calendar:
    the fraction of daily-count variance explained by the weekday —
    ``strength = SSB(dow) / SST`` (eta^2 of the 7-group split), the
    corpus-calendar summary next to the per-conv seasonal ops
    (seasonal_residuals, holt_winters, goertzel).

    dow = (epoch_day + 4) %% 7 (Monday = 0) — pure integer arithmetic,
    identical on both engines, no calendar functions. Exact integer
    moments from the bounded day census; SSB folds dow-asc with exact
    casts; SST = Q - S^2/N. Returns one row:
    (n_days, ssb, sst, strength)."""
    c = _daily_counts(ds, ts_col)
    c["dow"] = (c["day"].to_numpy(np.int64) + 4) % 7
    N = len(c)
    S = sum(int(v) for v in c["y"])
    Q = sum(int(v) * int(v) for v in c["y"])
    t1 = 0.0
    for _d, sub in c.groupby("dow", sort=True):
        sg = sum(int(v) for v in sub["y"])
        t1 = t1 + float(sg * sg) / float(len(sub))
    s2n = float(S * S) / float(N)
    ssb = t1 - s2n
    sst = float(Q) - s2n
    # a perfectly flat calendar has SST = 0 — strength 0 (twin CASE arm)
    return pd.DataFrame([{
        "n_days": np.int64(N), "ssb": ssb, "sst": sst,
        "strength": 0.0 if sst == 0.0 else ssb / sst,
    }])


def dispersion_daily(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Poisson dispersion (variance-to-mean) index of daily event
    volumes — the corpus-calendar overdispersion audit (the per-conv
    Fano factor's calendar sibling): D = 1 for a Poisson process,
    >> 1 for clumped traffic. ``chi2 = (n-1) * D`` is the classical
    dispersion test statistic. Exact integer moments; pinned trees
    ``var = (n*q - s^2)/(n*(n-1))``, ``mean = s/n``, ``d = var/mean``.
    Returns one row: (n_days, mean_daily, var_daily, dispersion,
    chi2)."""
    c = _daily_counts(ds, ts_col)
    n = len(c)
    s = sum(int(v) for v in c["y"])
    q = sum(int(v) * int(v) for v in c["y"])
    mean = float(s) / float(n)
    var = float(n * q - s * s) / float(n * (n - 1))
    d = var / mean
    return pd.DataFrame([{
        "n_days": np.int64(n), "mean_daily": mean, "var_daily": var,
        "dispersion": d, "chi2": float(n - 1) * d,
    }])


def turning_points_daily(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Turning-point test for randomness of the daily event-volume
    series (Bienaymé 1874; Kendall's classic): count days that are a
    STRICT local max or min of their immediate neighbors. For an iid
    sequence E[T] = 2(n-2)/3 and Var[T] = (16n - 29)/90; too few
    turning points = trend, too many = rapid oscillation. Completes the
    randomness suite next to runs_test_daily (level-based) and
    bartels_rvn_daily (rank-based).

    Exactness: T and n are integers from the bounded day census (strict
    comparisons, so tie plateaus simply contribute no turning point);
    z = (T - 2*(n-2)/3) / sqrt((16n - 29)/90) is a pinned float tree of
    exact casts. Returns one row: (n_days, n_turning, expected, z)."""
    c = _daily_counts(ds, ts_col)
    y = c["y"].to_numpy(np.int64)            # day-ordered
    n = len(y)
    mid, left, right = y[1:-1], y[:-2], y[2:]
    t = int((((mid > left) & (mid > right))
             | ((mid < left) & (mid < right))).sum())
    exp = 2.0 * float(n - 2) / 3.0
    var = float(16 * n - 29) / 90.0
    z = (float(t) - exp) / math.sqrt(var)
    return pd.DataFrame([{
        "n_days": np.int64(n), "n_turning": np.int64(t),
        "expected": exp, "z": z,
    }])


def bartels_rvn_daily(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Bartels rank von Neumann ratio test (Bartels 1982) — the
    rank-based randomness member: ``RVN = sum (R_i - R_(i+1))^2 /
    sum (R_i - Rbar)^2`` over the day-ordered ranks of daily volumes,
    ~2 under randomness, < 2 for trend, > 2 for oscillation.

    Integer-exact core: DOUBLED midranks (the kruskal_wallis trick)
    make every rank an exact integer with doubled mean EXACTLY n+1, so
    both the numerator and denominator are exact integer sums (the
    shared factor 4 cancels in the ratio). ``z = (rvn - 2) /
    sqrt(4*(n-2)*(5n^2 - 2n - 9) / (5n(n+1)(n-1)^2))`` is a pinned
    float tree of exact casts. Returns one row:
    (n_days, rvn_num, rvn_den, rvn, z)."""
    c = _daily_counts(ds, ts_col)
    y = c["y"].to_numpy(np.int64)            # day-ordered
    n = len(y)
    ys = np.sort(y)
    # doubled midrank per distinct value: 2*cum_before + t + 1
    vals, counts = np.unique(ys, return_counts=True)
    cum = np.cumsum(counts)
    dmr = {int(v): 2 * int(cu) - int(t) + 1
           for v, cu, t in zip(vals, cum, counts)}
    d = np.asarray([dmr[int(v)] for v in y], dtype=np.int64)
    num = int(((d[:-1] - d[1:]) ** 2).sum())
    den = int(((d - (n + 1)) ** 2).sum())
    rvn = float(num) / float(den)
    var = (float(4 * (n - 2) * (5 * n * n - 2 * n - 9))
           / float(5 * n * (n + 1) * (n - 1) * (n - 1)))
    z = (rvn - 2.0) / math.sqrt(var)
    return pd.DataFrame([{
        "n_days": np.int64(n), "rvn_num": np.int64(num),
        "rvn_den": np.int64(den), "rvn": rvn, "z": z,
    }])


def gumbel_weekly_maxima(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Gumbel extreme-value fit over WEEKLY maxima of daily event
    volume (Gumbel 1958, method of moments) — the capacity-planning
    audit: block maxima of a light-tailed process are Gumbel, and the
    location/scale pair answers "how big a day should we provision
    for?". Week = epoch_day // 7 (pure integer blocks).

    Exactness: weekly maxima are integers from the bounded day census;
    mean and variance are exact-cast rational trees; ``beta =
    sqrt(6*var) / pi`` and ``mu = mean - gamma*beta`` use the IEEE
    literals 3.141592653589793 and 0.5772156649015329 written
    identically on both engines (no exp/ln — only sqrt, which is
    correctly rounded). Returns one row: (n_weeks, max_weekly,
    mean_weekly, var_weekly, beta, mu)."""
    c = _daily_counts(ds, ts_col)
    c["week"] = c["day"].to_numpy(np.int64) // 7
    m = c.groupby("week", sort=True)["y"].max()
    n = len(m)
    s = sum(int(v) for v in m)
    q = sum(int(v) * int(v) for v in m)
    mean = float(s) / float(n)
    var = float(n * q - s * s) / float(n * (n - 1))
    beta = math.sqrt(6.0 * var) / 3.141592653589793
    mu = mean - 0.5772156649015329 * beta
    return pd.DataFrame([{
        "n_weeks": np.int64(n),
        "max_weekly": np.int64(int(m.max())),
        "mean_weekly": mean, "var_weekly": var,
        "beta": beta, "mu": mu,
    }])


def hurst_rs_daily(ds, windows=(8, 16, 32), ts_col: str = "ts"
                   ) -> pd.DataFrame:
    """Hurst exponent by classical rescaled-range (R/S) analysis over
    the daily event-volume series (Hurst 1951; Mandelbrot & Wallis
    1969) — the long-memory diagnostic: H ~ 0.5 for independent
    increments, > 0.5 persistent, < 0.5 anti-persistent.

    Integer-exact core: within each size-w block of the day-ordered
    series, the SCALED cumulative deviation ``Z_k = w*cum_k - k*S`` is
    an exact integer (so is the range, taken against the implicit
    Z_0 = 0), and ``w*q - s^2`` is the exact population-variance
    numerator. Per block ``rs = (R_scaled/w) / (sqrt(w*q - s^2)/w)``
    is a pinned tree; per window the mean folds block-asc; the log-log
    OLS slope folds w-asc with libm ln. Zero-variance blocks drop;
    windows with no complete block drop. Returns one row per window:
    (w, n_blocks, rs_mean, hurst) — hurst repeated (the fit over all
    windows)."""
    c = _daily_counts(ds, ts_col)
    y = c["y"].to_numpy(np.int64)            # day-ordered
    n = len(y)
    pts = []
    rows = []
    for w in windows:
        nb = n // w
        rss = []
        for b in range(nb):
            blk = y[b * w:(b + 1) * w]
            s = sum(int(v) for v in blk)
            q = sum(int(v) * int(v) for v in blk)
            varnum = w * q - s * s
            if varnum <= 0:
                continue
            cum = 0
            zmax, zmin = 0, 0
            for k in range(1, w + 1):
                cum += int(blk[k - 1])
                z = w * cum - k * s
                zmax = z if z > zmax else zmax
                zmin = z if z < zmin else zmin
            rsc = zmax - zmin
            r = float(rsc) / float(w)
            std = math.sqrt(float(varnum)) / float(w)
            rss.append(r / std)
        if not rss:
            continue
        acc = 0.0
        for v in rss:                         # block-asc fold
            acc = acc + v
        rs_mean = acc / float(len(rss))
        pts.append((w, math.log(float(w)), math.log(rs_mean)))
        rows.append({"w": np.int64(w), "n_blocks": np.int64(len(rss)),
                     "rs_mean": rs_mean})
    m = len(pts)
    sx = sy = sxy = sxx = 0.0
    for _w, x, yy in pts:                     # w-asc folds
        sx = sx + x
        sy = sy + yy
        sxy = sxy + x * yy
        sxx = sxx + x * x
    hurst = ((float(m) * sxy - sx * sy)
             / (float(m) * sxx - sx * sx)) if m >= 2 else 0.0
    out = pd.DataFrame(rows)
    out["hurst"] = hurst
    return out


def cox_stuart_daily(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Cox-Stuart trend test (1955) on daily event volumes: pair day i
    with day i + n//2 (odd middle day dropped), count strict increases
    vs decreases across the half-calendar gap — the sign-test trend
    member of the calendar family (turning points: shape; runs: levels;
    this: monotone drift). Ties drop; under no trend S+ ~ Binomial(m,
    1/2), ``z = (2*S+ - m) / sqrt(m)`` (the continuity-free form, one
    exact tree). Returns one row: (n_days, n_pairs, n_up, n_down, z)."""
    c = _daily_counts(ds, ts_col)
    y = c["y"].to_numpy(np.int64)
    n = len(y)
    h = n // 2
    a = y[:h]
    b = y[n - h:]
    up = int((b > a).sum())
    down = int((b < a).sum())
    m = up + down
    z = (0.0 if m == 0
         else float(2 * up - m) / math.sqrt(float(m)))
    return pd.DataFrame([{
        "n_days": np.int64(n), "n_pairs": np.int64(m),
        "n_up": np.int64(up), "n_down": np.int64(down), "z": z,
    }])


def pettitt_daily(ds, ts_col: str = "ts") -> pd.DataFrame:
    """Pettitt nonparametric change-point test (1979) on daily event
    volumes — the rank-based twin of changepoint_daily_volume (which
    fits means): ``U_t = sum_(i<=t, j>t) sign(y_i - y_j)``; the split
    maximizing |U_t| (ties -> earliest day) is the most likely change
    point, robust to outliers. Everything is integer (signs, sums,
    argmax); the one float column is k_norm = K / (pairs at t*). O(n^2)
    on the bounded day census. Returns one row:
    (n_days, break_day, u_stat, k_stat, k_norm)."""
    c = _daily_counts(ds, ts_col)
    y = c["y"].to_numpy(np.int64)
    days = c["day"].to_numpy(np.int64)
    n = len(y)
    sgn = np.sign(y[:, None] - y[None, :]).astype(np.int64)  # (i, j)
    best = None
    for t in range(n - 1):
        u = int(sgn[:t + 1, t + 1:].sum())
        if best is None or abs(u) > best[0]:
            best = (abs(u), u, t)
    k, u, t = best
    npairs = (t + 1) * (n - t - 1)
    return pd.DataFrame([{
        "n_days": np.int64(n), "break_day": np.int64(int(days[t])),
        "u_stat": np.int64(u), "k_stat": np.int64(k),
        "k_norm": float(k) / float(npairs),
    }])


def qq_drift_deciles(ds, value_col: str = "value",
                     ts_col: str = "ts") -> pd.DataFrame:
    """Decile-level quantile drift between the two time halves: the
    lower nearest-rank cents value of each decile (10%..90%) in each
    half and the integer shift between them — the quantile-table view
    of distribution drift (psi/js: density; ks: max gap; mw: level;
    this: WHERE in the distribution the movement happened).

    All integers: cents census per half (the welch split), deciles by
    cumulative-count selection ``ceil(p * n)`` (lower nearest rank),
    shift = exact cents difference. Returns one row per decile:
    (decile, v_a, v_b, shift)."""
    c, ta, tb = _period_bin_counts(ds, value_col, ts_col, bin_width=0.01)
    bins = c["bin"].to_numpy(np.int64)
    ca = c["n_a"].to_numpy(np.int64).cumsum()
    cb = c["n_b"].to_numpy(np.int64).cumsum()
    rows = []
    for d in range(1, 10):
        # lower nearest rank: smallest bin with cum*10 >= d*n
        ka = int(bins[np.searchsorted(ca * 10, d * ta)])
        kb = int(bins[np.searchsorted(cb * 10, d * tb)])
        rows.append({"decile": np.int64(d), "v_a": np.int64(ka),
                     "v_b": np.int64(kb),
                     "shift": np.int64(kb - ka)})
    return pd.DataFrame(rows)


def value_moments(ds, value_col: str = "value") -> pd.DataFrame:
    """Skewness and excess kurtosis of the value distribution on the
    cents grid — the shape summary beside summary_* (location/scale)
    and benford (digits). Raw power sums s1..s4 are exact integers from
    the bounded census (s4 reaches ~1e30 — the three-limb cast); the
    central moments and g1/g2 are PINNED double trees over those casts
    (mu2 = s2/n - mean^2 etc.) — mirrored operand-for-operand by the
    twin, so cross-engine parity holds bit-for-bit even where the
    centered subtraction cancels. Returns one row:
    (n, mean_cents, g1_skew, g2_kurt)."""
    import pyarrow as _pa

    from sits_ray.stages.regression import i3d

    def census(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        b = np.floor(v / 0.01).astype(np.int64)
        g = pd.Series(b).value_counts()
        return pa.table({"bin": _pa.array(g.index.to_numpy(np.int64)),
                         "cnt": _pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(census, batch_format="pyarrow").to_pandas()
           .groupby("bin", sort=True)["cnt"].sum().reset_index())
    n = int(c["cnt"].sum())
    s1 = s2 = s3 = s4 = 0
    for b, k in zip(c["bin"], c["cnt"]):
        b, k = int(b), int(k)
        s1 += b * k
        s2 += b * b * k
        s3 += b * b * b * k
        s4 += b * b * b * b * k
    nd = i3d(n)
    mean = i3d(s1) / nd
    s2n = i3d(s2) / nd
    s3n = i3d(s3) / nd
    s4n = i3d(s4) / nd
    mm = mean * mean
    mu2 = s2n - mm
    mu3 = s3n - 3.0 * mean * s2n + 2.0 * (mm * mean)
    mu4 = s4n - 4.0 * mean * s3n + 6.0 * mm * s2n - 3.0 * (mm * mm)
    g1 = mu3 / math.sqrt(mu2 * mu2 * mu2)
    g2 = mu4 / (mu2 * mu2) - 3.0
    return pd.DataFrame([{
        "n": np.int64(n), "mean_cents": mean,
        "g1_skew": g1, "g2_kurt": g2,
    }])


def trimmed_mean_value(ds, trim_frac: float = 0.05,
                       value_col: str = "value") -> pd.DataFrame:
    """Trimmed and winsorized means of the value distribution on the
    cents grid — the robust-location summary (outlier-proof where the
    plain mean is not), computed EXACTLY from the bounded census:
    k = n * trim_frac rows drop (trim) or clamp (winsorize) at each
    tail, with per-bin kept counts
    ``kept = clip(min(cum, n-k) - max(cum - cnt, k), 0)`` — pure
    integer arithmetic, partial bins handled by row count, no
    approximation. Means are single exact-cast divisions. Returns one
    row: (n, k_trim, lo_cents, hi_cents, trimmed_mean,
    winsorized_mean)."""
    import pyarrow as _pa

    def census(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        b = np.floor(v / 0.01).astype(np.int64)
        g = pd.Series(b).value_counts()
        return pa.table({"bin": _pa.array(g.index.to_numpy(np.int64)),
                         "cnt": _pa.array(g.to_numpy(np.int64))})

    c = (ds.map_batches(census, batch_format="pyarrow").to_pandas()
           .groupby("bin", sort=True)["cnt"].sum().reset_index())
    bins = c["bin"].to_numpy(np.int64)
    cnt = c["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    k = int(n * 5) // 100 if trim_frac == 0.05 else int(n * trim_frac)
    kept = (np.minimum(cum, n - k)
            - np.maximum(cum - cnt, k)).clip(min=0)
    s_t = sum(int(b) * int(kc) for b, kc in zip(bins, kept))
    lo = int(bins[np.searchsorted(cum, k + 1)])
    hi = int(bins[np.searchsorted(cum, n - k)])
    tm = float(s_t) / float(n - 2 * k)
    wm = float(s_t + k * lo + k * hi) / float(n)
    return pd.DataFrame([{
        "n": np.int64(n), "k_trim": np.int64(k),
        "lo_cents": np.int64(lo), "hi_cents": np.int64(hi),
        "trimmed_mean": tm, "winsorized_mean": wm,
    }])
