"""Parity of the partition/nested vectorized per-series operators
(stages/series_ops.py, stages/eventops.py, matrix kernels) against
per-series brute force — the oracle the round-1 per-conv map_groups code
embodied."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from sits_ray.kernels.bayes import bayts_change, bayts_change_matrix
from sits_ray.kernels.dtw import dtw_distance, dtw_many
from sits_ray.kernels.smooth import sgolay, whittaker
from sits_ray.kernels.texture import FEATURES, series_texture, texture_matrix
from sits_ray.stages.series_ops import mean_pattern, series_features, smooth_to_long


def _nested_fixture():
    """Hand-built nested batch: 5 convs, ragged lengths incl. NaNs."""
    rng = np.random.default_rng(5)
    series = [
        rng.normal(10, 2, 12),
        rng.normal(5, 1, 12),
        rng.normal(0, 1, 3),
        np.array([1.0, np.nan, 3.0, np.nan, 5.0, 6.0, 7.0]),
        np.array([np.nan, np.nan]),
    ]
    base = np.datetime64("2024-01-01", "us")
    day = np.timedelta64(1, "D")
    bucket = [base + day * np.arange(len(s)) for s in series]
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(series))]),
            "bucket_ts": pa.array(
                [list(b.astype("datetime64[us]")) for b in bucket],
                pa.list_(pa.timestamp("us")),
            ),
            "mean_latency": pa.array([list(s) for s in series], pa.list_(pa.float64())),
        }
    ), series


def test_smooth_to_long_matches_per_series():
    batch, series = _nested_fixture()
    out = smooth_to_long(
        batch,
        {"wh": (lambda m: whittaker(m, 0.5), 4), "sg": (sgolay, 5)},
    ).to_pandas()
    assert len(out) == sum(len(s) for s in series)
    for i, s in enumerate(series):
        sub = out[out["conv_id"] == f"c{i}"].sort_values("bucket_ts")
        exp_wh = whittaker(s[None, :], 0.5)[0] if s.size >= 4 else s
        exp_sg = sgolay(s[None, :])[0] if s.size >= 5 else s
        np.testing.assert_array_equal(sub["wh"].to_numpy(), exp_wh)
        # sgolay is matmul-based: stacking changes the BLAS path by <=1 ulp
        np.testing.assert_allclose(sub["sg"].to_numpy(), exp_sg, rtol=1e-12)
        np.testing.assert_array_equal(sub["mean_latency"].to_numpy(), s)


def test_series_features_texture_parity():
    batch, series = _nested_fixture()
    out = series_features(
        batch,
        lambda m: texture_matrix(m, levels=8),
        extra_builders={"n_days": lambda lens: lens.astype(np.int64)},
    ).to_pandas()
    for i, s in enumerate(series):
        row = out[out["conv_id"] == f"c{i}"].iloc[0]
        exp = series_texture(s, levels=8)
        assert row["n_days"] == len(s)
        for f in FEATURES:
            a, b = row[f], exp[f]
            assert (np.isnan(a) and np.isnan(b)) or abs(a - b) < 1e-12, (i, f)


def test_series_features_dtw_dropnan_parity():
    batch, series = _nested_fixture()
    pat = np.array([1.0, 4.0, 2.0, 8.0])
    out = series_features(
        batch, lambda m: {"dtw_dist": dtw_many(m, pat)}, drop_nan=True
    ).to_pandas()
    for i, s in enumerate(series):
        v = s[~np.isnan(s)]
        exp = dtw_distance(v, pat) if v.size else float("inf")
        got = out[out["conv_id"] == f"c{i}"]["dtw_dist"].iloc[0]
        assert got == exp, (i, got, exp)


def test_bayts_matrix_vs_scalar_chain():
    rng = np.random.default_rng(9)
    P = rng.random((17, 23))
    post_m, fl_m = bayts_change_matrix(P)
    for i in range(P.shape[0]):
        post_s, fl_s = bayts_change(P[i])
        np.testing.assert_array_equal(post_m[i], post_s)
        assert fl_m[i] == fl_s


def test_mean_pattern_distributed(ray_session):
    batch, series = _nested_fixture()
    ds = rd.from_arrow(batch)
    pat = mean_pattern(ds, max_len=32)
    # brute-force: NaN-skipping mean per bucket over the exploded rows
    rows = []
    for i, s in enumerate(series):
        for j, v in enumerate(s):
            rows.append((j, v))
    df = pd.DataFrame(rows, columns=["t", "v"])
    exp = df.groupby("t")["v"].mean().sort_index().to_numpy()
    exp = exp[~np.isnan(exp)][:32]
    np.testing.assert_allclose(pat, exp, rtol=1e-12)


@pytest.mark.parametrize("kernel_name", ["reduce", "session", "window", "predictor"])
def test_eventops_kernels_vs_bruteforce(kernel_name):
    rng = np.random.default_rng(11)
    n = 400
    conv = rng.integers(0, 12, n)
    ts = (
        np.datetime64("2024-03-01", "us")
        + np.timedelta64(1, "s") * rng.integers(0, 90 * 86400, n)
    ).astype("datetime64[us]")
    order = np.arange(n)
    value = np.round(rng.normal(50, 10, n), 3)
    g = pa.table(
        {
            "conv_id": pa.array(conv, pa.int64()),
            "ts": pa.array(ts),
            "order": pa.array(order, pa.int64()),
            "value": pa.array(value),
        }
    )
    tsi = ts.astype(np.int64)
    DAY = 86_400_000_000

    if kernel_name == "reduce":
        from sits_ray.stages.eventops import reduce_stats_kernel

        out = reduce_stats_kernel(g).to_pandas().set_index("conv_id")
        for c in np.unique(conv):
            sel = np.lexsort((order[conv == c], tsi[conv == c]))
            v = value[conv == c][sel]
            row = out.loc[c]
            assert row["t_max"] == v.max() and row["t_min"] == v.min()
            assert row["t_median"] == np.median(v)
            k = max(0, min(int(np.ceil(0.95 * v.size)) - 1, v.size - 1))
            assert row["t_p95"] == np.sort(v)[k]
            if v.size > 1:
                assert row["t_fslope"] == np.max(np.abs(np.diff(v)))
            else:
                assert np.isnan(row["t_fslope"])
            assert row["n"] == v.size
    elif kernel_name == "session":
        from sits_ray.stages.eventops import sessionize_kernel

        GAP = 3 * 3600 * 1_000_000
        out = sessionize_kernel(g, GAP).to_pandas()
        for c in np.unique(conv):
            sel = np.lexsort((order[conv == c], tsi[conv == c]))
            t = tsi[conv == c][sel]
            new = np.r_[True, np.diff(t) > GAP]
            sid = np.cumsum(new)
            st = np.flatnonzero(new)
            en = np.r_[st[1:], t.size]
            sub = out[out["conv_id"] == c].sort_values("session_id")
            np.testing.assert_array_equal(sub["session_id"].to_numpy(), sid[st])
            np.testing.assert_array_equal(sub["n_events"].to_numpy(), en - st)
            np.testing.assert_array_equal(
                sub["session_start"].astype("datetime64[us]").astype(np.int64),
                t[st],
            )
            np.testing.assert_array_equal(
                sub["session_end"].astype("datetime64[us]").astype(np.int64),
                t[en - 1],
            )
    elif kernel_name == "window":
        from sits_ray.stages.eventops import window_count_kernel

        out = window_count_kernel(g, 7).to_pandas()
        for c in np.unique(conv):
            t = np.sort(tsi[conv == c])
            lo, hi = (t[0] // DAY) * DAY, (t[-1] // DAY) * DAY
            starts = np.arange(lo, hi + DAY, DAY)
            exp = np.searchsorted(t, starts + 7 * DAY) - np.searchsorted(t, starts)
            sub = out[out["conv_id"] == c].sort_values("window_start")
            np.testing.assert_array_equal(sub["n_events"].to_numpy(), exp)
            np.testing.assert_array_equal(
                sub["window_start"].astype("datetime64[us]").astype(np.int64),
                starts,
            )
    else:
        from sits_ray.stages.eventops import predictor_matrix_kernel
        from sits_ray.stages.regularize import delta_us_to_seconds

        lo = (tsi.min() // DAY) * 86400.0 + (tsi.min() % DAY) / 1e6
        hi = (tsi.max() // DAY) * 86400.0 + (tsi.max() % DAY) / 1e6
        span = hi - lo + 1.0
        out = predictor_matrix_kernel(g, lo, span).to_pandas().set_index("conv_id")
        for c in np.unique(conv):
            sel = np.lexsort((order[conv == c], tsi[conv == c]))
            t = tsi[conv == c][sel]
            lat = np.full(t.size, np.nan)
            if t.size > 1:
                lat[1:] = delta_us_to_seconds(np.diff(t))
            ep = (t // DAY) * 86400.0 + (t % DAY) / 1e6
            slot = np.minimum(np.floor((ep - lo) / (span / 4.0)).astype(int), 3)
            for s in range(4):
                v = lat[(slot == s) & ~np.isnan(lat)]
                exp = float(sum(v.tolist(), 0.0)) / v.size if v.size else np.nan
                got = out.loc[c][f"lat_t{s}"]
                assert (np.isnan(got) and np.isnan(exp)) or got == exp
            assert out.loc[c]["n"] == t.size


def test_apply_across_matches_single_band():
    from sits_ray.kernels.rolling import w_mean
    from sits_ray.stages.series_ops import apply_across_nested

    batch, series = _nested_fixture()
    # add a second band with different values
    b2 = pa.array(
        [list(np.asarray(s) * 2.0 + 1.0) for s in series], pa.list_(pa.float64())
    )
    batch = batch.append_column("p95_latency", b2)
    out = apply_across_nested(
        batch, lambda m: w_mean(m, 3, edge="clip"),
        cols=("mean_latency", "p95_latency"), suffix="_w3",
    ).to_pandas()
    single = smooth_to_long(
        batch, {"w3": (lambda m: w_mean(m, 3, edge="clip"), 1)}, "p95_latency"
    ).to_pandas()
    np.testing.assert_array_equal(
        out["p95_latency_w3"].to_numpy(), single["w3"].to_numpy()
    )
    assert set(out.columns) == {
        "conv_id", "bucket_ts", "mean_latency", "mean_latency_w3",
        "p95_latency", "p95_latency_w3",
    }


def test_neighbor_kernel_matches_rolling_kernels(ray_session):
    """neighbor_kernel (partition-vectorized, SQL-order formulas) must
    equal the w_modal / w_sd clip-edge rolling kernels per conversation."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sits_ray.kernels.rolling import w_modal, w_sd
    from sits_ray.stages.eventops import map_conv_partitions, neighbor_kernel

    rng = np.random.default_rng(9)
    rows = []
    for conv in range(12):
        n = rng.integers(1, 30)
        ts = np.sort(rng.integers(0, 10**9, size=n))
        vals = rng.integers(0, 5, size=n).astype(float)
        for i in range(n):
            rows.append((f"c{conv}", i, ts[i], vals[i]))
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    ds = rd.from_pandas(df).repartition(3)

    for stat, kern, col in (("modal", w_modal, "clean_code"), ("sd", w_sd, "w_sd3")):
        got = (
            map_conv_partitions(
                ds, lambda g: neighbor_kernel(g, stat=stat), extra_cols=("value",)
            )
            .to_pandas()
            .sort_values(["conv_id", "order"])
            .reset_index(drop=True)
        )
        for conv, g in df.groupby("user_id"):
            series = g.sort_values(["ts", "event_id"])["value"].to_numpy()
            want = kern(series[None, :], 3, edge="clip")[0]
            have = got.loc[got["conv_id"] == conv, col].to_numpy(dtype=float)
            np.testing.assert_array_equal(np.isnan(want), np.isnan(have))
            np.testing.assert_allclose(have, want, rtol=1e-12, equal_nan=True)


def test_change_events_hand_fixture():
    """Hand-built posterior trajectories -> exact event segmentation:
    runs >= 3 kept with correct dates and peaks; short runs dropped;
    runs touching the series end close correctly."""
    import pyarrow as pa

    from sits_ray.stages.series_ops import change_events

    ts = np.arange("2024-01-01", "2024-01-11", dtype="datetime64[D]").astype(
        "datetime64[us]"
    )
    batch = pa.table(
        {
            "conv_id": pa.array(["a", "b", "c"]),
            "bucket_ts": pa.array([list(ts)] * 3, pa.list_(pa.timestamp("us"))),
            "mean_latency": pa.array(
                [list(np.arange(10.0))] * 3, pa.list_(pa.float64())
            ),
        }
    )
    post = {
        # one interior run of 4 (t=2..5), one short run of 2 (dropped)
        "a": [0.1, 0.2, 0.95, 0.96, 0.99, 0.91, 0.2, 0.95, 0.92, 0.1],
        # run to the end (t=7..9)
        "b": [0.1] * 7 + [0.93, 0.94, 0.95],
        # never fires
        "c": [0.5] * 10,
    }

    def fake_posterior(m):
        # rows arrive in batch order within one length group
        mat = np.array([post["a"], post["b"], post["c"]])
        return mat[: m.shape[0]], None

    out = change_events(batch, fake_posterior).to_pandas()
    assert len(out) == 2
    a = out[out.conv_id == "a"].iloc[0]
    assert str(a.start_ts) == "2024-01-03 00:00:00"
    assert str(a.end_ts) == "2024-01-06 00:00:00"
    assert a.n_buckets == 4 and a.peak_posterior == 0.99
    b = out[out.conv_id == "b"].iloc[0]
    assert str(b.start_ts) == "2024-01-08 00:00:00"
    assert str(b.end_ts) == "2024-01-10 00:00:00"
    assert b.n_buckets == 3 and b.peak_posterior == 0.95


def test_binary_segment_step_series():
    """Clear two-level structure: [1×6, 9×6] splits at the step; a second
    level refines only where it reduces SSE; constants never split."""
    import pandas as pd

    from sits_ray.stages.series_ops import binary_segment

    ts = np.arange("2024-01-01", "2024-01-13", dtype="datetime64[D]").astype(
        "datetime64[us]"
    )
    step = [1.0] * 6 + [9.0] * 6          # one clean change point at t=6
    const = [4.0] * 12                     # gain == 0 -> single episode
    two_steps = [1.0] * 4 + [5.0] * 4 + [9.0] * 4  # splits at 4 and 8
    batch = pa.table(
        {
            "conv_id": pa.array(["s", "c", "t"]),
            "bucket_ts": pa.array([list(ts)] * 3, pa.list_(pa.timestamp("us"))),
            "turn_count": pa.array(
                [step, const, two_steps], pa.list_(pa.float64())
            ),
        }
    )
    out = binary_segment(batch).to_pandas()
    c = out[out.conv_id == "c"]
    assert len(c) == 1 and c.iloc[0].n_pts == 12 and c.iloc[0].seg_mean == 4.0
    s = out[out.conv_id == "s"]
    assert list(s.n_pts)[:2] == [6, 6] or {tuple(x) for x in s[["seg_id", "n_pts"]].to_numpy()} >= {(0, 6)}
    # the first split of the step series is exactly at the step
    assert s.iloc[0].n_pts == 6 and s.iloc[0].seg_mean == 1.0
    t = out[out.conv_id == "t"]
    assert list(t.seg_mean) == [1.0, 5.0, 9.0]
    assert list(t.n_pts) == [4, 4, 4]
    # seg_ids are 0..k-1 in time order and timestamps tile the series
    for cid, g in out.groupby("conv_id"):
        assert list(g.seg_id) == list(range(len(g)))
        assert g.iloc[0].start_ts == pd.Timestamp("2024-01-01")
        assert g.iloc[-1].end_ts == pd.Timestamp("2024-01-12")


def test_binary_segment_singleton_and_parity():
    """Length-1 series -> one episode; batch-vectorized result equals
    per-series calls (ragged length groups)."""
    from sits_ray.stages.series_ops import binary_segment

    rng = np.random.default_rng(3)
    series = [rng.integers(1, 20, size=n).astype(np.float64)
              for n in (1, 5, 9, 9, 17)]
    t0 = np.datetime64("2024-02-01", "us")
    batch = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(series))]),
            "bucket_ts": pa.array(
                [list(t0 + np.arange(len(v)) * np.timedelta64(86400_000_000, "us"))
                 for v in series],
                pa.list_(pa.timestamp("us")),
            ),
            "turn_count": pa.array([list(v) for v in series], pa.list_(pa.float64())),
        }
    )
    full = binary_segment(batch).to_pandas().sort_values(["conv_id", "seg_id"])
    assert len(full[full.conv_id == "c0"]) == 1
    parts = []
    for i in range(len(series)):
        parts.append(binary_segment(batch.slice(i, 1)).to_pandas())
    import pandas as pd

    solo = pd.concat(parts).sort_values(["conv_id", "seg_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full.reset_index(drop=True), solo)


def test_binary_segment_matches_bruteforce_twin():
    """Vectorized kernel == a literal per-series SSE recursion (different
    code path: explicit loops, np.var-free prefix math)."""
    from sits_ray.stages.series_ops import binary_segment

    def sse(v, a, b):
        s = 0.0
        ss = 0.0
        for x in v[a:b]:
            s += x
            ss += x * x
        return ss - (s * s) / (b - a)

    def best_split(v, a, b):
        best_t, best_g = -1, 0.0
        parent = sse(v, a, b)
        for t in range(a + 1, b):
            g = parent - sse(v, a, t) - sse(v, t, b)
            if g > best_g:
                best_t, best_g = t, g
        return best_t

    def episodes(v):
        n = len(v)
        t1 = best_split(v, 0, n)
        bounds = {0, n}
        if t1 > 0:
            bounds.add(t1)
            for lo, hi in ((0, t1), (t1, n)):
                t2 = best_split(v, lo, hi)
                if t2 > 0:
                    bounds.add(t2)
        bs = sorted(bounds)
        return [(bs[i], bs[i + 1]) for i in range(len(bs) - 1)]

    rng = np.random.default_rng(11)
    series = [np.round(rng.normal(5, 3, size=n)).clip(0).astype(np.float64)
              for n in (3, 7, 12, 12, 25, 40)]
    t0 = np.datetime64("2024-03-01", "us")
    batch = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(series))]),
            "bucket_ts": pa.array(
                [list(t0 + np.arange(len(v)) * np.timedelta64(86400_000_000, "us"))
                 for v in series],
                pa.list_(pa.timestamp("us")),
            ),
            "turn_count": pa.array([list(v) for v in series], pa.list_(pa.float64())),
        }
    )
    out = binary_segment(batch).to_pandas()
    for i, v in enumerate(series):
        got = out[out.conv_id == f"c{i}"].sort_values("seg_id")
        exp = episodes(v)
        assert list(zip(got.n_pts.cumsum() - got.n_pts, got.n_pts.cumsum())) == exp


# --- Lo-MacKinlay variance ratio ---------------------------------------------

def test_variance_ratio_regimes(ray_session):
    """Random walk -> VR ~ 1; strong mean reversion -> VR << 1;
    deterministic trend -> VR > 1 (computed via the query's own fn on
    synthetic matrices to pin the statistic's direction)."""
    import numpy as np
    from sits_ray.queries import _VR_Q

    q = _VR_Q

    def vr_of(series):
        y = np.floor(np.asarray(series, float) * 100.0 + 0.5).astype(np.int64)
        t = y.size
        d = y[1:] - y[:-1]
        dq = y[q:] - y[:-q]
        n, m = t - 1, t - q
        sa, sd2 = int(d.sum()), int((d * d).sum())
        sq1, sq2 = int(dq.sum()), int((dq * dq).sum())
        mu1 = sa / n
        muq = float(q) * mu1
        var1 = (sd2 - sa * mu1) / n
        varq = (sq2 - 2.0 * muq * sq1 + m * (muq * muq)) / (m * q)
        return varq / var1

    rng = np.random.default_rng(8)
    walk = np.cumsum(rng.normal(0, 5, 400)) + 1000
    assert 0.6 < vr_of(walk) < 1.5
    # iid noise around a level: q-day diffs do NOT accumulate variance
    noise = rng.normal(0, 5, 400) + 100
    assert vr_of(noise) < 0.5
    # momentum: positively autocorrelated increments accumulate variance
    # (a deterministic trend does NOT — demeaning removes it)
    e = rng.normal(0, 5, 400)
    d = np.empty(400)
    d[0] = e[0]
    for i in range(1, 400):
        d[i] = 0.8 * d[i - 1] + e[i]
    momentum = np.cumsum(d) + 5000
    assert vr_of(momentum) > 2.0
