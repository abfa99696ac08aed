"""Trimmed/winsorized mean (drift.trimmed_mean_value) and per-source
duplication factor (dedup.dup_factor_by_source): hand computations."""

import numpy as np
import pandas as pd


def test_trimmed_mean_hand(ray_session):
    import ray.data as rd

    from sits_ray.stages.drift import trimmed_mean_value

    # 20 values: one huge outlier; k = 20*5//100 = 1 from each tail
    vals = list(range(1, 20)) + [10000]
    ds = rd.from_pandas(pd.DataFrame({
        "value": np.asarray(vals, np.float64)}))
    out = trimmed_mean_value(ds)
    r = out.iloc[0]
    assert (int(r.n), int(r.k_trim)) == (20, 1)
    # engine grid: cents = floor((v)/0.01); reproduce the kept sum
    cents = np.floor(np.asarray(vals, np.float64) / 0.01).astype(int)
    cents.sort()
    kept = cents[1:-1]
    assert float(r.trimmed_mean) == float(kept.sum()) / 18.0
    # winsorized: outliers clamp to the kept boundary values
    lo, hi = int(kept[0]), int(kept[-1])
    assert (int(r.lo_cents), int(r.hi_cents)) == (lo, hi)
    assert float(r.winsorized_mean) == float(kept.sum() + lo + hi) / 20.0
    # robust: trimmed mean unaffected by the outlier's magnitude
    assert float(r.trimmed_mean) < 1100


def test_trimmed_partial_bins(ray_session):
    import ray.data as rd

    from sits_ray.stages.drift import trimmed_mean_value

    # 40 rows of only two distinct values -> k=2 rows trimmed from each
    # side come OUT OF the repeated bins (partial-bin row accounting)
    vals = [1.0] * 20 + [2.0] * 20
    ds = rd.from_pandas(pd.DataFrame({
        "value": np.asarray(vals, np.float64)}))
    out = trimmed_mean_value(ds)
    r = out.iloc[0]
    assert int(r.k_trim) == 2
    # kept: 18 x 100minus? cents: floor(1/0.01)=100 (x18), 199/200 bin
    c1 = int(np.floor(1.0 / 0.01))
    c2 = int(np.floor(2.0 / 0.01))
    want = (18 * c1 + 18 * c2) / 36.0
    assert float(r.trimmed_mean) == want


def test_dup_factor_hand(ray_session):
    import ray.data as rd

    from sits_ray.stages.dedup import dup_factor_by_source

    df = pd.DataFrame({
        "source": ["a", "a", "a", "b", "b"],
        "text": ["x", "x", "y", "z", "z"],
    })
    out = dup_factor_by_source(rd.from_pandas(df))
    a = out[out.source == "a"].iloc[0]
    b = out[out.source == "b"].iloc[0]
    assert (int(a.n_docs), int(a.n_distinct)) == (3, 2)
    assert float(a.dup_frac) == 1.0 / 3.0
    assert (int(b.n_docs), int(b.n_distinct)) == (2, 1)
    assert float(b.dup_frac) == 0.5


def test_dup_factor_cross_source_same_text(ray_session):
    import ray.data as rd

    from sits_ray.stages.dedup import dup_factor_by_source

    # identical text in two sources counts as distinct IN EACH source
    df = pd.DataFrame({"source": ["a", "b"], "text": ["same", "same"]})
    out = dup_factor_by_source(rd.from_pandas(df))
    assert out.n_distinct.tolist() == [1, 1]
    assert out.dup_frac.tolist() == [0.0, 0.0]
