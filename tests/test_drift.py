"""PSI distribution drift (stages/drift.py)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from sits_ray.stages.drift import psi_drift


def _events(values, ts_us):
    return rd.from_pandas(
        pd.DataFrame(
            {"value": np.asarray(values, dtype=np.float64),
             "ts": pd.to_datetime(np.asarray(ts_us, dtype=np.int64), unit="us")}
        )
    )


def test_psi_zero_when_distributions_identical(ray_session):
    # same values in both halves -> p == q -> every contrib exactly 0.0
    vals = [5.0, 15.0, 25.0] * 4
    ts = [0, 1, 2, 3, 4, 5, 100, 101, 102, 103, 104, 105]
    out = psi_drift(_events(vals * 2, sorted(ts * 2)))
    # identical composition either side of the midpoint
    assert (out["contrib"] == 0.0).all()
    assert out["p"].tolist() == out["q"].tolist()


def test_psi_matches_scalar_and_detects_shift(ray_session):
    rng = np.random.default_rng(5)
    a = rng.normal(50, 10, 500)        # first half
    b = rng.normal(80, 10, 500)        # second half: shifted
    vals = np.r_[a, b]
    ts = np.r_[np.arange(500), 10_000 + np.arange(500)]
    out = psi_drift(_events(vals, ts))
    # scalar twin
    mid = (0 + 10_499) // 2
    bins_a = np.floor(a / 10.0).astype(int)
    bins_b = np.floor(b / 10.0).astype(int)
    ca = pd.Series(bins_a).value_counts()
    cb = pd.Series(bins_b).value_counts()
    total = 0.0
    for bin_id in sorted(set(ca.index) & set(cb.index)):
        p = int(ca[bin_id]) / len(a)
        q = int(cb[bin_id]) / len(b)
        total += (p - q) * math.log(p / q)
        row = out.loc[out["bin"] == bin_id]
        assert row["contrib"].item() == (p - q) * math.log(p / q)  # bit-exact
    assert out["contrib"].sum() == pytest.approx(total)
    assert out["contrib"].sum() > 0.25  # a 3-sigma shift is a big PSI


def test_psi_joint_support_only(ray_session):
    # value 95 appears only in the second half -> its bin is excluded
    vals = [5.0, 5.0, 5.0, 95.0]
    ts = [0, 1, 100, 101]
    out = psi_drift(_events(vals, ts))
    assert 9 not in set(out["bin"])
    assert set(out["bin"]) == {0}


def test_psi_batching_invariance(ray_session):
    rng = np.random.default_rng(9)
    vals = rng.uniform(0, 100, 300)
    ts = np.arange(300)
    a = psi_drift(_events(vals, ts))
    b = psi_drift(_events(vals, ts).repartition(11))
    pd.testing.assert_frame_equal(a, b)


def test_psi_empty_raises(ray_session):
    with pytest.raises(ValueError):
        psi_drift(_events([], []))


# --- Jensen-Shannon divergence (full support) -------------------------------

def test_js_zero_when_identical_and_bounded(ray_session):
    from sits_ray.stages.drift import js_drift

    vals = [5.0, 15.0, 25.0] * 4
    ts = [0, 1, 2, 3, 4, 5, 100, 101, 102, 103, 104, 105]
    out = js_drift(_events(vals * 2, sorted(ts * 2)))
    assert (out["contrib"] == 0.0).all()


def test_js_full_support_and_ln2_bound(ray_session):
    from sits_ray.stages.drift import js_drift

    # disjoint supports: JSD attains its maximum ln 2 exactly
    vals = [5.0, 5.0, 95.0, 95.0]
    ts = [0, 1, 100, 101]
    out = js_drift(_events(vals, ts))
    assert set(out["bin"]) == {0, 9}          # both one-sided bins kept
    assert out["contrib"].sum() == pytest.approx(math.log(2.0))
    # PSI on the same input has NO joint-support bins at all
    assert len(psi_drift(_events(vals, ts))) == 0


def test_js_matches_scalar_twin(ray_session):
    from sits_ray.stages.drift import js_drift

    rng = np.random.default_rng(11)
    a = rng.normal(50, 10, 400)
    b = rng.normal(70, 15, 300)
    vals = np.r_[a, b]
    ts = np.r_[np.arange(400), 10_000 + np.arange(300)]
    out = js_drift(_events(vals, ts))
    ca = pd.Series(np.floor(a / 10.0).astype(int)).value_counts()
    cb = pd.Series(np.floor(b / 10.0).astype(int)).value_counts()
    for bin_id in sorted(set(ca.index) | set(cb.index)):
        na, nb = int(ca.get(bin_id, 0)), int(cb.get(bin_id, 0))
        p, q = na / len(a), nb / len(b)
        m = (p + q) / 2.0
        tp = p * math.log(p / m) if na > 0 else 0.0
        tq = q * math.log(q / m) if nb > 0 else 0.0
        row = out.loc[out["bin"] == bin_id]
        assert row["contrib"].item() == 0.5 * (tp + tq)  # bit-exact
    # JSD of two different normals is strictly positive and < ln 2
    assert 0.0 < out["contrib"].sum() < math.log(2.0)


def test_js_batching_invariance(ray_session):
    from sits_ray.stages.drift import js_drift

    rng = np.random.default_rng(3)
    vals = rng.normal(40, 20, 600)
    ts = np.arange(600) * 7
    one = js_drift(_events(vals, ts))
    many = js_drift(_events(vals, ts).repartition(13))
    pd.testing.assert_frame_equal(one, many)


# --- Kolmogorov-Smirnov two-sample test --------------------------------------

def test_ks_matches_scipy_style_brute(ray_session):
    from sits_ray.stages.drift import ks_drift

    rng = np.random.default_rng(19)
    a = rng.normal(50, 10, 400)
    b = rng.normal(65, 10, 300)
    vals = np.r_[a, b]
    ts = np.r_[np.arange(400), 10_000 + np.arange(300)]
    out = ks_drift(_events(vals, ts))
    # brute-force ECDF gap on the same 0.01 grid
    qa = np.floor(a / 0.01).astype(np.int64)
    qb = np.floor(b / 0.01).astype(np.int64)
    grid = np.unique(np.r_[qa, qb])
    fa = np.searchsorted(np.sort(qa), grid, side="right")
    fb = np.searchsorted(np.sort(qb), grid, side="right")
    gap = np.abs(fa * len(b) - fb * len(a))
    assert out.loc[0, "d_num"] == gap.max()
    assert out.loc[0, "ks_d"] == gap.max() / (len(a) * len(b))
    assert out.loc[0, "at_bin"] == grid[int(np.argmax(gap))]
    # a 1.5-sigma shift is a large KS
    assert out.loc[0, "ks_d"] > 0.4


def test_ks_identical_halves_zero(ray_session):
    from sits_ray.stages.drift import ks_drift

    vals = np.r_[np.arange(100) % 7, np.arange(100) % 7].astype(float)
    ts = np.r_[np.arange(100), 1000 + np.arange(100)]
    out = ks_drift(_events(vals, ts))
    assert out.loc[0, "d_num"] == 0
    assert out.loc[0, "ks_d"] == 0.0


def test_ks_batching_invariance(ray_session):
    from sits_ray.stages.drift import ks_drift

    rng = np.random.default_rng(1)
    vals = rng.exponential(20, 500)
    ts = np.arange(500) * 3
    one = ks_drift(_events(vals, ts))
    many = ks_drift(_events(vals, ts).repartition(11))
    pd.testing.assert_frame_equal(one, many)


# --- Mann-Whitney U / AUC drift ----------------------------------------------

def test_mw_matches_scipy_style_brute(ray_session):
    from sits_ray.stages.drift import mw_drift

    rng = np.random.default_rng(23)
    a = rng.normal(50, 10, 400)
    b = rng.normal(58, 10, 300)
    vals = np.r_[a, b]
    ts = np.r_[np.arange(400), 10_000 + np.arange(300)]
    out = mw_drift(_events(vals, ts))
    # brute-force midrank U on the same 0.01 grid
    qa = np.floor(a / 0.01)
    qb = np.floor(b / 0.01)
    allv = np.r_[qa, qb]
    ranks = pd.Series(allv).rank(method="average").to_numpy()
    r_a = ranks[: len(a)].sum()
    u_a = r_a - len(a) * (len(a) + 1) / 2
    assert out.loc[0, "u2"] == int(round(2 * u_a))
    assert out.loc[0, "auc"] == float(int(round(2 * u_a))) / float(
        2 * len(a) * len(b))
    # an 0.8-sigma downward level shift: early < late -> auc well below 0.5
    assert out.loc[0, "auc"] < 0.4
    assert out.loc[0, "z"] < -3.0


def test_mw_identical_halves_centered(ray_session):
    from sits_ray.stages.drift import mw_drift

    vals = np.r_[np.arange(100) % 9, np.arange(100) % 9].astype(float)
    ts = np.r_[np.arange(100), 1000 + np.arange(100)]
    out = mw_drift(_events(vals, ts))
    # identical composition -> U exactly ta*tb/2 -> auc exactly 0.5, z 0
    assert out.loc[0, "u2"] == 100 * 100
    assert out.loc[0, "auc"] == 0.5
    assert out.loc[0, "z"] == 0.0


def test_mw_all_early_wins(ray_session):
    from sits_ray.stages.drift import mw_drift

    vals = np.r_[np.full(50, 99.0), np.full(60, 1.0)]
    ts = np.r_[np.arange(50), 1000 + np.arange(60)]
    out = mw_drift(_events(vals, ts))
    assert out.loc[0, "auc"] == 1.0      # every early value beats every late
    assert out.loc[0, "u2"] == 2 * 50 * 60


def test_mw_batching_invariance(ray_session):
    from sits_ray.stages.drift import mw_drift

    rng = np.random.default_rng(7)
    vals = rng.exponential(30, 500)
    ts = np.arange(500) * 3
    one = mw_drift(_events(vals, ts))
    many = mw_drift(_events(vals, ts).repartition(11))
    pd.testing.assert_frame_equal(one, many)


# --- Welch's t-test -------------------------------------------------------------

def test_welch_matches_scipy_style_brute(ray_session):
    from sits_ray.stages.drift import welch_drift

    rng = np.random.default_rng(29)
    a = rng.normal(50, 10, 400)
    b = rng.normal(54, 14, 300)
    vals = np.r_[a, b]
    ts = np.r_[np.arange(400), 10_000 + np.arange(300)]
    out = welch_drift(_events(vals, ts))
    qa = np.floor(a / 0.01)
    qb = np.floor(b / 0.01)
    m1, m2 = qa.mean(), qb.mean()
    v1, v2 = qa.var(ddof=1), qb.var(ddof=1)
    se2 = v1 / len(a) + v2 / len(b)
    t = (m1 - m2) / np.sqrt(se2)
    df = se2**2 / ((v1 / len(a))**2 / (len(a) - 1)
                   + (v2 / len(b))**2 / (len(b) - 1))
    assert abs(out.loc[0, "t_stat"] - t) < 1e-9
    assert abs(out.loc[0, "df"] - df) < 1e-6
    assert out.loc[0, "t_stat"] < -3.0  # planted +4 shift detected


def test_welch_identical_halves_zero_t(ray_session):
    from sits_ray.stages.drift import welch_drift

    vals = np.r_[np.arange(100) % 9, np.arange(100) % 9].astype(float)
    ts = np.r_[np.arange(100), 1000 + np.arange(100)]
    out = welch_drift(_events(vals, ts))
    assert out.loc[0, "t_stat"] == 0.0
    assert out.loc[0, "mean_a"] == out.loc[0, "mean_b"]
