"""Corpus Spearman without a global sort (stages/rankcorr.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from sits_ray.stages.rankcorr import spearman_value_latency


def _events(user_id, event_id, ts_us, value):
    return rd.from_pandas(pd.DataFrame({
        "user_id": np.asarray(user_id),
        "event_id": np.asarray(event_id, dtype=np.int64),
        "ts": pd.to_datetime(np.asarray(ts_us, dtype=np.int64), unit="us"),
        "value": np.asarray(value, dtype=np.float64),
    }))


def _brute_rho(vals, gaps):
    # textbook Spearman with average ranks (pandas rank == midranks)
    rx = pd.Series(np.floor(np.asarray(vals) * 100.0 + 0.5)).rank()
    ry = pd.Series(gaps).rank()
    return rx.corr(ry, method="pearson")


def test_spearman_matches_textbook(ray_session):
    rng = np.random.default_rng(31)
    n = 400
    # one conversation, increasing timestamps with random gaps
    gaps = rng.integers(1, 5_000_000, n - 1)
    ts = np.concatenate(([0], gaps.cumsum()))
    # value correlated with the gap that PRECEDES the event
    vals = np.concatenate(([0.0], gaps / 1e4 + rng.normal(0, 30, n - 1)))
    out = spearman_value_latency(_events(["c"] * n, np.arange(n), ts, vals))
    assert out.loc[0, "n"] == n - 1
    brute = _brute_rho(vals[1:], gaps)
    assert abs(out.loc[0, "rho"] - brute) < 1e-12
    assert out.loc[0, "rho"] > 0.5  # planted dependence found


def test_spearman_perfect_monotone_and_inverse(ray_session):
    n = 50
    gaps = (np.arange(1, n) * 1000).astype(np.int64)
    ts = np.concatenate(([0], gaps.cumsum()))
    vals_up = np.concatenate(([0.0], np.arange(1, n, dtype=float)))
    out = spearman_value_latency(
        _events(["c"] * n, np.arange(n), ts, vals_up))
    # rho = d / (sqrt(d)*sqrt(d)) — within 1 ulp of 1 (the float tree is
    # the contract; DuckDB computes the identical expression)
    assert abs(out.loc[0, "rho"] - 1.0) < 5e-16
    vals_dn = np.concatenate(([0.0], np.arange(n - 1, 0, -1, dtype=float)))
    out = spearman_value_latency(
        _events(["c"] * n, np.arange(n), ts, vals_dn))
    assert abs(out.loc[0, "rho"] + 1.0) < 5e-16


def test_spearman_first_turns_excluded_and_ties(ray_session):
    # two convs: only turns with a predecessor contribute (3 pairs),
    # tied values get midranks
    user = ["a", "a", "a", "b", "b"]
    ts = [0, 10, 20, 5, 25]
    vals = [9.0, 5.0, 5.0, 9.0, 7.0]
    out = spearman_value_latency(_events(user, np.arange(5), ts, vals))
    assert out.loc[0, "n"] == 3
    brute = _brute_rho([5.0, 5.0, 7.0], [10, 10, 20])
    assert abs(out.loc[0, "rho"] - brute) < 1e-12


def test_spearman_batching_invariance(ray_session):
    rng = np.random.default_rng(17)
    n = 600
    user = np.repeat([f"c{i}" for i in range(20)], 30)
    ts = np.tile(np.concatenate(([0], rng.integers(1, 1e6, 29).cumsum())), 20)
    vals = rng.uniform(0, 100, n)
    ev = np.tile(np.arange(30), 20)
    one = spearman_value_latency(_events(user, ev, ts, vals))
    many = spearman_value_latency(
        _events(user, ev, ts, vals).repartition(13))
    pd.testing.assert_frame_equal(one, many)
