import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.stages.quantile import _rank, exact_quantile


def _truth(v: np.ndarray, q: float) -> float:
    v = np.sort(v[~np.isnan(v)])
    return float(v[_rank(q, v.size) - 1])


@pytest.mark.parametrize("q", [0.0, 0.5, 0.95, 0.99, 1.0])
def test_exact_quantile_matches_sort(ray_session, q):
    rng = np.random.default_rng(11)
    v = np.concatenate([rng.lognormal(0, 2, 20_000), [np.nan] * 50])
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(8)
    got = exact_quantile(ds, "x", q, bins=64, max_collect=256)
    assert got == _truth(v, q)


def test_exact_quantile_duplicate_heavy(ray_session):
    # a point mass spanning the quantile: the range stops shrinking and
    # the distinct-value resolver must answer without collecting rows
    v = np.concatenate([np.full(50_000, 7.25), np.arange(100, dtype=float)])
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(4)
    got = exact_quantile(ds, "x", 0.5, bins=16, max_collect=8)
    assert got == 7.25
    # quantile inside the tail beyond the mass
    got99 = exact_quantile(ds, "x", 0.999, bins=16, max_collect=8)
    assert got99 == _truth(v, 0.999)


def test_exact_quantile_small_and_empty(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"x": [3.0]}))
    assert exact_quantile(ds, "x", 0.5) == 3.0
    e = rd.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))
    assert math.isnan(exact_quantile(e, "x", 0.5))


def test_exact_quantile_adversarial_edges(ray_session):
    # values packed around bin edges of the first refinement
    rng = np.random.default_rng(3)
    base = np.linspace(0.0, 1.0, 65)  # aligned with bins=64 edges
    v = np.repeat(base, 37) + rng.choice([0.0, 1e-16, -1e-16], size=65 * 37)
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(4)
    for q in (0.25, 0.5, 0.75, 0.95):
        assert exact_quantile(ds, "x", q, bins=64, max_collect=128) == _truth(v, q)
