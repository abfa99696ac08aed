"""Hurst R/S analysis (drift.hurst_rs_daily): hand R/S on one block,
persistence discrimination, incomplete-block exclusion."""

import math

import numpy as np
import pandas as pd


def _mk(counts):
    import ray.data as rd

    us = []
    for d, c in enumerate(counts):
        us.extend([d * 86400_000_000 + i for i in range(int(c))])
    return rd.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(np.asarray(us, np.int64), unit="us")}))


def test_hand_single_block(ray_session):
    from sits_ray.stages.drift import hurst_rs_daily

    # exactly one w=8 block; hand-compute R/S
    y = [3, 1, 4, 1, 5, 9, 2, 6]
    out = hurst_rs_daily(_mk(y), windows=(8,))
    assert out.w.tolist() == [8]
    assert out.n_blocks.tolist() == [1]
    w, s = 8, sum(y)
    q = sum(v * v for v in y)
    cum = np.cumsum(y)
    z = w * cum - np.arange(1, 9) * s
    rsc = max(z.max(), 0) - min(z.min(), 0)
    rs = (rsc / w) / (math.sqrt(w * q - s * s) / w)
    assert float(out.rs_mean.iloc[0]) == rs
    assert float(out.hurst.iloc[0]) == 0.0      # single window -> guard


def test_persistent_beats_alternating(ray_session):
    from sits_ray.stages.drift import hurst_rs_daily

    n = 64
    trend = [10 + d for d in range(n)]                      # persistent
    alt = [10 + (5 if d % 2 == 0 else 0) for d in range(n)]  # oscillating
    h_t = hurst_rs_daily(_mk(trend), windows=(8, 16, 32))
    h_a = hurst_rs_daily(_mk(alt), windows=(8, 16, 32))
    assert float(h_t.hurst.iloc[0]) > float(h_a.hurst.iloc[0])
    assert float(h_t.hurst.iloc[0]) > 0.8       # strong persistence


def test_incomplete_blocks_dropped(ray_session):
    from sits_ray.stages.drift import hurst_rs_daily

    out = hurst_rs_daily(_mk([5, 7, 3, 9, 2, 8, 4, 6, 1, 9, 9]),
                         windows=(8, 16))
    # 11 days: one full w=8 block, no w=16 block
    assert out.w.tolist() == [8]
    assert out.n_blocks.tolist() == [1]
