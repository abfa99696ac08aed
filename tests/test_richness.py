"""Chao1 richness and source diversity: hand FoF tables and entropy."""

import math

import numpy as np
import pandas as pd


def test_chao1_hand(ray_session):
    import ray.data as rd

    from sits_ray.stages.sketch import chao1_vocab_richness

    # counts: aa x3, bb x1, cc x1, dd x2 -> D=4, N1=2, N2=1
    ds = rd.from_pandas(pd.DataFrame({
        "text": ["aa bb dd", "aa aa cc dd"]}))
    out = chao1_vocab_richness(ds)
    r = out.iloc[0]
    assert (int(r.n_tokens), int(r.n_distinct)) == (7, 4)
    assert (int(r.n1), int(r.n2)) == (2, 1)
    assert float(r.chao1) == 4.0 + 4.0 / 2.0


def test_chao1_no_doubletons_bias_corrected(ray_session):
    import ray.data as rd

    from sits_ray.stages.sketch import chao1_vocab_richness

    # every word once: D=3, N1=3, N2=0 -> D + 3*2/2 = 6
    ds = rd.from_pandas(pd.DataFrame({"text": ["aa bb cc"]}))
    out = chao1_vocab_richness(ds)
    assert float(out.chao1.iloc[0]) == 3.0 + 3.0


def test_source_diversity_uniform(ray_session):
    from sits_ray.queries import QUERIES

    out = QUERIES["source_diversity"]("/root/testdata/sf0.001")
    r = out.iloc[0]
    assert int(r.n_sources) >= 2
    assert 0.0 < float(r.shannon_h) <= math.log(float(r.n_sources)) + 1e-12
    assert 0.0 < float(r.evenness) <= 1.0 + 1e-12
