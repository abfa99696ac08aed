"""Good-Turing FoF table and source vocabulary overlap (stages/sketch):
hand censuses and brute-force Jaccard."""

import numpy as np
import pandas as pd


def _docs(rows):
    import ray.data as rd

    s, t = zip(*rows)
    return rd.from_pandas(pd.DataFrame({"source": list(s),
                                        "text": list(t)}))


def test_good_turing_hand(ray_session):
    from sits_ray.stages.sketch import good_turing_fof

    # counts: aa x3, bb x2, cc x1, dd x1 -> N=7, N1=2, N2=1, N3=1
    ds = _docs([("x", "aa bb cc"), ("x", "aa bb dd aa")])
    out = good_turing_fof(ds, max_r=3)
    assert out.r.tolist() == [1, 2, 3]
    assert out.n_r.tolist() == [2, 1, 1]
    # r*=1: 2*N2/N1 = 1.0 ; r*=2: 3*N3/N2 = 3.0 ; r*=3: 4*N4/N3 = 0
    assert out.r_star.tolist() == [1.0, 3.0, 0.0]
    assert (out.p_unseen == 2.0 / 7.0).all()


def test_good_turing_missing_r_zero(ray_session):
    from sits_ray.stages.sketch import good_turing_fof

    ds = _docs([("x", "aa aa aa aa")])   # single word, count 4
    out = good_turing_fof(ds, max_r=5)
    assert out.n_r.tolist() == [0, 0, 0, 1, 0]
    assert (out.p_unseen == 0.0).all()


def test_overlap_brute_force(ray_session):
    from sits_ray.stages.sketch import source_vocab_overlap

    ds = _docs([
        ("a", "w x y"), ("a", "x y"),        # A = {w, x, y}
        ("b", "x y z"),                      # B = {x, y, z}
        ("c", "qq"),                         # C = {qq} (disjoint)
    ])
    out = source_vocab_overlap(ds)
    ab = out[(out.src_a == "a") & (out.src_b == "b")].iloc[0]
    assert (int(ab.n_a), int(ab.n_b), int(ab.inter)) == (3, 3, 2)
    assert float(ab.jaccard) == 2.0 / 4.0
    # disjoint pair omitted (inner-join semantics)
    assert not (((out.src_a == "a") & (out.src_b == "c"))
                | ((out.src_a == "c"))).any()


def test_overlap_token_multiplicity_ignored(ray_session):
    from sits_ray.stages.sketch import source_vocab_overlap

    # repeats don't change the DISTINCT vocab sets
    ds = _docs([("a", "x x x x y"), ("b", "x")])
    out = source_vocab_overlap(ds)
    r = out.iloc[0]
    assert (int(r.n_a), int(r.n_b), int(r.inter)) == (2, 1, 1)
    assert float(r.jaccard) == 0.5
