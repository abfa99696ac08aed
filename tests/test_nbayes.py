"""Multinomial Naive Bayes (stages/nbayes.py): hand-computed posterior
parity, OOV skipping, argmax tie-break, quantization contract."""

import math

import numpy as np
import pandas as pd
import pytest


def _mk(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    return rd.from_pandas(df)


def _q(x: float) -> int:
    return math.floor(x * 1000000.0 + 0.5)


def test_nb_hand_corpus(ray_session):
    from sits_ray.stages.nbayes import nb_classify, nb_train

    # train: doc 1,2 (class a: "x x y"), doc 3 (class b: "y y z")
    # test: doc 5 "x x" -> class a; doc 10 "z z" -> class b
    ds = _mk([
        (1, "x x y", "a"),
        (2, "x", "a"),
        (3, "y y z", "b"),
        (5, "x x", "a"),
        (10, "z z", "b"),
    ])
    model = nb_train(ds, train_pred=lambda df: df["doc_id"] % 5 != 0)
    out = (nb_classify(ds, model,
                       test_pred=lambda df: df["doc_id"] % 5 == 0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # vocab = {x, y, z}, V=3; class a: 4 tokens (x:3, y:1); b: 3 (y:2, z:1)
    def lp(c_tok, c_tot):
        return _q(math.log(float(c_tok + 1) / float(c_tot + 3)))

    pa_, pb = _q(math.log(2 / 3)), _q(math.log(1 / 3))
    s5a = pa_ + 2 * lp(3, 4)
    s5b = pb + 2 * lp(0, 3)
    s10a = pa_ + 2 * lp(0, 4)
    s10b = pb + 2 * lp(1, 3)
    assert out.pred_source.tolist() == ["a", "b"]
    assert out.score.tolist() == [max(s5a, s5b), max(s10a, s10b)]
    assert out.correct.tolist() == [1, 1]
    assert s5a > s5b and s10b > s10a


def test_nb_oov_and_tiebreak(ray_session):
    from sits_ray.stages.nbayes import nb_classify, nb_train

    # symmetric classes -> a test doc of only OOV tokens scores prior
    # only, equal for both classes, and the tie breaks to the
    # lexicographically smallest class name
    ds = _mk([
        (1, "x", "beta"),
        (2, "x", "alpha"),
        (5, "qq zz", "beta"),
    ])
    model = nb_train(ds, train_pred=lambda df: df["doc_id"] % 5 != 0)
    out = nb_classify(
        ds, model, test_pred=lambda df: df["doc_id"] % 5 == 0
    ).to_pandas()
    assert out.pred_source.tolist() == ["alpha"]
    assert out.score.tolist() == [_q(math.log(0.5))]
    assert out.correct.tolist() == [0]


def test_nb_quantization_matches_duckdb_ln(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from sits_ray.stages.nbayes import nb_train

    con = duckdb.connect()
    # spot check the shared quantization formula: ln(4/7) path
    got = con.execute(
        "select cast(floor(ln(cast(4 as double)/cast(7 as double))"
        " * 1000000e0 + 0.5e0) as bigint)").fetchone()[0]
    assert got == _q(math.log(4.0 / 7.0))
