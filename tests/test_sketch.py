"""Bounded-state heavy-hitter sketch: exactness under forced truncation,
error-bound bookkeeping, and vocab stats vs pandas brute force."""

import numpy as np
import pandas as pd

from sits_ray.stages.sketch import _ERR_TOKEN, _batch_sketch


def _corpus():
    # skewed corpus: 'alpha' dominates, mid tokens, long unique tail
    rows = []
    for i in range(30):
        rows.append("alpha " * 10 + f"mid{i % 5} " * 3 + f"tail{i} uniq{i}")
    return pd.DataFrame({"doc_id": range(len(rows)), "text": rows,
                         "source": ["s" + str(i % 3) for i in range(len(rows))]})


def test_batch_sketch_truncates_and_carries_error():
    df = _corpus()
    sk = _batch_sketch(df["text"], cap=3)
    assert len(sk) == 4  # cap rows + error row
    err = sk[sk["token"] == _ERR_TOKEN]
    assert len(err) == 1 and int(err["cnt"].iloc[0]) > 0
    # kept rows are the 3 most frequent
    brute = (
        df["text"].str.lower().str.findall(r"[a-z]+").explode().value_counts()
    )
    kept = set(sk[sk["token"] != _ERR_TOKEN]["token"])
    assert kept == set(brute.index[:3])


def test_heavy_hitters_exact_under_tiny_cap(ray_session):
    import ray.data as rd

    from sits_ray.stages.sketch import heavy_hitter_tokens

    df = _corpus()
    # tiny cap + tiny batches force truncation in EVERY batch
    ds = rd.from_pandas(df).repartition(10)
    got = heavy_hitter_tokens(ds, k=5, cap=4)
    # tokens are [a-z]+ runs: digits split them (mid0 -> mid)
    brute = (
        df["text"].str.lower().str.findall(r"[a-z]+").explode().value_counts()
    )
    want = (
        brute.rename_axis("token")
        .reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )
    assert got["token"].tolist() == want["token"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_vocab_stats_brute_force(ray_session):
    import ray.data as rd

    from sits_ray.stages.sketch import vocab_stats

    df = _corpus()
    got = vocab_stats(rd.from_pandas(df).repartition(4))
    ex = df.assign(tok=df["text"].str.lower().str.findall(r"[a-z]+")).explode(
        "tok"
    )
    want = ex.groupby("source").agg(
        n_vocab=("tok", "nunique"), n_tokens=("tok", "size")
    ).reset_index()
    got = got.sort_values("source").reset_index(drop=True)
    want = want.sort_values("source").reset_index(drop=True)
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_vocab"].tolist() == want["n_vocab"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
