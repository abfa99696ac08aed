"""Sequential pattern mining (stages/seqmine.py): hand-computed supports,
first-occurrence semantics, deterministic top-k cut."""

import numpy as np
import pandas as pd


def _mk(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["user_id", "event_id", "event_type"])
    df["user_id"] = df["user_id"].astype(np.int64)
    df["event_id"] = df["event_id"].astype(np.int64)
    return rd.from_pandas(df)


def test_hand_supports(ray_session):
    from sits_ray.stages.seqmine import seq_patterns_topk

    # user 1: a(1) b(2) a(3)  -> a<b
    # user 2: b(10) a(11)     -> b<a
    # user 3: a(20) b(21) c(22) -> a<b, a<c, b<c
    # user 4: only a          -> no pairs
    ds = _mk([
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 10, "b"), (2, 11, "a"),
        (3, 20, "a"), (3, 21, "b"), (3, 22, "c"),
        (4, 30, "a"),
    ])
    out = seq_patterns_topk(ds, k=10)
    got = {(r.type_a, r.type_b): r.n_users for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1,
                   ("b", "c"): 1}
    # total users = 4 (user 4 counts in the denominator)
    ab = out[(out.type_a == "a") & (out.type_b == "b")]
    assert float(ab.support_frac.iloc[0]) == 2.0 / 4.0


def test_first_occurrence_only(ray_session):
    from sits_ray.stages.seqmine import seq_patterns_topk

    # b appears before a's SECOND occurrence but after its first:
    # first(a)=1 < first(b)=2, so only a<b counts, never b<a.
    ds = _mk([(7, 1, "a"), (7, 2, "b"), (7, 3, "a")])
    out = seq_patterns_topk(ds, k=10)
    got = {(r.type_a, r.type_b) for r in out.itertuples()}
    assert got == {("a", "b")}


def test_topk_cut_deterministic(ray_session):
    from sits_ray.stages.seqmine import seq_patterns_topk

    # three tied pairs, k=2 -> lexicographically smallest two survive
    ds = _mk([
        (1, 1, "x"), (1, 2, "y"),
        (2, 3, "x"), (2, 4, "z"),
        (3, 5, "y"), (3, 6, "z"),
    ])
    out = seq_patterns_topk(ds, k=2)
    assert [(r.type_a, r.type_b) for r in out.itertuples()] == [
        ("x", "y"), ("x", "z")]
