"""Sequence packing (stages/packing.py): hand-replayed next-fit walks,
oversize truncation, partition independence, empty-doc rule."""

import numpy as np
import pandas as pd


def _ds(ids, texts):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"doc_id": np.asarray(ids, np.int64), "text": texts}))


def test_next_fit_hand_walk():
    from sits_ray.stages.packing import _next_fit

    # budget 10, sorted order given: [7, 6, 3, 2, 1]
    #   7 -> bin1 rem 3; 6 -> bin2 rem 4; 3 -> bin2 rem 1;
    #   2 -> bin3 rem 8; 1 -> bin3 rem 7
    assert _next_fit(np.array([7, 6, 3, 2, 1]), 10) == (3, 19)
    # oversize truncates to one full bin
    assert _next_fit(np.array([25, 4]), 10) == (2, 14)
    # all-empty: no bin opens
    assert _next_fit(np.array([0, 0]), 10) == (0, 0)


def test_pack_sequences_single_partition(ray_session):
    from sits_ray.stages.packing import pack_sequences

    # one partition so the walk order is fully determined
    texts = ["a " * 7, "b " * 6, "c " * 3, "d " * 2, "e"]
    out = pack_sequences(_ds(range(5), texts), budget=10, n_parts=1)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_docs"], r["n_bins"], r["sum_packed"]) == (5, 3, 19)
    assert r["fill_frac"] == 19 / 30


def test_pack_sequences_partition_independence(ray_session):
    """Each partition's summary must equal packing that partition's
    docs alone (per-shard semantics)."""
    from sits_ray.stages.hashagg import part_of_values
    from sits_ray.stages.packing import _next_fit, pack_sequences

    rng = np.random.default_rng(4)
    ids = np.arange(40, dtype=np.int64)
    texts = ["w " * int(rng.integers(1, 30)) for _ in ids]
    out = pack_sequences(_ds(ids, texts), budget=16, n_parts=4)
    parts = part_of_values(ids, 4)
    n_tok = np.array([len(t.split()) for t in texts], np.int64)
    for _, row in out.iterrows():
        sel = parts == row["part"]
        order = np.lexsort((ids[sel], -n_tok[sel]))
        nb, packed = _next_fit(np.minimum(n_tok[sel][order], 16), 16)
        assert (row["n_bins"], row["sum_packed"]) == (nb, packed)
        assert row["n_docs"] == int(sel.sum())
