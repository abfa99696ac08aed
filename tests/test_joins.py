"""adaptive/broadcast key-unique join: parity with Dataset.join on both
join types, threshold routing, and the key-uniqueness contract."""
import numpy as np
import pyarrow as pa
import pytest


def _mk(seed=3, n_left=5000, n_right=700):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "node": rng.integers(0, 10_000, n_left),
            "peer": rng.integers(0, 2_000, n_left),
            "w": rng.random(n_left),
        }
    )
    keys = rng.choice(2_500, size=n_right, replace=False).astype(np.int64)
    right = pa.table(
        {
            "node": keys,
            "lbl": rng.integers(0, 99, n_right),
            "txt": pa.array([f"t{k}" for k in keys]),
        }
    )
    return left, right


def _rows(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
        or [pa.table({})]
    )
    cols = sorted(t.column_names)
    return sorted(
        (tuple(r[c] for c in cols) for r in t.select(cols).to_pylist()),
        key=repr,
    )


@pytest.mark.parametrize("join_type", ["inner", "left_outer"])
def test_broadcast_matches_dataset_join(ray_session, join_type):
    import ray.data as rd

    from sits_ray.stages.joins import adaptive_join_unique

    left_t, right_t = _mk()
    left, right = rd.from_arrow(left_t), rd.from_arrow(right_t)
    got = adaptive_join_unique(
        left, right, on="peer", right_on="node",
        value_cols={"lbl": "lbl", "txt": "txt_b"}, join_type=join_type,
    )
    ref = left.join(
        right.select_columns(["node", "lbl", "txt"]),
        join_type=join_type, num_partitions=2,
        on=("peer",), right_on=("node",),
    ).map_batches(
        lambda t: t.rename_columns(
            [{"txt": "txt_b"}.get(c, c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    assert sorted(got.schema().names) == sorted(ref.schema().names)
    assert _rows(got) == _rows(ref)


def test_threshold_routes_to_dataset_join(ray_session):
    import ray.data as rd

    from sits_ray.stages.joins import adaptive_join_unique

    left_t, right_t = _mk(seed=7)
    got = adaptive_join_unique(
        rd.from_arrow(left_t), rd.from_arrow(right_t),
        on="peer", right_on="node", value_cols={"lbl": "lbl"},
        broadcast_rows=10,  # force the distributed path
    )
    want = adaptive_join_unique(
        rd.from_arrow(left_t), rd.from_arrow(right_t),
        on="peer", right_on="node", value_cols={"lbl": "lbl"},
        broadcast_rows=10**9,  # force the broadcast path
    )
    assert _rows(got) == _rows(want)


def test_empty_right_and_empty_left(ray_session):
    import ray.data as rd

    from sits_ray.stages.joins import adaptive_join_unique

    left_t, right_t = _mk(seed=5, n_left=64, n_right=16)
    empty_right = right_t.slice(0, 0)
    got = adaptive_join_unique(
        rd.from_arrow(left_t), empty_right, on="peer", right_on="node",
        value_cols={"lbl": "lbl"},
    )
    assert got.count() == 0
    outer = adaptive_join_unique(
        rd.from_arrow(left_t), empty_right, on="peer", right_on="node",
        value_cols={"lbl": "lbl"}, join_type="left_outer",
    )
    t = pa.concat_tables(
        [pa.table(b) for b in outer.iter_batches(batch_format="pyarrow")]
    )
    assert t.num_rows == left_t.num_rows and t["lbl"].null_count == t.num_rows
    got2 = adaptive_join_unique(
        rd.from_arrow(left_t.slice(0, 0)), right_t, on="peer",
        right_on="node", value_cols={"lbl": "lbl"},
    )
    assert got2.count() == 0


def test_duplicate_keys_raise(ray_session):
    import ray.data as rd

    from sits_ray.stages.joins import broadcast_join_unique

    left_t, _ = _mk(seed=9, n_left=8)
    dup = pa.table({"node": [1, 1, 2], "lbl": [5, 6, 7]})
    with pytest.raises(ValueError, match="key-unique"):
        broadcast_join_unique(
            rd.from_arrow(left_t), dup, on="peer", right_on="node",
            value_cols={"lbl": "lbl"},
        ).materialize()
