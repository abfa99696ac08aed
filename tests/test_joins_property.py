"""Property test: the broadcast lookup and Dataset.join paths of
adaptive_join_unique return the same multiset of rows for arbitrary
int-keyed inputs (duplicated left keys, missing matches, empty sides,
negative keys)."""
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st


def _rows(ds):
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return []
    t = pa.concat_tables(tabs)
    cols = sorted(t.column_names)
    return sorted(
        (tuple(r[c] for c in cols) for r in t.select(cols).to_pylist()),
        key=repr,
    )


@settings(max_examples=20, deadline=None)
@given(
    # min_size=1: Ray 2.49's Dataset.join itself raises on an EMPTY left
    # side (acero "No match ... for key field reference" on the empty
    # block) — a Ray edge, not ours; the broadcast path's empty-left
    # behavior is pinned in tests/test_joins.py instead
    left_keys=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    right_keys=st.lists(st.integers(-50, 50), min_size=1, max_size=40,
                        unique=True),
    join_type=st.sampled_from(["inner", "left_outer"]),
    data=st.data(),
)
def test_broadcast_equals_distributed(ray_session, left_keys, right_keys,
                                      join_type, data):
    import ray.data as rd

    from sits_ray.stages.joins import adaptive_join_unique

    left = pa.table(
        {"k": pa.array(left_keys, pa.int64()),
         "x": pa.array(range(len(left_keys)), pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array(right_keys, pa.int64()),
         "v": pa.array([k * 3 for k in right_keys], pa.int64())}
    )
    kw = dict(on="k", right_on="rk", value_cols={"v": "v2"},
              join_type=join_type)
    bc = adaptive_join_unique(
        rd.from_arrow(left), right, broadcast_rows=10**9, **kw
    )
    dist = adaptive_join_unique(
        rd.from_arrow(left), right, broadcast_rows=0, **kw
    )
    assert _rows(bc) == _rows(dist)
