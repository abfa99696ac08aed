"""part_aggregate: exactness vs a plain pandas groupby (the helper must
be a pure execution-strategy change), key routing stability, and dtype
coverage (int keys via splitmix64 bit mixing, string keys via stable hash)."""

import numpy as np
import pandas as pd

from sits_ray.stages.hashagg import part_aggregate, part_of_values


def test_part_of_values_int_and_negative():
    v = np.array([-5, -1, 0, 1, 31, 32], dtype=np.int64)
    p = part_of_values(v, 16)
    assert ((p >= 0) & (p < 16)).all()
    # deterministic
    np.testing.assert_array_equal(p, part_of_values(v, 16))


def test_part_of_values_str_stable():
    v = np.array(["alpha", "beta", "alpha", ""], dtype=object)
    p = part_of_values(v, 8)
    assert p[0] == p[2]
    assert ((p >= 0) & (p < 8)).all()
    np.testing.assert_array_equal(p, part_of_values(v, 8))


def test_part_aggregate_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 500, size=20_000).astype(np.int64),
            "x": rng.integers(0, 100, size=20_000).astype(np.int64),
        }
    )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False, sort=False)["x"].sum()
        out.columns = ["k", "sx"]
        return out

    got = (
        part_aggregate(rd.from_pandas(df).repartition(16), agg, key_col="k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.groupby("k", as_index=False)["x"].sum()
    want.columns = ["k", "sx"]
    want = want.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["sx"].tolist() == want["sx"].tolist()


def test_part_aggregate_string_keys(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"k": [f"t{i % 37}" for i in range(3000)],
         "x": np.ones(3000, dtype=np.int64)}
    )

    def agg(g):
        return g.groupby("k", as_index=False, sort=False)["x"].count()

    got = (
        part_aggregate(rd.from_pandas(df).repartition(8), agg, key_col="k",
                       n_parts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(got) == 37
    assert got.set_index("k")["x"].to_dict() == df["k"].value_counts().to_dict()
