"""Adoption latency deciles (eventops.adoption_latency_deciles):
hand-built user timelines, non-adopter exclusion."""

import numpy as np
import pandas as pd


def _mk(rows):
    import ray.data as rd

    u, s, t = zip(*rows)
    return rd.from_pandas(pd.DataFrame({
        "user_id": np.asarray(u, np.int64),
        "ts": pd.to_datetime(np.asarray(s, np.int64) * 86400_000_000,
                             unit="us"),
        "event_type": list(t)}))


def test_hand_latencies(ray_session):
    from sits_ray.stages.eventops import adoption_latency_deciles

    # user 1: first day 0, first click day 2 -> 2 days
    # user 2: first day 0, first click day 5 -> 5 days
    # user 3: never clicks -> excluded from deciles, counted in n_users
    rows = [(1, 0, "view"), (1, 2, "click"),
            (2, 0, "view"), (2, 5, "click"),
            (3, 0, "view"), (3, 9, "view")]
    out = adoption_latency_deciles(_mk(rows))
    assert out.n_users.tolist() == [3] * 9
    assert out.n_adopters.tolist() == [2] * 9
    # deciles over {2, 5}: lower nearest rank -> d<=5 -> 2, d>5 -> 5
    assert out.latency_days.tolist() == [2, 2, 2, 2, 2, 5, 5, 5, 5]


def test_same_day_adoption_zero(ray_session):
    from sits_ray.stages.eventops import adoption_latency_deciles

    rows = [(7, 0, "click"), (7, 3, "view")]
    out = adoption_latency_deciles(_mk(rows))
    assert (out.latency_days.to_numpy() == 0).all()
