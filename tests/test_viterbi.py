"""Viterbi regime decoding (eventops.viterbi_decode): hand-replayed
trellis, tie-to-state-0 contract, short-conversation exclusion."""

import numpy as np
import pandas as pd


def _mk(convs, ts_secs):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "user_id": np.asarray(convs, np.int64),
        "event_id": np.arange(len(convs), dtype=np.int64),
        "ts": pd.to_datetime(np.asarray(ts_secs, np.int64) * 1_000_000,
                             unit="us"),
    }))


def _hand(b_seq):
    from sits_ray.stages.eventops import VITERBI_E, VITERBI_PI, VITERBI_T

    (pi0, pi1) = VITERBI_PI
    ((t00, t01), (t10, t11)) = VITERBI_T
    ((e00, e01), (e10, e11)) = VITERBI_E
    e = ((e00, e01), (e10, e11))
    v0 = pi0 + e[0][b_seq[0]]
    v1 = pi1 + e[1][b_seq[0]]
    for b in b_seq[1:]:
        # tie -> prefer state 0 contribution: v0+t00 >= v1+t10 wins
        nv0 = (v0 + t00 if v0 + t00 >= v1 + t10 else v1 + t10) + e[0][b]
        nv1 = (v0 + t01 if v0 + t01 >= v1 + t11 else v1 + t11) + e[1][b]
        v0, v1 = nv0, nv1
    return (v0, 0) if v0 >= v1 else (v1, 1)


def test_hand_trellis_short_gaps(ray_session):
    from sits_ray.stages.eventops import viterbi_decode

    # conv 1: events at t=0, 10, 20 -> gaps [10, 10] s, both short (b=0)
    out = viterbi_decode(_mk([1, 1, 1], [0, 10, 20])).to_pandas()
    score, state = _hand([0, 0])
    assert out.n_obs.tolist() == [2]
    assert int(out.best_score.iloc[0]) == score
    assert int(out.end_state.iloc[0]) == state == 0


def test_long_gaps_decode_idle(ray_session):
    from sits_ray.stages.eventops import viterbi_decode

    # gaps of 600 s -> long observations favor the idle state
    out = viterbi_decode(_mk([5, 5, 5, 5], [0, 600, 1200, 1800])).to_pandas()
    score, state = _hand([1, 1, 1])
    assert int(out.best_score.iloc[0]) == score
    assert int(out.end_state.iloc[0]) == state == 1


def test_single_event_conversations_excluded(ray_session):
    from sits_ray.stages.eventops import viterbi_decode

    out = viterbi_decode(_mk([1, 2, 2], [0, 5, 10])).to_pandas()
    assert out.conv_id.tolist() == [2]
    assert out.n_obs.tolist() == [1]


def test_mixed_sequence_matches_hand(ray_session):
    from sits_ray.stages.eventops import viterbi_decode

    # gaps: 10 (short), 300 (long), 5 (short), 900 (long)
    ts = [0, 10, 310, 315, 1215]
    out = viterbi_decode(_mk([9] * 5, ts)).to_pandas()
    score, state = _hand([0, 1, 0, 1])
    assert int(out.best_score.iloc[0]) == score
    assert int(out.end_state.iloc[0]) == state
    assert int(out.n_obs.iloc[0]) == 4
