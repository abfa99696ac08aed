"""As-of join, RANGE-interval window, cohort retention, char-shingle
Jaccard dedup — kernel edge cases + brute-force parity + one distributed
end-to-end run."""

import math
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sits_ray.stages.dedup import char_shingles, charshingle_dedup
from sits_ray.stages.eventops import (
    asof_join_kernel,
    range_window_kernel,
    retention_partial_kernel,
)

US = 1_000_000
DAY = 86_400 * US


def _g(conv, ts_us, order, **extras):
    cols = {
        "conv_id": pa.array(conv, pa.int64()),
        "ts": pa.array(np.asarray(ts_us, np.int64).astype("datetime64[us]")),
        "order": pa.array(order, pa.int64()),
    }
    for k, v in extras.items():
        cols[k] = pa.array(v)
    return pa.table(cols)


# --- as-of join ------------------------------------------------------------
def test_asof_tie_break_equal_ts_max_event_id():
    # purchase at t=100s; clicks at 99s (id 3) and EXACTLY 100s (ids 5, 9).
    # SQL `c.ts <= p.ts ... order by c.ts desc, c.event_id desc` picks id 9
    # even though id 9 sorts AFTER the purchase in (ts, order) order.
    g = _g(
        [1, 1, 1, 1],
        [99 * US, 100 * US, 100 * US, 100 * US],
        [3, 5, 7, 9],
        event_type=["click", "click", "purchase", "click"],
    )
    out = asof_join_kernel(g, "purchase", "click").to_pandas()
    assert len(out) == 1
    assert out["right_event_id"][0] == 9
    assert out["lag_seconds"][0] == 0.0


def test_asof_no_click_before_is_null():
    g = _g(
        [1, 1, 2],
        [50 * US, 100 * US, 10 * US],
        [1, 2, 3],
        event_type=["purchase", "click", "purchase"],
    )
    out = asof_join_kernel(g, "purchase", "click").to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    assert out["right_event_id"].isna().all()
    assert out["lag_seconds"].isna().all()


def test_asof_does_not_cross_conversations():
    g = _g(
        [1, 2],
        [50 * US, 100 * US],
        [1, 2],
        event_type=["click", "purchase"],
    )
    out = asof_join_kernel(g, "purchase", "click").to_pandas()
    assert out["right_event_id"].isna().all()


def test_asof_brute_force_parity():
    rng = np.random.default_rng(5)
    n = 400
    conv = rng.integers(0, 7, n)
    ts = rng.integers(0, 1000, n) * US
    order = np.arange(n, dtype=np.int64)
    et = rng.choice(["purchase", "click", "view"], n)
    out = (
        asof_join_kernel(_g(conv, ts, order, event_type=et), "purchase", "click")
        .to_pandas().set_index("event_id")
    )
    for i in np.flatnonzero(et == "purchase"):
        cand = [
            (ts[j], order[j])
            for j in np.flatnonzero((conv == conv[i]) & (et == "click"))
            if ts[j] <= ts[i]
        ]
        row = out.loc[order[i]]
        if not cand:
            assert pd.isna(row["right_event_id"])
        else:
            best = max(cand)
            assert row["right_event_id"] == best[1]
            assert row["lag_seconds"] == (ts[i] - best[0]) / US


# --- range window ----------------------------------------------------------
def test_range_window_date_ties_are_peers():
    # two orders on the SAME day: each window includes BOTH (RANGE peers),
    # regardless of order-id position.
    g = _g([1, 1, 1], [0, 40 * DAY, 40 * DAY], [10, 11, 12], val=[5.0, 1.0, 9.0])
    out = (
        range_window_kernel(g, 30 * DAY, "val")
        .to_pandas().sort_values("order_id").reset_index(drop=True)
    )
    assert list(out["n_window"]) == [1, 2, 2]
    assert list(out["min_window"]) == [5.0, 1.0, 1.0]
    assert list(out["max_window"]) == [5.0, 9.0, 9.0]


def test_range_window_brute_force_parity():
    rng = np.random.default_rng(9)
    n = 300
    conv = rng.integers(0, 5, n)
    ts = rng.integers(0, 90, n) * DAY
    order = np.arange(n, dtype=np.int64)
    v = rng.normal(size=n)
    W = 30 * DAY
    out = (
        range_window_kernel(_g(conv, ts, order, val=v), W, "val")
        .to_pandas().set_index("order_id")
    )
    for i in range(n):
        m = (conv == conv[i]) & (ts >= ts[i] - W) & (ts <= ts[i])
        row = out.loc[order[i]]
        assert row["n_window"] == m.sum()
        assert row["min_window"] == v[m].min()
        assert row["max_window"] == v[m].max()


# --- retention -------------------------------------------------------------
def test_retention_counts_user_once_per_day():
    # user 1: 3 events on day 0, 2 on day 2 -> (d0, 0): 1, (d0, 2): 1
    # user 2: day 2 only -> cohort d2, offset 0
    g = _g(
        [1, 1, 1, 1, 1, 2],
        [10, 20, 30, 2 * DAY, 2 * DAY + 5, 2 * DAY + 7],
        [1, 2, 3, 4, 5, 6],
    )
    out = retention_partial_kernel(g).to_pandas()
    out["cohort_day"] = out["cohort"].astype("int64") // DAY
    got = {
        (int(r["cohort_day"]), int(r["offset_d"])): int(r["n_users"])
        for _, r in out.iterrows()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (2, 0): 1}


# --- char-shingle jaccard --------------------------------------------------
def test_char_shingles_edges():
    assert char_shingles("ab") == {"ab"}      # shorter than k -> whole text
    assert char_shingles("") == {""}          # SQL substr('', 1, 5) = ''
    assert char_shingles("abcdef") == {"abcde", "bcdef"}
    # jaccard of identical docs = 1.0 via the set algebra
    sa = char_shingles("hello world, hello")
    assert len(sa & sa) / len(sa | sa) == 1.0


def test_charshingle_dedup_e2e(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "hazy")         # one-word edit: near-dup
    other = "completely different content with no overlap at all " * 5
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [base, near, other, base]}
    )
    out = (
        charshingle_dedup(rd.from_pandas(df), threshold=0.6, k=5)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 4) in pairs          # exact dup
    assert (1, 2) in pairs or (2, 4) in pairs   # near-dup blocks together
    exact = out[(out["doc_a"] == 1) & (out["doc_b"] == 4)]
    assert float(exact["jaccard"].iloc[0]) == 1.0
    assert not any(3 in p for p in pairs)


def test_charshingle_dedup_no_candidates(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["abcdefgh totally", "zq distinct xx"]}
    )
    out = charshingle_dedup(rd.from_pandas(df), threshold=0.6, k=5)
    # stable schema even with zero candidates (ray to_pandas drops columns
    # on zero-row datasets, so assert on the Dataset schema)
    assert out.schema().names == ["doc_a", "doc_b", "inter", "jaccard"]
    assert out.count() == 0


# --- funnel_kernel ---------------------------------------------------------
def test_funnel_chain_order_and_break():
    from sits_ray.stages.eventops import funnel_kernel

    # conv 1: click BEFORE the first view must not count; later click does.
    # conv 2: view only. conv 3: purchase before everything -> stage 1 only
    # after its view (no click at all).
    g = _g(
        [1, 1, 1, 1, 2, 3, 3],
        [10 * US, 20 * US, 30 * US, 40 * US, 5 * US, 1 * US, 50 * US],
        [1, 2, 3, 4, 5, 6, 7],
        event_type=["click", "view", "click", "purchase", "view",
                    "purchase", "view"],
    )
    out = funnel_kernel(g).to_pandas().set_index("conv_id")
    assert out.loc[1, "funnel_stage"] == 3
    assert out.loc[1, "t_view"] == pd.Timestamp(20 * US, unit="us")
    assert out.loc[1, "t_click"] == pd.Timestamp(30 * US, unit="us")
    assert out.loc[2, "funnel_stage"] == 1
    assert pd.isna(out.loc[2, "t_click"])
    assert out.loc[3, "funnel_stage"] == 1  # purchase precedes view: chain broken
    assert pd.isna(out.loc[3, "t_purchase"])


def test_funnel_same_timestamp_counts():
    from sits_ray.stages.eventops import funnel_kernel

    g = _g(
        [7, 7, 7], [10 * US] * 3, [1, 2, 3],
        event_type=["view", "click", "purchase"],
    )
    out = funnel_kernel(g).to_pandas()
    assert out["funnel_stage"].iloc[0] == 3
    assert (out[["t_view", "t_click", "t_purchase"]].iloc[0]
            == pd.Timestamp(10 * US, unit="us")).all()


def test_funnel_no_events_of_any_stage():
    from sits_ray.stages.eventops import funnel_kernel

    g = _g([4], [10 * US], [1], event_type=["error"])
    out = funnel_kernel(g).to_pandas()
    assert out["funnel_stage"].iloc[0] == 0
    assert out[["t_view", "t_click", "t_purchase"]].isna().all().all()


def test_iqr_outlier_kernel_bruteforce():
    import math

    from sits_ray.stages.eventops import iqr_outlier_kernel

    rng = np.random.default_rng(7)
    conv = np.repeat([1, 2, 3], [20, 5, 1])
    vals = np.concatenate(
        [rng.normal(10, 1, 19), [99.0], rng.normal(0, 1, 5), [42.0]]
    )
    g = _g(conv.tolist(), (np.arange(26) * US).tolist(),
           list(range(26)), value=vals.tolist())
    out = iqr_outlier_kernel(g).to_pandas()
    for c in [1, 2, 3]:
        sub = sorted(vals[conv == c])
        n = len(sub)
        q1 = sub[max(0, math.ceil(0.25 * n) - 1)]
        q3 = sub[max(0, math.ceil(0.75 * n) - 1)]
        hi, lo = q3 + 1.5 * (q3 - q1), q1 - 1.5 * (q3 - q1)
        got = out[out["conv_id"] == c]
        assert (got["q1"] == q1).all() and (got["q3"] == q3).all()
        assert (got["is_outlier"] == ((got["value"] > hi) | (got["value"] < lo))).all()
    # the planted spike is flagged, the singleton conv is not (iqr 0 -> only
    # deviations flagged; a single value equals its own fences)
    assert out.loc[out["value"] == 99.0, "is_outlier"].item()
    assert not out.loc[out["value"] == 42.0, "is_outlier"].item()


def test_type_transition_kernel_boundaries():
    from sits_ray.stages.eventops import type_transition_kernel

    # conv 1: a->b->a ; conv 2: single event (no pair); pairs never cross convs
    g = _g([1, 1, 1, 2], [US, 2 * US, 3 * US, 4 * US], [1, 2, 3, 4],
           event_type=["a", "b", "a", "b"])
    out = type_transition_kernel(g).to_pandas()
    got = {(r.prev_type, r.next_type): r.cnt for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1}
    # equal timestamps: order column breaks the tie
    g2 = _g([5, 5], [US, US], [2, 1], event_type=["x", "y"])
    out2 = type_transition_kernel(g2).to_pandas()
    assert {(r.prev_type, r.next_type) for r in out2.itertuples()} == {("y", "x")}


def test_topk_per_conv_kernel_ties_and_small_groups():
    from sits_ray.stages.eventops import topk_per_conv_kernel

    g = _g([1, 1, 1, 1, 2], [US, 2 * US, 3 * US, 4 * US, 5 * US],
           [4, 3, 2, 1], value=[5.0, 5.0, 1.0, 9.0, 7.0]) if False else _g(
        [1, 1, 1, 1, 2], [US, 2 * US, 3 * US, 4 * US, 5 * US],
        [4, 3, 2, 1, 9], value=[5.0, 5.0, 1.0, 9.0, 7.0])
    out = topk_per_conv_kernel(g, k=3).to_pandas()
    c1 = out[out["conv_id"] == 1]
    # 9.0 first, then the 5.0 tie broken by min event_id (3 before 4)
    assert c1["value"].tolist() == [9.0, 5.0, 5.0]
    assert c1["event_id"].tolist() == [1, 3, 4]
    # conv with fewer than k events returns all of them
    assert out[out["conv_id"] == 2]["value"].tolist() == [7.0]


def test_last_per_bucket_kernel_compaction():
    from sits_ray.stages.eventops import last_per_bucket_kernel

    MIN = 60 * US
    g = _g([1, 1, 1, 1], [MIN + US, MIN + 2 * US, MIN + 2 * US, 3 * MIN],
           [1, 2, 7, 4], event_type=["a", "b", "c", "d"],
           value=[1.0, 2.0, 3.0, 4.0])
    out = last_per_bucket_kernel(g).to_pandas()
    # bucket 1: max ts tie -> max event_id wins (id 7); bucket 3: singleton
    assert out["event_id"].tolist() == [7, 4]
    assert out["event_type"].tolist() == ["c", "d"]
    assert (out["bucket_ts"] == pd.to_datetime([MIN, 3 * MIN], unit="us")).all()


def test_hll_registers_estimate_accuracy():
    """The registers the query emits yield a sane HLL cardinality
    estimate (small-range linear counting when applicable)."""
    df = pd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["user_id"])
    from sits_ray.queries import _hll_mix_np

    h = _hll_mix_np(df["user_id"].to_numpy())
    reg, w = h % 64, h // 64
    bl = np.frexp(w.astype(np.float64))[1]
    rho = np.where(w > 0, 26 - bl, 26)
    m = 64
    M = np.zeros(m)
    np.maximum.at(M, reg, rho)
    alpha = 0.709  # alpha_64
    E = alpha * m * m / np.sum(2.0 ** -M)
    V = int((M == 0).sum())
    if E < 2.5 * m and V > 0:
        E = m * np.log(m / V)
    true = df["user_id"].nunique()
    assert abs(E - true) / true < 0.25
    # and the rank field is consistent: every register rho within [1, 26]
    assert M[M > 0].min() >= 1 and M.max() <= 26


def test_twa_kernel_step_function():
    from sits_ray.stages.eventops import twa_kernel

    # conv 1: value 2 held 10s, value 10 held 30s, final event holds 0
    g = _g([1, 1, 1, 2], [0, 10 * US, 40 * US, 5 * US], [1, 2, 3, 4],
           value=[2.0, 10.0, 7.0, 3.0])
    out = twa_kernel(g).to_pandas().set_index("conv_id")
    assert out.loc[1, "weighted_sum"] == 2.0 * 10 + 10.0 * 30
    assert out.loc[1, "duration"] == 40.0
    assert out.loc[1, "twa"] == (2.0 * 10 + 10.0 * 30) / 40.0
    # single-event conv: zero duration -> null twa
    assert out.loc[2, "duration"] == 0.0
    assert pd.isna(out.loc[2, "twa"])


def test_kendall_kernel_bruteforce():
    from sits_ray.stages.eventops import kendall_kernel

    # conv 1: 5 events -> 4 latencies; conv 2: single event (n=0)
    ts = [0, 10 * US, 15 * US, 45 * US, 50 * US, 7 * US]
    conv = [1, 1, 1, 1, 1, 2]
    vals = [5.0, 1.0, 4.0, 2.0, 9.0, 3.0]
    g = _g(conv, ts, list(range(6)), value=vals)
    out = kendall_kernel(g).to_pandas().set_index("conv_id")
    # brute force: x = value[1:], y = latency diffs
    x = vals[1:5]
    y = [10.0, 5.0, 30.0, 5.0]
    s = 0
    for i in range(4):
        for j in range(i + 1, 4):
            s += int(np.sign(x[j] - x[i]) * np.sign(y[j] - y[i]))
    assert out.loc[1, "n"] == 4 and out.loc[1, "s_xy"] == s
    assert out.loc[1, "tau"] == s / 6.0
    assert out.loc[2, "n"] == 0 and pd.isna(out.loc[2, "tau"])


def test_seasonal_residual_kernel():
    from sits_ray.stages.eventops import seasonal_residual_kernel

    HOUR = 3600 * US
    # conv 1: two events in hod 0 (values 2, 4 -> mean 3), one in hod 5
    g = _g([1, 1, 1, 2], [0, 24 * HOUR, 5 * HOUR, HOUR],
           [1, 2, 3, 4], value=[2.0, 4.0, 10.0, 7.0])
    out = seasonal_residual_kernel(g).to_pandas().set_index("event_id")
    assert out.loc[1, "hod_mean"] == 3.0 and out.loc[1, "residual"] == -1.0
    assert out.loc[2, "hod_mean"] == 3.0 and out.loc[2, "residual"] == 1.0
    assert out.loc[3, "hod_mean"] == 10.0 and out.loc[3, "residual"] == 0.0
    # conv 2 isolated from conv 1's hour-1 mean
    assert out.loc[4, "hod_mean"] == 7.0


def test_type_runs_kernel():
    from sits_ray.stages.eventops import type_runs_kernel

    g = _g([1, 1, 1, 1, 1, 2], [US, 2 * US, 3 * US, 4 * US, 5 * US, US],
           [1, 2, 3, 4, 5, 6],
           event_type=["a", "a", "b", "a", "a", "b"])
    out = type_runs_kernel(g).to_pandas()
    c1 = out[out["conv_id"] == 1]
    assert c1["event_type"].tolist() == ["a", "b", "a"]
    assert c1["run_len"].tolist() == [2, 1, 2]
    assert c1["run_idx"].tolist() == [1, 2, 3]
    assert c1["start_ts"].iloc[2] == pd.Timestamp(4 * US, unit="us")
    assert c1["end_ts"].iloc[0] == pd.Timestamp(2 * US, unit="us")
    assert out[out["conv_id"] == 2]["run_len"].tolist() == [1]


def test_type_gini_kernel():
    from sits_ray.stages.eventops import type_gini_kernel

    g = _g([1, 1, 1, 1, 2, 2], [US] * 6, [1, 2, 3, 4, 5, 6],
           event_type=["a", "a", "b", "b", "a", "a"])
    out = type_gini_kernel(g).to_pandas().set_index("conv_id")
    # conv 1: 2/4 a, 2/4 b -> gini = 1 - (0.25 + 0.25) = 0.5
    assert out.loc[1, "gini"] == 0.5 and out.loc[1, "n"] == 4
    # conv 2: pure -> 0.0
    assert out.loc[2, "gini"] == 0.0


# --- context-window packing --------------------------------------------------
def test_pack_chunks_kernel_boundaries():
    from sits_ray.stages.eventops import pack_chunks_kernel

    # conv 1 costs [1000, 1000, 1000, 100] with budget 2048:
    # excl prefix = [0, 1000, 2000, 3000] -> chunks [0, 0, 0, 1]
    # conv 2 single huge turn (5000): excl 0 -> chunk 0 (never split)
    g = _g(
        [1, 1, 1, 1, 2],
        [1 * US, 2 * US, 3 * US, 4 * US, 1 * US],
        [1, 2, 3, 4, 1],
        cost=np.array([1000, 1000, 1000, 100, 5000], dtype=np.int64),
    )
    out = (
        pack_chunks_kernel(g, budget=2048)
        .to_pandas()
        .sort_values(["conv_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {
        "conv_id": [1, 1, 2],
        "chunk_id": [0, 1, 0],
        "n_turns": [3, 1, 1],
        "chunk_cost": [3000, 100, 5000],
    }


def test_pack_chunks_kernel_time_order_not_input_order():
    from sits_ray.stages.eventops import pack_chunks_kernel

    # rows arrive shuffled; packing must follow (ts, order)
    g = _g(
        [1, 1, 1],
        [3 * US, 1 * US, 2 * US],
        [3, 1, 2],
        cost=np.array([10, 2000, 100], dtype=np.int64),
    )
    out = (
        pack_chunks_kernel(g, budget=2048)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    # excl prefix in time order: [0, 2000, 2100] -> chunks [0, 0, 1]
    assert out["chunk_id"].tolist() == [0, 1]
    assert out["n_turns"].tolist() == [2, 1]
    assert out["chunk_cost"].tolist() == [2100, 10]


def test_pack_chunks_kernel_empty():
    from sits_ray.stages.eventops import pack_chunks_kernel

    g = _g([], [], [], cost=np.array([], dtype=np.int64))
    assert pack_chunks_kernel(g).num_rows == 0


# --- agent-loop detection ----------------------------------------------------
def test_repeat_turns_kernel_counts_and_bursts():
    from sits_ray.stages.eventops import repeat_turns_kernel

    # conv 1 hashes: a b a a b c a  -> repeats at idx 2,3,4,6 (n=4);
    # longest consecutive repeat burst = idx 2,3,4 -> 3
    # conv 2: all distinct -> 0 repeats
    h1 = [10, 20, 10, 10, 20, 30, 10]
    g = _g(
        [1] * 7 + [2] * 3,
        [i * US for i in range(1, 8)] + [1 * US, 2 * US, 3 * US],
        list(range(1, 8)) + [1, 2, 3],
        h=np.array(h1 + [7, 8, 9], dtype=np.int64),
    )
    out = (
        repeat_turns_kernel(g)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {
        "conv_id": [1, 2],
        "n_turns": [7, 3],
        "n_repeats": [4, 2 - 2],
        "max_burst": [3, 0],
    }


def test_repeat_turns_kernel_burst_not_crossing_convs():
    from sits_ray.stages.eventops import repeat_turns_kernel

    # conv 1 ends with a repeat, conv 2 starts with first occurrences:
    # the repeat run must not bridge the boundary
    g = _g(
        [1, 1, 2, 2],
        [1 * US, 2 * US, 1 * US, 2 * US],
        [1, 2, 1, 2],
        h=np.array([5, 5, 5, 5], dtype=np.int64),
    )
    out = (
        repeat_turns_kernel(g)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out["n_repeats"].tolist() == [1, 1]
    assert out["max_burst"].tolist() == [1, 1]


def test_repeat_turns_kernel_empty():
    from sits_ray.stages.eventops import repeat_turns_kernel

    g = _g([], [], [], h=np.array([], dtype=np.int64))
    assert repeat_turns_kernel(g).num_rows == 0


# --- burstiness ---------------------------------------------------------------
def test_fano_kernel_poisson_vs_burst():
    from sits_ray.stages.eventops import fano_kernel

    # conv 1: 4 events in one minute -> span 1, fano = (1*16-16)/(1*4) = 0
    # conv 2: events in minutes 0 and 4, counts [3, 1]: span 5, s=4, ssq=10
    #         fano = (5*10 - 16) / (5*4) = 34/20 = 1.7
    g = _g(
        [1, 1, 1, 1, 2, 2, 2, 2],
        [1, 2, 3, 4, 1, 2, 3, 4 * 60 * US],
        [1, 2, 3, 4, 1, 2, 3, 4],
    )
    out = (
        fano_kernel(g).to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert out["n_minutes"].tolist() == [1, 5]
    assert out["n_events"].tolist() == [4, 4]
    assert out["fano"].tolist() == [0.0, 1.7]


def test_fano_kernel_empty():
    from sits_ray.stages.eventops import fano_kernel

    assert fano_kernel(_g([], [], [])).num_rows == 0


def test_charshingle_dedup_short_and_empty_docs(ray_session):
    """Vectorized stats stage matches char_shingles semantics on edge
    texts: empty (one '' shingle), shorter-than-k (whole text once),
    exactly-k. Two empty docs are exact duplicates (jaccard 1)."""
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["", "", "abc", "abc", "abcde"],
        }
    )
    out = (
        charshingle_dedup(rd.from_pandas(docs), threshold=0.99, k=5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs  # two empty docs: identical single '' shingle
    assert (2, 3) in pairs  # two short docs: identical whole-text shingle
    for a, b in pairs:
        assert out.loc[(out.doc_a == a) & (out.doc_b == b), "jaccard"].iloc[0] == 1.0


# --- M4 downsampling ------------------------------------------------------------
def test_m4_kernel_selections():
    from sits_ray.stages.eventops import m4_kernel

    # one conv, one 10-min bucket: values in time order [5, 1, 9, 4]
    g = _g(
        [1, 1, 1, 1, 2],
        [10 * US, 20 * US, 30 * US, 40 * US, 700 * US],
        [1, 2, 3, 4, 1],
        value=np.array([5.0, 1.0, 9.0, 4.0, 2.5]),
    )
    out = (
        m4_kernel(g)
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [4, 1]
    assert out.loc[0, ["v_first", "v_last", "v_min", "v_max"]].tolist() == [
        5.0, 4.0, 1.0, 9.0,
    ]
    # singleton bucket: all four selections are the same point
    assert out.loc[1, ["v_first", "v_last", "v_min", "v_max"]].tolist() == [
        2.5, 2.5, 2.5, 2.5,
    ]


def test_m4_kernel_bucket_split():
    from sits_ray.stages.eventops import m4_kernel

    # events straddling a bucket edge land in separate buckets
    g = _g(
        [1, 1],
        [599 * US, 601 * US],
        [1, 2],
        value=np.array([1.0, 2.0]),
    )
    out = m4_kernel(g, bucket_us=600 * US).to_pandas()
    assert len(out) == 2


# --- per-conversation autocorrelation ---------------------------------------
def test_acf_kernel_bruteforce_and_boundaries():
    from sits_ray.stages.eventops import acf_kernel

    # conv 1: 8 events with structure; conv 2: 3 events (lags 3-5 absent);
    # conv 3: constant series (den == 0 -> no rows)
    vals = [1.25, 2.5, 1.25, 3.75, 2.5, 1.25, 5.0, 2.5,
            10.0, 20.0, 10.0,
            7.0, 7.0, 7.0, 7.0]
    conv = [1] * 8 + [2] * 3 + [3] * 4
    ts = [i * 1_000_000 for i in range(len(vals))]
    g = _g(conv, ts, list(range(len(vals))), value=vals)
    out = acf_kernel(g).to_pandas()

    def brute(xs, k):
        q = [int(np.floor(x * 100.0 + 0.5)) for x in xs]
        n, S = len(q), sum(q)
        Q = sum(v * v for v in q)
        P = sum(q[t] * q[t + k] for t in range(n - k))
        H = sum(q[t] + q[t + k] for t in range(n - k))
        num = n * n * P - n * S * H + (n - k) * S * S
        den = n * n * Q - n * S * S
        return num / den

    for k in range(1, 6):
        got = out[(out.conv_id == 1) & (out.lag == k)]
        assert len(got) == 1 and got.iloc[0]["n"] == 8
        assert got.iloc[0]["acf"] == brute(vals[:8], k)
    # conv 2: only lags 1 and 2 exist (n=3 > lag)
    assert sorted(out[out.conv_id == 2].lag) == [1, 2]
    for k in (1, 2):
        got = out[(out.conv_id == 2) & (out.lag == k)]
        assert got.iloc[0]["acf"] == brute(vals[8:11], k)
    # conv 3: constant -> zero denominator -> omitted entirely
    assert (out.conv_id != 3).all()
    # no pair ever crossed a conversation boundary: ACF of conv 1 computed
    # alone must match its value from the mixed partition
    solo = acf_kernel(
        _g([1] * 8, ts[:8], list(range(8)), value=vals[:8])
    ).to_pandas()
    merged = out[out.conv_id == 1].reset_index(drop=True)
    assert solo[["lag", "n", "acf"]].equals(merged[["lag", "n", "acf"]])


def test_acf_kernel_empty():
    from sits_ray.stages.eventops import acf_kernel

    out = acf_kernel(_g([], [], [], value=[])).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["conv_id", "lag", "n", "acf"]


# --- lead-lag cross-correlation (ccf_kernel) ---------------------------------
def test_ccf_kernel_bruteforce_and_sign():
    from sits_ray.stages.eventops import ccf_kernel

    # conv 1: value spikes one step BEFORE tool events -> positive lag-1
    vals1 = [9.0, 1.0, 9.5, 1.0, 8.0, 1.0, 9.0, 1.0]
    types1 = ["view", "click", "view", "click", "view", "click", "view",
              "click"]
    # conv 2: tools never fire (vary == 0 -> omitted)
    vals2 = [1.0, 2.0, 3.0]
    types2 = ["view", "view", "view"]
    vals = vals1 + vals2
    conv = [1] * 8 + [2] * 3
    ts = [i * 1_000_000 for i in range(len(vals))]
    g = _g(conv, ts, list(range(len(vals))), value=vals,
           event_type=types1 + types2)
    out = ccf_kernel(g).to_pandas()

    def brute(xs, ys, k):
        q = [int(np.floor(v * 100.0 + 0.5)) for v in xs]
        n = len(q)
        sx, sy = sum(q), sum(ys)
        qx = sum(v * v for v in q)
        qy = sum(v * v for v in ys)
        p = sum(q[t] * ys[t + k] for t in range(n - k))
        hx = sum(q[t] for t in range(n - k))
        hy = sum(ys[t + k] for t in range(n - k))
        num = n * n * p - n * sy * hx - n * sx * hy + (n - k) * sx * sy
        varx = n * n * qx - n * sx * sx
        vary = n * n * qy - n * sy * sy
        sign = -1.0 if num < 0 else 1.0
        return sign * ((num / varx) * (num / vary))

    y1 = [1 if t == "click" else 0 for t in types1]
    for k in range(0, 4):
        got = out[(out.conv_id == 1) & (out.lag == k)]
        assert len(got) == 1 and got.iloc[0]["n"] == 8
        assert got.iloc[0]["r2s"] == brute(vals1, y1, k)
    # the planted structure: value leads tools by one step
    r = {int(k): out[(out.conv_id == 1) & (out.lag == k)]["r2s"].item()
         for k in range(4)}
    assert r[1] > 0 and r[1] > r[0] and r[1] > abs(r[2])
    # conv 2: constant y side omitted entirely
    assert (out.conv_id != 2).all()


def test_ccf_kernel_boundary_isolation_and_empty():
    import pyarrow as pa

    from sits_ray.stages.eventops import ccf_kernel

    # two conversations interleaved in one partition: pairs never cross
    vals = [5.0, 1.0, 5.0, 1.0] + [1.0, 5.0, 1.0, 5.0]
    types = ["view", "click"] * 2 + ["click", "view"] * 2
    conv = [1] * 4 + [2] * 4
    ts = [i * 1_000_000 for i in range(8)]
    merged = ccf_kernel(
        _g(conv, ts, list(range(8)), value=vals, event_type=types)
    ).to_pandas()
    solo1 = ccf_kernel(
        _g([1] * 4, ts[:4], list(range(4)), value=vals[:4],
           event_type=types[:4])
    ).to_pandas()
    m1 = merged[merged.conv_id == 1].reset_index(drop=True)
    assert solo1[["lag", "n", "r2s"]].equals(m1[["lag", "n", "r2s"]])

    empty = ccf_kernel(_g([], [], [], value=[], event_type=[]))
    assert empty.num_rows == 0 and "r2s" in empty.column_names


# --- OLS trend (trend_kernel) ------------------------------------------------
def test_trend_kernel_bruteforce_and_degenerate():
    from sits_ray.stages.eventops import trend_kernel

    # conv 1: clean upward line in cents space; conv 2: singleton (omitted)
    vals1 = [1.00, 2.00, 3.00, 4.00, 5.00]
    vals = vals1 + [9.99]
    conv = [1] * 5 + [2]
    ts = [i * 1_000_000 for i in range(len(vals))]
    out = trend_kernel(
        _g(conv, ts, list(range(len(vals))), value=vals)
    ).to_pandas()
    assert (out.conv_id != 2).all()  # n=1 -> zero denominator -> omitted
    row = out[out.conv_id == 1].iloc[0]

    q = [int(np.floor(v * 100.0 + 0.5)) for v in vals1]
    n = len(q)
    sx, sy = sum(range(1, n + 1)), sum(q)
    sxy = sum((i + 1) * q[i] for i in range(n))
    sxx = sum((i + 1) ** 2 for i in range(n))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert row["slope"] == slope == 100.0  # +1.00/event in cents
    assert row["intercept"] == intercept
    assert row["n"] == 5

    # interleaving another conversation must not change conv 1
    vals_m = vals1 + [50.0, 40.0, 30.0]
    conv_m = [1] * 5 + [2] * 3
    ts_m = [i * 1_000_000 for i in range(8)]
    merged = trend_kernel(
        _g(conv_m, ts_m, list(range(8)), value=vals_m)
    ).to_pandas()
    m1 = merged[merged.conv_id == 1].iloc[0]
    assert m1["slope"] == slope and m1["intercept"] == intercept
    m2 = merged[merged.conv_id == 2].iloc[0]
    assert m2["slope"] == -1000.0  # -10.00/event in cents


def test_trend_kernel_empty():
    from sits_ray.stages.eventops import trend_kernel

    out = trend_kernel(_g([], [], [], value=[]))
    assert out.num_rows == 0 and "slope" in out.column_names


# --- MASE forecastability (mase_kernel) ---------------------------------------
def test_mase_kernel_bruteforce_and_filters():
    from sits_ray.stages.eventops import mase_kernel

    # conv 1: periodic with period 3 -> seasonal-naive is PERFECT (mase 0)
    vals1 = [1.0, 2.0, 3.0] * 3
    # conv 2: constant -> sae_1 == 0 -> omitted
    # conv 3: short (n=3 <= season) -> omitted
    vals = vals1 + [5.0] * 5 + [1.0, 2.0, 3.0]
    conv = [1] * 9 + [2] * 5 + [3] * 3
    ts = [i * 1_000_000 for i in range(len(vals))]
    out = mase_kernel(
        _g(conv, ts, list(range(len(vals))), value=vals)
    ).to_pandas()
    assert set(out.conv_id) == {1}
    row = out.iloc[0]
    assert row["sae_m"] == 0 and row["mase"] == 0.0 and row["n"] == 9

    # brute force on a random series
    rng = np.random.default_rng(3)
    v = np.round(rng.uniform(0, 50, 20), 2)
    out2 = mase_kernel(
        _g([7] * 20, [i * 1_000_000 for i in range(20)], list(range(20)),
           value=v.tolist())
    ).to_pandas()
    q = np.floor(v * 100.0 + 0.5).astype(np.int64)
    sae_m = int(np.abs(q[3:] - q[:-3]).sum())
    sae_1 = int(np.abs(q[1:] - q[:-1]).sum())
    n = 20
    assert out2.iloc[0]["sae_m"] == sae_m and out2.iloc[0]["sae_1"] == sae_1
    assert out2.iloc[0]["mase"] == (sae_m * (n - 1)) / (sae_1 * (n - 3))


def test_mase_kernel_empty():
    from sits_ray.stages.eventops import mase_kernel

    out = mase_kernel(_g([], [], [], value=[]))
    assert out.num_rows == 0 and "mase" in out.column_names


# --- CUSUM spike detection (cusum_kernel) --------------------------------------
def test_cusum_kernel_scalar_twin_and_first_alarm():
    from sits_ray.stages.eventops import cusum_kernel

    # conv 1: quiet then a spike burst; conv 2: always quiet
    vals1 = [10.0, 20.0, 300.0, 400.0, 350.0, 10.0]
    vals = vals1 + [5.0, 5.0, 5.0]
    conv = [1] * 6 + [2] * 3
    ts = [i * 1_000_000 for i in range(len(vals))]
    out = cusum_kernel(
        _g(conv, ts, list(range(len(vals))), value=vals),
        drift=6000, threshold=20000,
    ).to_pandas().set_index("conv_id")

    def scalar(xs, k=6000, h=20000):
        s, n_al, mx, first = 0, 0, 0, -1
        for i, v in enumerate(xs, start=1):
            q = int(np.floor(v * 100.0 + 0.5))
            s = max(0, s + (q - k))
            if s > h:
                n_al += 1
                if first == -1:
                    first = i
            mx = max(mx, s)
        return n_al, mx, first

    for cid, xs in ((1, vals1), (2, [5.0] * 3)):
        n_al, mx, first = scalar(xs)
        row = out.loc[cid]
        assert (row["n_alarms"], row["max_s"], row["first_alarm"]) == (
            n_al, mx, first
        )
    assert out.loc[1, "n_alarms"] > 0 and out.loc[2, "n_alarms"] == 0
    assert out.loc[2, "first_alarm"] == -1


def test_cusum_kernel_interleave_and_empty():
    from sits_ray.stages.eventops import cusum_kernel

    rng = np.random.default_rng(4)
    vals = rng.uniform(0, 500, 40).round(2)
    conv = ([1] * 25) + ([2] * 15)
    ts = [i * 1_000_000 for i in range(40)]
    merged = cusum_kernel(
        _g(conv, ts, list(range(40)), value=vals.tolist())
    ).to_pandas()
    solo = cusum_kernel(
        _g([1] * 25, ts[:25], list(range(25)), value=vals[:25].tolist())
    ).to_pandas()
    m1 = merged[merged.conv_id == 1].reset_index(drop=True)
    assert solo.drop(columns=["conv_id"]).equals(m1.drop(columns=["conv_id"]))

    empty = cusum_kernel(_g([], [], [], value=[]))
    assert empty.num_rows == 0 and "first_alarm" in empty.column_names


# --- interval-stabbing concurrency ---------------------------------------------
def test_concurrency_at_start_bruteforce(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sits_ray.queries import QUERIES

    # hand-built intervals: A [0,10], B [5,20], C [15,30], D [10,12]
    rows = []
    for uid, (lo, hi) in {1: (0, 10), 2: (5, 20), 3: (15, 30),
                          4: (10, 12)}.items():
        rows += [(uid, lo), (uid, hi)]
    df = pd.DataFrame(rows, columns=["user_id", "sec"])
    df["ts"] = pd.to_datetime(df["sec"] * 1_000_000, unit="us")
    d = tmp_path / "events.parquet"
    pq.write_table(pa.Table.from_pandas(df[["user_id", "ts"]],
                                        preserve_index=False), str(d))
    out = QUERIES["concurrency_at_start"](str(tmp_path)).set_index("conv_id")
    # at A's start (0): only A -> 0 others; B's start (5): A active -> 1;
    # C's start (15): B active -> 1; D's start (10): A(end 10) + B -> 2
    assert out.loc[1, "n_concurrent"] == 0
    assert out.loc[2, "n_concurrent"] == 1
    assert out.loc[3, "n_concurrent"] == 1
    assert out.loc[4, "n_concurrent"] == 2


# --- matrix profile (matrix_profile_kernel) ------------------------------------
def _mp_brute(vals, m=4):
    """O(n^2) scalar twin: per window the lexicographic (dist, partner)
    min over |i-j| >= m; motif = (P, i) min, discord = (-P, i) min."""
    q = np.floor(np.asarray(vals, np.float64) * 100.0 + 0.5).astype(np.int64)
    W = len(q) - m + 1
    prof = {}
    for i in range(W):
        best = None
        for j in range(W):
            if abs(j - i) < m:
                continue
            d = int(((q[i:i + m] - q[j:j + m]) ** 2).sum())
            if best is None or (d, j) < best:
                best = (d, j)
        if best is not None:
            prof[i] = best
    if not prof:
        return None
    motif_i = min(prof, key=lambda i: (prof[i][0], i))
    disc_i = min(prof, key=lambda i: (-prof[i][0], i))
    return {
        "n_windows": len(prof),
        "motif_i": motif_i + 1, "motif_j": prof[motif_i][1] + 1,
        "motif_d2": prof[motif_i][0],
        "discord_i": disc_i + 1, "discord_j": prof[disc_i][1] + 1,
        "discord_d2": prof[disc_i][0],
    }


def test_matrix_profile_kernel_bruteforce_random():
    from sits_ray.stages.eventops import matrix_profile_kernel

    rng = np.random.default_rng(11)
    convs, ts, order, vals, expect = [], [], [], [], {}
    t0 = 0
    for cid, n in [(1, 24), (2, 9), (3, 40)]:
        v = np.round(rng.uniform(0, 60, n), 2).tolist()
        convs += [cid] * n
        ts += [t0 + i * US for i in range(n)]
        order += list(range(n))
        vals += v
        expect[cid] = _mp_brute(v)
        t0 += n * US
    out = matrix_profile_kernel(
        _g(convs, ts, order, value=vals)
    ).to_pandas().set_index("conv_id")
    for cid, exp in expect.items():
        row = out.loc[cid]
        for k, want in exp.items():
            assert row[k] == want, (cid, k, row[k], want)


def test_matrix_profile_kernel_edges():
    from sits_ray.stages.eventops import matrix_profile_kernel

    # n = 8, m = 4: windows 1..5; only the extremes 1 and 5 are >= m apart,
    # so windows 2-4 have NO eligible partner -> n_windows = 2
    v = [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]
    out = matrix_profile_kernel(
        _g([1] * 8, [i * US for i in range(8)], list(range(8)), value=v)
    ).to_pandas()
    row = out.iloc[0]
    assert row["n_windows"] == 2 == _mp_brute(v)["n_windows"]
    # windows 1 and 5 are identical copies -> motif distance 0, smallest i
    assert row["motif_i"] == 1 and row["motif_j"] == 5 and row["motif_d2"] == 0
    exp = _mp_brute(v)
    assert row["discord_i"] == exp["discord_i"]
    assert row["discord_d2"] == exp["discord_d2"]

    # convs shorter than 2m never pair -> omitted entirely
    out2 = matrix_profile_kernel(
        _g([1] * 7, [i * US for i in range(7)], list(range(7)),
           value=[1.0] * 7)
    )
    assert out2.num_rows == 0

    # empty input keeps the schema
    out3 = matrix_profile_kernel(_g([], [], [], value=[]))
    assert out3.num_rows == 0 and "motif_d2" in out3.column_names


# --- sample entropy (sampen_kernel) ---------------------------------------------
def test_sampen_kernel_bruteforce_and_edges():
    import math

    from sits_ray.stages.eventops import sampen_kernel

    rng = np.random.default_rng(5)
    # conv 1: random walk (matches at r=2000 plentiful); conv 2: n=2
    # (no m+1 template, B possible only if n >= 3 -> omitted);
    # conv 3: wild jumps (B = 0 -> omitted)
    v1 = np.round(np.cumsum(rng.uniform(-8, 8, 30)) + 100, 2)
    v3 = [0.0, 500.0, 7.0, 341.0, 55.0]
    vals = v1.tolist() + [1.0, 2.0] + v3
    conv = [1] * 30 + [2] * 2 + [3] * 5
    ts = [i * US for i in range(len(vals))]
    out = sampen_kernel(
        _g(conv, ts, list(range(len(vals))), value=vals)
    ).to_pandas()
    assert set(out.conv_id) == {1}

    q = np.floor(v1 * 100.0 + 0.5).astype(np.int64)
    m, r = 2, 2000
    b = a = 0
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            if j + m - 1 < len(q) and i + m - 1 < len(q):
                if max(abs(q[i] - q[j]), abs(q[i + 1] - q[j + 1])) <= r:
                    b += 1
            if j + m < len(q) and i + m < len(q):
                if max(abs(q[i] - q[j]), abs(q[i + 1] - q[j + 1]),
                       abs(q[i + 2] - q[j + 2])) <= r:
                    a += 1
    row = out.iloc[0]
    assert row["b_cnt"] == b and row["a_cnt"] == a
    assert row["sampen"] == -math.log(a / b)

    # B > 0 but A = 0 -> row present, sampen NULL
    v4 = [1.0, 1.0, 80.0, 1.0, 1.0]  # templates (1,2) & (4,5)... m-match only
    out4 = sampen_kernel(
        _g([9] * 5, [i * US for i in range(5)], list(range(5)), value=v4)
    ).to_pandas()
    r4 = out4.iloc[0]
    assert r4["b_cnt"] > 0 and r4["a_cnt"] == 0 and pd.isna(r4["sampen"])

    # empty input keeps the schema
    out5 = sampen_kernel(_g([], [], [], value=[]))
    assert out5.num_rows == 0 and "sampen" in out5.column_names


# --- permutation entropy (perm_entropy_kernel) -----------------------------------
def test_perm_entropy_kernel_bruteforce_and_properties():
    import math

    from sits_ray.stages.eventops import perm_entropy_kernel

    def brute(vals):
        q = np.floor(np.asarray(vals, np.float64) * 100.0 + 0.5).astype(np.int64)
        pats = [
            4 * (q[t] <= q[t + 1]) + 2 * (q[t] <= q[t + 2]) + (q[t + 1] <= q[t + 2])
            for t in range(len(q) - 2)
        ]
        from collections import Counter

        c = Counter(pats)
        nw = len(pats)
        acc = 0.0
        for k in sorted(c):
            p = c[k] / nw
            acc += p * math.log(p)
        return {"n_windows": nw, "n_patterns": len(c), "h": -acc}

    rng = np.random.default_rng(2)
    v1 = np.round(rng.uniform(0, 60, 40), 2).tolist()
    v2 = [5.0] * 10                      # constant: one pattern, h = 0
    v3 = [1.0, 1.0, 2.0, 2.0, 1.0, 1.0]  # tie-rule exercise
    vals = v1 + v2 + v3
    conv = [1] * 40 + [2] * 10 + [3] * 6
    out = perm_entropy_kernel(
        _g(conv, [i * US for i in range(len(vals))],
           list(range(len(vals))), value=vals)
    ).to_pandas().set_index("conv_id")
    for cid, v in [(1, v1), (2, v2), (3, v3)]:
        exp = brute(v)
        row = out.loc[cid]
        assert row["n_windows"] == exp["n_windows"]
        assert row["n_patterns"] == exp["n_patterns"]
        assert row["h"] == exp["h"], (cid, row["h"], exp["h"])
        assert row["h_norm"] == exp["h"] / math.log(6.0)
    assert out.loc[2, "h"] == 0.0 and out.loc[2, "n_patterns"] == 1

    # monotone invariance: exp-rescaling the values preserves every pattern
    v_mono = (np.exp(np.asarray(v1) / 60.0) * 30).round(2).tolist()
    out_m = perm_entropy_kernel(
        _g([1] * 40, [i * US for i in range(40)], list(range(40)),
           value=v_mono)
    ).to_pandas()
    assert out_m.iloc[0]["n_patterns"] == out.loc[1, "n_patterns"]

    # convs shorter than 3 are omitted; empty keeps schema
    out_s = perm_entropy_kernel(
        _g([7, 7], [0, US], [0, 1], value=[1.0, 2.0])
    )
    assert out_s.num_rows == 0
    out_e = perm_entropy_kernel(_g([], [], [], value=[]))
    assert out_e.num_rows == 0 and "h_norm" in out_e.column_names


# --- Markov transition counts (markov_counts_kernel) -----------------------
def test_markov_counts_kernel_bruteforce():
    from collections import Counter

    from sits_ray.stages.eventops import markov_counts_kernel

    # conv 1: a->b->a->a->c; conv 2: single event (no transitions);
    # conv 3: x->x->x (repeated self-transitions)
    conv = [1] * 5 + [2] + [3] * 3
    et = ["a", "b", "a", "a", "c", "z", "x", "x", "x"]
    out = markov_counts_kernel(
        _g(conv, [i * US for i in range(9)], list(range(9)), event_type=et)
    ).to_pandas()

    assert set(out.conv_id) == {1, 3}  # single-event conv 2 emits nothing
    c1 = Counter(zip(et[:4], et[1:5]))
    got1 = {
        (r.t_from, r.t_to): r.c for r in out[out.conv_id == 1].itertuples()
    }
    assert got1 == dict(c1)
    assert (out[out.conv_id == 1].n == 5).all()
    got3 = out[out.conv_id == 3]
    assert len(got3) == 1 and got3.iloc[0]["c"] == 2
    assert got3.iloc[0]["t_from"] == "x" and got3.iloc[0]["t_to"] == "x"
    # rows sorted by (conv, t_from, t_to)
    keys = list(zip(out.conv_id, out.t_from, out.t_to))
    assert keys == sorted(keys)

    out_e = markov_counts_kernel(_g([], [], [], event_type=[]))
    assert out_e.num_rows == 0 and "t_from" in out_e.column_names


# --- Kaplan-Meier conversion survival (km_survival) -------------------------
def test_km_survival_bruteforce_with_censoring(ray_session):
    import ray.data as rd

    from sits_ray.stages.eventops import km_survival

    HR = 3_600 * US
    rows = []

    def ev(uid, t_hr, typ):
        rows.append(
            {"user_id": uid, "ts": np.int64(t_hr * HR), "event_type": typ}
        )

    # u1 converts at +2h; u2 never converts, censored at +2h (tie with a
    # death at the same bucket); u3 converts at +0h (first event is the
    # purchase); u4 never converts, censored at +5h
    ev(1, 0, "view"); ev(1, 2, "purchase"); ev(1, 9, "view")
    ev(2, 0, "view"); ev(2, 2, "click")
    ev(3, 0, "purchase")
    ev(4, 0, "signup"); ev(4, 5, "view")
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = km_survival(rd.from_pandas(df))

    # durations: u1 d@2, u2 c@2, u3 d@0, u4 c@5
    assert out.t_hr.tolist() == [0, 2, 5]
    assert out.n_risk.tolist() == [4, 3, 1]
    assert out.n_events.tolist() == [1, 1, 0]
    assert out.n_censored.tolist() == [0, 1, 1]
    s0 = 1.0 * (3.0 / 4.0)
    s2 = s0 * (2.0 / 3.0)
    s5 = s2 * (1.0 / 1.0)
    assert out.surv.tolist() == [s0, s2, s5]
    # survival only among converted after last death bucket
    assert out.surv.iloc[-1] == s2


def test_nelson_aalen_bruteforce(ray_session):
    import ray.data as rd

    from sits_ray.stages.eventops import nelson_aalen

    HR = 3_600 * US
    rows = []
    # same cohort as the KM test: u1 d@2, u2 c@2, u3 d@0, u4 c@5
    for uid, t_hr, typ in [
        (1, 0, "view"), (1, 2, "purchase"), (1, 9, "view"),
        (2, 0, "view"), (2, 2, "click"),
        (3, 0, "purchase"),
        (4, 0, "signup"), (4, 5, "view"),
    ]:
        rows.append(
            {"user_id": uid, "ts": np.int64(t_hr * HR), "event_type": typ}
        )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = nelson_aalen(rd.from_pandas(df))

    assert out.t_hr.tolist() == [0, 2, 5]
    assert out.n_risk.tolist() == [4, 3, 1]
    assert out.n_events.tolist() == [1, 1, 0]
    assert out.hazard_inc.tolist() == [1.0 / 4.0, 1.0 / 3.0, 0.0]
    h0 = 1.0 / 4.0
    h2 = h0 + 1.0 / 3.0
    assert out.cum_hazard.tolist() == [h0, h2, h2 + 0.0]


# --- Kleinberg two-state burst detection --------------------------------------

def _kb_table(convs):
    """convs: {conv_id: [ts_us,...]} -> sorted event table."""
    rows = []
    for cid, tss in convs.items():
        for j, t in enumerate(tss):
            rows.append((cid, j + 1, t))
    df = pd.DataFrame(rows, columns=["conv_id", "order", "ts"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["part_id"] = 0
    return pa.Table.from_pandas(df, preserve_index=False)


def _kb_scalar(ts_us):
    """Reference: full Viterbi with explicit backtrack."""
    ts = np.asarray(ts_us, dtype=np.int64)
    x = (ts[1:] - ts[:-1]).astype(np.float64) / 1.0e6
    n = len(x)
    span = float(ts[-1] - ts[0]) / 1.0e6
    l0 = n / span
    l1, gam = 2.0 * l0, math.log(float(n))
    INF = float("inf")
    c = [(0.0, INF)]
    back = []
    for xi in x:
        c0, c1 = c[-1]
        p0 = 0 if c0 <= c1 else 1
        n0 = min(c0, c1) + (l0 * xi - math.log(l0))
        stay = c1 <= c0 + gam
        n1 = (c1 if stay else c0 + gam) + (l1 * xi - math.log(l1))
        back.append((p0, 1 if stay else 0))
        c.append((n0, n1))
    c0, c1 = c[-1]
    st = 0 if c0 <= c1 else 1
    cost = min(c0, c1)
    nb = k = 0
    path = []
    for t in range(n - 1, -1, -1):
        path.append(st)
        st = back[t][st]
    path.reverse()
    nb = sum(path)
    k = sum(1 for t in range(n) if path[t] == 1 and (t == 0 or path[t - 1] == 0))
    return n, nb, k, cost


def test_kleinberg_matches_backtracked_viterbi(ray_session):
    from sits_ray.stages.eventops import kleinberg_bursts_kernel

    rng = np.random.default_rng(31)
    convs = {}
    for cid in range(1, 9):
        # mixed regime: slow stretch, dense burst, slow stretch
        slow1 = np.cumsum(rng.integers(50, 200, 10)) * 1_000_000
        burst = slow1[-1] + np.cumsum(rng.integers(1, 6, 12)) * 1_000_000
        slow2 = burst[-1] + np.cumsum(rng.integers(50, 200, 8)) * 1_000_000
        convs[cid] = np.r_[0, slow1, burst, slow2].tolist()
    out = kleinberg_bursts_kernel(_kb_table(convs)).to_pandas() \
        .set_index("conv_id")
    for cid, tss in convs.items():
        n, nb, k, cost = _kb_scalar(tss)
        row = out.loc[cid]
        assert row["n_gaps"] == n
        assert row["burst_gaps"] == nb      # accumulated == backtracked
        assert row["n_bursts"] == k
        assert row["viterbi_cost"] == cost  # bit-exact fold
        assert k >= 1                       # the planted burst is found


def test_kleinberg_uniform_gaps_no_burst(ray_session):
    from sits_ray.stages.eventops import kleinberg_bursts_kernel

    convs = {7: (np.arange(30) * 60_000_000).tolist()}
    out = kleinberg_bursts_kernel(_kb_table(convs)).to_pandas()
    assert out.loc[0, "n_bursts"] == 0
    assert out.loc[0, "burst_gaps"] == 0


def test_kleinberg_degenerate_convs_excluded(ray_session):
    from sits_ray.stages.eventops import kleinberg_bursts_kernel

    convs = {
        1: [5_000_000],                       # single event: no gaps
        2: [9_000_000, 9_000_000, 9_000_000],  # zero span
        3: [0, 1_000_000, 2_000_000, 60_000_000],
    }
    out = kleinberg_bursts_kernel(_kb_table(convs)).to_pandas()
    assert out["conv_id"].tolist() == [3]


def test_decayed_type_volume_dyadic_exactness(ray_session):
    """The dyadic-rational formulation equals the mathematical value
    sum(y * 2^-k) exactly (Fraction cross-check), including the
    120-week clamp."""
    from fractions import Fraction

    import ray.data as rd
    from sits_ray.queries import QUERIES

    # build a tiny events dir? cheaper: replicate the fold directly
    ys = {0: 7, 1: 13, 3: 1, 120: 5, 200: 9}  # week-age -> count (200 clamps)
    clamped = {}
    for k, y in ys.items():
        kk = min(k, 120)
        clamped[kk] = clamped.get(kk, 0) + y
    kmax = max(clamped)
    num = sum(y << (kmax - k) for k, y in clamped.items())
    got = float(num) / float(1 << kmax)
    exact = sum(Fraction(y, 2 ** k) for k, y in clamped.items())
    # the double is the correctly rounded value of the exact rational
    assert got == float(exact)


# --- Markov removal-effect attribution --------------------------------------------

def test_attribution_transitions_kernel_rules(ray_session):
    import pyarrow as pa
    from sits_ray.stages.eventops import attribution_transitions_kernel

    # conv a: view -> click -> purchase -> error (post-purchase dropped)
    # conv b: view -> error (no purchase -> __end__ sink)
    g = pa.table({
        "conv_id": ["a", "a", "a", "a", "b", "b"],
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2], unit="s"),
        "order": [1, 2, 3, 4, 1, 2],
        "event_type": ["view", "click", "purchase", "error",
                       "view", "error"],
    })
    out = attribution_transitions_kernel(g).to_pandas()
    got = {(r["src"], r["dst"]): r["n"] for _, r in out.iterrows()}
    assert got == {
        ("__start__", "view"): 2,
        ("view", "click"): 1,
        ("click", "purchase"): 1,
        ("view", "error"): 1,
        ("error", "__end__"): 1,
    }


def test_markov_attribution_properties(ray_session):
    from sits_ray.queries import QUERIES

    out = QUERIES["markov_attribution"]("/root/testdata/sf0.001")
    # every non-conversion type present, effects within [0, 1],
    # cv_without <= cv_full (removing a channel never helps)
    assert sorted(out["event_type"]) == ["click", "error", "signup", "view"]
    assert ((out["removal_effect"] >= 0) & (out["removal_effect"] <= 1)).all()
    assert (out["cv_without"] <= out["cv_full"] + 1e-12).all()
    assert (out["cv_full"] > 0.5).all()   # most convs purchase eventually
