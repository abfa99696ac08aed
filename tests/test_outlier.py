"""HBOS corpus-level outlier scoring (stages/outlier.py)."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from sits_ray.stages.outlier import hbos_outliers

_US_PER_HOUR = 3_600_000_000


def _events(values, ts_us, ids=None):
    values = np.asarray(values, dtype=np.float64)
    ts_us = np.asarray(ts_us, dtype=np.int64)
    ids = (np.arange(1, len(values) + 1, dtype=np.int64)
           if ids is None else np.asarray(ids, dtype=np.int64))
    return rd.from_pandas(pd.DataFrame(
        {"event_id": ids, "value": values,
         "ts": pd.to_datetime(ts_us, unit="us")}))


def _scalar_hbos(values, ts_us, k=20):
    vbin = np.floor(np.asarray(values) / 10.0).astype(np.int64)
    hour = (np.asarray(ts_us, dtype=np.int64) // _US_PER_HOUR) % 24
    cv = pd.Series(vbin).value_counts()
    ch = pd.Series(hour).value_counts()
    mv, mh = int(cv.max()), int(ch.max())
    score = np.array(
        [math.log(mv / int(cv[b])) + math.log(mh / int(ch[h]))
         for b, h in zip(vbin, hour)])
    df = pd.DataFrame({"event_id": np.arange(1, len(score) + 1),
                       "vbin": vbin, "hour": hour, "score": score})
    return (df.sort_values(["score", "event_id"],
                           ascending=[False, True])
              .head(k).reset_index(drop=True))


def test_hbos_matches_scalar_twin_bit_exact(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(50, 15, 800)
    ts = rng.integers(0, 30 * 24, 800) * _US_PER_HOUR + rng.integers(
        0, _US_PER_HOUR, 800)
    out = hbos_outliers(_events(vals, ts))
    exp = _scalar_hbos(vals, ts)
    pd.testing.assert_frame_equal(
        out.astype({"event_id": np.int64, "vbin": np.int64,
                    "hour": np.int64}), exp)


def test_hbos_planted_outlier_ranks_first(ray_session):
    # 500 events at value~50 in business hours; one event at value 999
    # at 3am must rank first (rare bin on BOTH features)
    vals = [50.0] * 500 + [999.0]
    ts = [(10 + i % 8) * _US_PER_HOUR + i for i in range(500)]
    ts.append(3 * _US_PER_HOUR)
    out = hbos_outliers(_events(vals, ts))
    assert out.loc[0, "event_id"] == 501
    # value bin: 500 vs 1; hour bin: busiest of the 8 business hours
    # (hours 10..16 get 63 events, hour 17 gets 59) vs 1
    assert out.loc[0, "score"] == math.log(500.0) + math.log(63.0)


def test_hbos_uniform_corpus_scores_zero(ray_session):
    # every row in the same bin on both features -> all scores ln(1)=0
    vals = [5.0] * 64
    ts = [2 * _US_PER_HOUR + i for i in range(64)]
    out = hbos_outliers(_events(vals, ts), k=10)
    assert (out["score"] == 0.0).all()
    # ties broken by event_id ascending
    assert out["event_id"].tolist() == list(range(1, 11))


def test_hbos_batching_invariance(ray_session):
    rng = np.random.default_rng(13)
    vals = rng.exponential(30, 600)
    ts = rng.integers(0, 7 * 24, 600) * _US_PER_HOUR
    one = hbos_outliers(_events(vals, ts))
    many = hbos_outliers(_events(vals, ts).repartition(17))
    pd.testing.assert_frame_equal(one, many)


# --- Benford first-digit audit -----------------------------------------------

def test_benford_matches_scalar_twin(ray_session):
    from sits_ray.stages.outlier import benford_digits

    rng = np.random.default_rng(21)
    # log-uniform values follow Benford closely
    vals = np.exp(rng.uniform(0, 12, 2000))
    ds = rd.from_pandas(pd.DataFrame({"value": vals}))
    out = benford_digits(ds)
    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    cents = cents[cents > 0]
    first = pd.Series(cents).astype(str).str[0].astype(int)
    cnt = np.bincount(first, minlength=10)[1:10]
    n = int(cnt.sum())
    for d in range(1, 10):
        e = math.log(1.0 + 1.0 / d) / math.log(10.0)
        diff = int(cnt[d - 1]) - n * e
        row = out.loc[out["digit"] == d]
        assert row["n_obs"].item() == int(cnt[d - 1])
        assert row["contrib"].item() == diff * diff / (n * e)  # bit-exact
    # log-uniform data passes the test: chi2(8 dof, 0.001) ~ 26.1
    assert out["contrib"].sum() < 26.1


def test_benford_flags_fabricated_uniform(ray_session):
    from sits_ray.stages.outlier import benford_digits

    # uniform [100, 1000) cents: every first digit equally likely ->
    # gross Benford violation, huge chi2
    rng = np.random.default_rng(4)
    vals = rng.uniform(1.0, 10.0, 2000)
    out = benford_digits(rd.from_pandas(pd.DataFrame({"value": vals})))
    assert out["contrib"].sum() > 100.0


def test_benford_excludes_nonpositive_and_batches(ray_session):
    from sits_ray.stages.outlier import benford_digits

    vals = np.r_[[-5.0, 0.0, 0.001], np.exp(np.linspace(0, 9, 400))]
    ds = rd.from_pandas(pd.DataFrame({"value": vals}))
    out = benford_digits(ds)
    # -5.0, 0.0 and 0.001 (cents<=0) are excluded
    assert out["n_obs"].sum() == 400
    many = benford_digits(
        rd.from_pandas(pd.DataFrame({"value": vals})).repartition(11))
    pd.testing.assert_frame_equal(out, many)


# --- Local Outlier Factor -----------------------------------------------------

def _emb_ds(vecs):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
    }))


def test_lof_flags_planted_outlier(ray_session):
    from sits_ray.stages.outlier import lof_embeddings

    rng = np.random.default_rng(11)
    # a tight cluster + one far-away point
    cluster = rng.normal(0.0, 0.05, size=(30, 8))
    outlier = np.full((1, 8), 3.0)
    out = lof_embeddings(_emb_ds(np.vstack([cluster, outlier])), k=5)
    lof = out.set_index("vec_id")["lof"]
    assert lof[30] == lof.max()
    assert lof[30] > 2.0                      # far point: much sparser
    assert (lof.drop(30) < lof[30] / 2).all()  # clear separation


def test_lof_uniform_density_near_one(ray_session):
    from sits_ray.stages.outlier import lof_embeddings

    # regular grid: every interior point's density matches its neighbors
    xs, ys = np.meshgrid(np.arange(6, dtype=float), np.arange(6, dtype=float))
    grid = np.c_[xs.ravel(), ys.ravel()]
    out = lof_embeddings(_emb_ds(grid), k=5)
    assert ((out["lof"] > 0.6) & (out["lof"] < 1.6)).all()


def test_lof_matches_scalar_brute(ray_session):
    from sits_ray.stages.outlier import lof_embeddings

    rng = np.random.default_rng(5)
    vecs = rng.normal(0, 1, size=(40, 4))
    k = 5
    out = lof_embeddings(_emb_ds(vecs), k=k).set_index("vec_id")
    q = np.floor(vecs * 10000.0 + 0.5).astype(np.int64)
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    nbr = {}
    for a in range(40):
        sel = np.lexsort((np.arange(40), d2[a]))[:k]
        nbr[a] = sel
    kdist = {a: int(d2[a][nbr[a]].max()) for a in range(40)}
    s = {a: sum(max(kdist[int(b)], int(d2[a][b])) for b in nbr[a])
         for a in range(40)}
    for a in range(40):
        acc = 0.0
        for b in nbr[a]:
            acc = acc + float(s[a]) / float(s[int(b)])
        assert out.loc[a, "lof"] == acc / float(k)   # bit-exact
        assert out.loc[a, "kdist"] == kdist[a]
        assert out.loc[a, "s_reach"] == s[a]


def test_lof_batching_invariance(ray_session):
    from sits_ray.stages.outlier import lof_embeddings

    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 1, size=(60, 6))
    one = lof_embeddings(_emb_ds(vecs), k=5)
    many = lof_embeddings(_emb_ds(vecs).repartition(7), k=5)
    pd.testing.assert_frame_equal(one.reset_index(drop=True),
                                  many.reset_index(drop=True))
