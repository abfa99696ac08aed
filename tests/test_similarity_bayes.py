import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.kernels.bayes import align_dates_circular, bayes_smooth, bayts_change
from sits_ray.stages.similarity import IVFIndex, brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def vec_df():
    rng = np.random.default_rng(5)
    # 8 well-separated clusters
    centers = rng.normal(0, 1, size=(8, 32)) * 4
    vecs = np.vstack([c + rng.normal(0, 0.3, size=(40, 32)) for c in centers])
    return pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": list(vecs)}
    ), vecs


def test_brute_force_exact(ray_session, vec_df):
    df, vecs = vec_df
    q = vecs[:2]
    got = brute_force_topk(rd.from_pandas(df), q, k=5)
    # oracle: full cosine
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = vn @ qn.T
    for j in range(2):
        exp = set(np.argsort(-sims[:, j])[:5].tolist())
        sub = got[got.query_id == j]
        assert len(sub) == 5
        assert set(sub.vec_id) == exp


def test_ivf_recall_vs_brute(ray_session, vec_df):
    df, vecs = vec_df
    q = vecs[5:8]
    exact = brute_force_topk(rd.from_pandas(df), q, k=10)
    approx = ivf_topk(rd.from_pandas(df), q, k=10, nlist=8, nprobe=3)
    recalls = []
    for j in range(3):
        e = set(exact[exact.query_id == j].vec_id)
        a = set(approx[approx.query_id == j].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8  # clustered data, 3/8 probes


def test_ivf_deterministic(vec_df):
    _, vecs = vec_df
    a = IVFIndex(nlist=4).fit(vecs).centroids
    b = IVFIndex(nlist=4).fit(vecs).centroids
    np.testing.assert_array_equal(a, b)


def test_bayes_smooth_shrinks_noise():
    rng = np.random.default_rng(6)
    clean = np.linspace(0, 1, 60)
    noisy = clean + rng.normal(0, 0.2, 60)
    sm = bayes_smooth(noisy[None, :], window=9, smoothness=0.04)[0]
    assert np.mean((sm - clean) ** 2) < np.mean((noisy - clean) ** 2)
    assert sm.shape == clean.shape


def test_bayts_flags_sustained_change():
    p = np.r_[np.full(10, 0.2), np.full(10, 0.95)]
    post, flagged = bayts_change(p, chi=0.9, consecutive=3)
    assert 10 <= flagged <= 13
    # transient spike does not confirm
    p2 = np.r_[np.full(10, 0.2), [0.95], np.full(10, 0.2)]
    _, f2 = bayts_change(p2, chi=0.9, consecutive=3)
    assert f2 == -1
    assert ((post > 0) & (post < 1)).all()


def test_align_dates_circular():
    v = np.arange(6)
    np.testing.assert_array_equal(align_dates_circular(v, 2), [2, 3, 4, 5, 0, 1])
    np.testing.assert_array_equal(align_dates_circular(v, -1), [5, 0, 1, 2, 3, 4])
    assert align_dates_circular(np.array([]), 3).size == 0


def test_ivf_probe_prunes_read(ray_session, vec_df, tmp_path):
    """The materialized index reads ONLY the probed bucket partitions."""
    import os

    from sits_ray.stages.similarity import ivf_build, ivf_probe_paths, ivf_query

    df, vecs = vec_df
    idx_dir = str(tmp_path / "ivf")
    ivf_build(rd.from_pandas(df), idx_dir, nlist=8, sample_rows=256)
    # every bucket dir exists on disk
    built = {d for d in os.listdir(os.path.join(idx_dir, "vectors")) if d.startswith("bucket=")}
    assert len(built) >= 4
    q = vecs[:2]
    _, probes, buckets, paths = ivf_probe_paths(idx_dir, q, nprobe=2)
    assert len(buckets) <= 2 * 2  # at most nprobe buckets per query
    assert len(paths) < len(built)  # strictly fewer partitions than exist
    for p in paths:
        assert os.path.basename(os.path.dirname(p)) in built
    out = ivf_query(idx_dir, q, k=5, nprobe=2)
    assert set(out["query_id"]) == {0, 1}
    assert len(out) == 10


def test_ivf_index_rebuilds_on_changed_data(ray_session, tmp_path):
    """Stale-index guard: same index_dir + different data must rebuild,
    not serve old neighbors (round-2 review finding)."""
    import ray.data as rd

    from sits_ray.stages.similarity import ivf_topk

    rng = np.random.default_rng(5)
    d = 8

    def mk(ids):
        return rd.from_pandas(
            pd.DataFrame(
                {"vec_id": ids, "embedding": list(rng.normal(size=(len(ids), d)))}
            )
        )

    idx = str(tmp_path / "ivf")
    ds1 = mk(np.arange(100))
    q = np.asarray(ds1.take(1)[0]["embedding"], dtype=np.float64)[None, :]
    r1 = ivf_topk(ds1, q, k=5, nlist=4, nprobe=4, index_dir=idx)
    assert set(r1["vec_id"]) <= set(range(100))

    ds2 = mk(np.arange(1000, 1100))  # same size, different content
    r2 = ivf_topk(ds2, q, k=5, nlist=4, nprobe=4, index_dir=idx)
    assert set(r2["vec_id"]) <= set(range(1000, 1100)), "stale index served"

    # unchanged data reuses the index (fingerprint match, no rebuild)
    import os

    mtime = os.path.getmtime(os.path.join(idx, "centroids.npy"))
    ivf_topk(ds2, q, k=5, nlist=4, nprobe=4, index_dir=idx)
    assert os.path.getmtime(os.path.join(idx, "centroids.npy")) == mtime


def test_hyperplane_buckets_deterministic_and_sequential():
    from sits_ray.stages.similarity import hyperplane_buckets

    rng = np.random.default_rng(3)
    m = rng.normal(size=(20, 16))
    planes = rng.normal(size=(4, 16))
    b1 = hyperplane_buckets(m, planes)
    b2 = hyperplane_buckets(m.copy(), planes.copy())
    assert (b1 == b2).all() and b1.min() >= 0 and b1.max() < 16
    # sequential accumulation twin: explicit left-assoc python sum
    i, r = 2, 7
    acc = 0.0
    for j in range(16):
        acc = acc + m[r, j] * planes[i, j]
    assert bool(acc > 0.0) == bool(b1[r] >> i & 1)


def test_lsh_topk_recall_vs_brute(ray_session, vec_df):
    from sits_ray.stages.similarity import lsh_topk

    df, vecs = vec_df
    ds = rd.from_pandas(df)
    # same-cluster neighbors dominate cosine; LSH with few bits keeps
    # most of the true top-k inside the query's bucket
    planes_bits = 4
    got = lsh_topk(ds, query_ids=(0, 40, 80), k=5, nbits=planes_bits, seed=29, dim=32)
    assert set(got.columns) == {"query_id", "vec_id"}
    brute = brute_force_topk(ds, vecs[[0, 40, 80]], k=6)
    recalls = []
    for qi, qid in enumerate((0, 40, 80)):
        mine = set(got.loc[got["query_id"] == qid, "vec_id"])
        truth = set(
            brute.loc[brute["query_id"] == qi, "vec_id"]
        ) - {qid}
        if mine:
            recalls.append(len(mine & truth) / min(len(truth), 5))
    assert recalls and np.mean(recalls) >= 0.5


def test_ivf_seeded_recall_and_reuse(ray_session, vec_df, tmp_path):
    """Seeded-quantizer IVF (SQL-exact gate path): sane recall on
    clustered data, deterministic across runs, and fingerprint-gated
    index reuse (second call must not rebuild)."""
    import os

    from sits_ray.stages.similarity import brute_force_topk, ivf_topk_seeded

    df, vecs = vec_df
    q = vecs[5:8]
    idx = str(tmp_path / "ivfs")
    exact = brute_force_topk(rd.from_pandas(df), q, k=10)
    got = ivf_topk_seeded(rd.from_pandas(df), q, k=10, nlist=8, nprobe=4,
                          index_dir=idx)
    assert list(got.columns) == ["query_id", "vec_id"]
    recalls = []
    for j in range(3):
        e = set(exact[exact.query_id == j].vec_id)
        a = set(got[got.query_id == j].vec_id)
        assert len(a) == 10
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # random directions, 4/8 probes
    mtime = os.path.getmtime(os.path.join(idx, "fingerprint.json"))
    again = ivf_topk_seeded(rd.from_pandas(df), q, k=10, nlist=8, nprobe=4,
                            index_dir=idx)
    assert os.path.getmtime(os.path.join(idx, "fingerprint.json")) == mtime
    pd.testing.assert_frame_equal(got, again)


def test_topk_tie_aware_matches_full_sort():
    """The pruned tie-slice top-k must equal a full (sim desc, id asc)
    sort on tie-heavy data — including all-tied and kk >= m edges."""
    from sits_ray.stages.similarity import _topk_tie_aware

    rng = np.random.default_rng(3)
    for _ in range(100):
        m = int(rng.integers(1, 40))
        kk = int(min(rng.integers(1, 10), m))
        sims = rng.integers(0, 3, size=m).astype(np.float64)
        ids = rng.permutation(m).astype(np.int64)
        got = _topk_tie_aware(sims, ids, kk)
        ref = np.lexsort((ids, -sims))[:kk]
        assert (ids[got] == ids[ref]).all()
    # all-tied: smallest kk ids win
    sims = np.zeros(7)
    ids = np.array([5, 2, 9, 1, 7, 3, 8], dtype=np.int64)
    assert list(ids[_topk_tie_aware(sims, ids, 3)]) == [1, 2, 3]


def test_pq_encode_codebook_identity():
    """Each codebook vector must encode to its own code in every subspace
    (distance 0 is the unique minimum to itself)."""
    from sits_ray.stages.similarity import pq_encode_codes, quantize_i64

    rng = np.random.default_rng(3)
    cb = quantize_i64(rng.normal(0, 1, size=(16, 32)))
    codes = pq_encode_codes(cb, cb, n_subs=4)
    # identity unless two codewords tie exactly on a subvector (they
    # don't, for continuous random draws)
    assert (codes == np.arange(16)[:, None]).all()


def test_pq_d2_matches_naive():
    from sits_ray.stages.similarity import _pq_d2, quantize_i64

    rng = np.random.default_rng(4)
    m = quantize_i64(rng.normal(0, 1, size=(10, 32)))
    cb = quantize_i64(rng.normal(0, 1, size=(8, 32)))
    d2 = _pq_d2(m, cb, n_subs=4)
    ms = m.reshape(10, 4, 8)
    cs = cb.reshape(8, 4, 8)
    naive = ((ms[:, None, :, :] - cs[None, :, :, :]) ** 2).sum(axis=3)
    assert (d2 == naive.transpose(0, 2, 1)).all()


def test_pq_ann_matches_naive_pipeline(ray_session, vec_df):
    """The distributed encode + ADC + partial-top-k path must equal a
    naive single-process PQ computed straight from the definition
    (quantize -> per-subspace argmin codes -> LUT sums -> (adist, id)
    rank). Integer arithmetic end to end, so equality is exact."""
    from sits_ray.stages.similarity import (
        _pq_d2,
        pq_ann_topk,
        pq_encode_codes,
        quantize_i64,
    )

    df, vecs = vec_df
    got = pq_ann_topk(rd.from_pandas(df), query_ids=(0, 1), k=5,
                      ksub=16, n_subs=4)
    xi = quantize_i64(vecs)
    cb = xi[:16]
    codes = pq_encode_codes(xi, cb, n_subs=4)
    lut = _pq_d2(xi[:2], cb, n_subs=4)
    for j, qid in enumerate((0, 1)):
        ad = lut[j][np.arange(4)[None, :], codes].sum(axis=1)
        order = np.lexsort((np.arange(len(vecs)), ad))
        order = order[order != qid][:5]
        sub = got[got.query_id == qid].reset_index(drop=True)
        assert sub.vec_id.tolist() == order.tolist()
        assert sub.adist.tolist() == ad[order].tolist()


def test_pq_exact_duplicate_attains_min_adist(ray_session):
    """A planted exact duplicate of the query encodes to the query's own
    codes, so it attains the minimum possible ADC distance (the query's
    reconstruction error) and must appear in the top-k."""
    from sits_ray.stages.similarity import pq_ann_topk

    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 1, size=(60, 32))
    vecs[40] = vecs[20]  # duplicate of query 20
    df = pd.DataFrame({"vec_id": np.arange(60), "embedding": list(vecs)})
    got = pq_ann_topk(rd.from_pandas(df), query_ids=(20,), k=3,
                      ksub=16, n_subs=4)
    sub = got[got.query_id == 20]
    assert 40 in set(sub.vec_id)
    assert int(sub[sub.vec_id == 40].adist.iloc[0]) == int(sub.adist.min())


def test_pq_build_query_matches_inline(ray_session, vec_df, tmp_path):
    """The materialized codes path (pq_build -> pq_query over the thin
    codes table) must return exactly what the inline pq_ann_topk does,
    and the index directory must hold ONLY codes (8 small ints/vector) —
    no raw vectors."""
    import glob
    import os

    import pyarrow.parquet as papq

    from sits_ray.stages.similarity import pq_ann_topk, pq_build, pq_query

    df, vecs = vec_df
    idx = str(tmp_path / "pqidx")
    pq_build(rd.from_pandas(df), idx, ksub=16, n_subs=4)
    got = pq_query(idx, vecs[0], k=5, n_subs=4, exclude_ids=(0,))
    exp = pq_ann_topk(rd.from_pandas(df), query_ids=(0,), k=5,
                      ksub=16, n_subs=4)
    assert got.vec_id.tolist() == exp.vec_id.tolist()
    assert got.adist.tolist() == exp.adist.tolist()
    # thin layout: codes files carry vec_id + c0..c3 only
    files = glob.glob(os.path.join(idx, "codes", "*.parquet"))
    assert files
    schema = papq.read_schema(files[0])
    assert set(schema.names) == {"vec_id", "c0", "c1", "c2", "c3"}


def test_ivfpq_pruned_read_reuse_and_naive_parity(ray_session, vec_df, tmp_path):
    """IVF-PQ: (a) equals the naive composition computed from the
    definition (probe seeded buckets, ADC over codes of probed buckets
    only), (b) the codes table is bucket-partitioned on disk with more
    buckets than a query probes, (c) a second call reuses the index."""
    import os

    from sits_ray.stages.similarity import (
        _pq_d2,
        ivfpq_ann_topk,
        pq_encode_codes,
        quantize_i64,
        seed_centroids,
        seq_dots,
    )

    df, vecs = vec_df
    idx = str(tmp_path / "ivfpq")
    got = ivfpq_ann_topk(rd.from_pandas(df), query_ids=(0, 40), k=5,
                         nlist=8, nprobe=2, ksub=16, n_subs=4, seed=11,
                         index_dir=idx)
    # (a) naive single-process composition
    C = seed_centroids(8, 32, 11)
    buckets = np.argmax(seq_dots(vecs, C), axis=1)
    xi = quantize_i64(vecs)
    cb = xi[:16]
    codes = pq_encode_codes(xi, cb, n_subs=4)
    lut = _pq_d2(xi[[0, 40]], cb, n_subs=4)
    for j, qid in enumerate((0, 40)):
        probe = np.argsort(-seq_dots(vecs[qid][None, :], C)[0],
                           kind="stable")[:2]
        in_probe = np.isin(buckets, probe) & (np.arange(len(vecs)) != qid)
        cand = np.flatnonzero(in_probe)
        ad = lut[j][np.arange(4)[None, :], codes[cand]].sum(axis=1)
        order = np.lexsort((cand, ad))[:5]
        sub = got[got.query_id == qid].reset_index(drop=True)
        assert sub.vec_id.tolist() == cand[order].tolist()
        assert sub.adist.tolist() == ad[order].tolist()
    # (b) partitioned layout, probes strictly fewer than built buckets
    built = {d for d in os.listdir(os.path.join(idx, "codes"))
             if d.startswith("bucket=")}
    assert len(built) > 2
    # (c) fingerprint-gated reuse
    mtime = os.path.getmtime(os.path.join(idx, "fingerprint.json"))
    ivfpq_ann_topk(rd.from_pandas(df), query_ids=(0, 40), k=5,
                   nlist=8, nprobe=2, ksub=16, n_subs=4, seed=11,
                   index_dir=idx)
    assert os.path.getmtime(os.path.join(idx, "fingerprint.json")) == mtime


def test_pq_trained_codebook_reduces_quantization_error(ray_session, vec_df, tmp_path):
    """pq_train_codebooks (per-subspace integer Lloyd) must cut total
    reconstruction error vs the first-k-vectors init on clustered data,
    be deterministic, and slot into pq_build/pq_query unchanged."""
    from sits_ray.stages.similarity import (
        _pq_d2,
        pq_build,
        pq_encode_codes,
        pq_query,
        pq_train_codebooks,
        quantize_i64,
    )

    df, vecs = vec_df
    xi = quantize_i64(vecs)
    cb0 = xi[:16].copy()

    def total_err(cb):
        d2 = _pq_d2(xi, cb, 4)
        return int(d2.min(axis=2).sum())

    ds = rd.from_pandas(df)
    cb1 = pq_train_codebooks(ds, ksub=16, n_subs=4, iters=3)
    cb1b = pq_train_codebooks(ds, ksub=16, n_subs=4, iters=3)
    assert (cb1 == cb1b).all()  # deterministic
    assert total_err(cb1) < total_err(cb0)  # Lloyd improves the init
    # trained codebook flows through the materialized path
    idx = str(tmp_path / "pqt")
    built = pq_build(ds, idx, ksub=16, n_subs=4, train_iters=3)
    assert (built == cb1).all()
    got = pq_query(idx, vecs[0], k=5, n_subs=4, exclude_ids=(0,))
    codes = pq_encode_codes(xi, cb1, 4)
    lut = _pq_d2(xi[:1], cb1, 4)
    ad = lut[0][np.arange(4)[None, :], codes].sum(axis=1)
    order = np.lexsort((np.arange(len(vecs)), ad))
    order = order[order != 0][:5]
    assert got.vec_id.tolist() == order.tolist()
    assert got.adist.tolist() == ad[order].tolist()


def test_pq_torn_build_is_invisible(ray_session, vec_df, tmp_path):
    """A leftover .building staging dir (crash mid-build) must be ignored
    and cleaned by the next build — the index at the published path stays
    whole (the ivf_build atomic-publish contract, shared by pq_build)."""
    import os

    from sits_ray.stages.similarity import pq_build, pq_query

    df, vecs = vec_df
    idx = str(tmp_path / "pq")
    # simulate a torn earlier build
    torn = idx + ".building"
    os.makedirs(os.path.join(torn, "codes"), exist_ok=True)
    with open(os.path.join(torn, "codes", "part-0.parquet"), "wb") as fh:
        fh.write(b"garbage")
    pq_build(rd.from_pandas(df), idx, ksub=16, n_subs=4)
    assert not os.path.exists(torn)  # staging consumed/replaced
    out = pq_query(idx, vecs[0], k=3, n_subs=4, exclude_ids=(0,))
    assert len(out) == 3


def test_hard_negative_topk_bruteforce(ray_session):
    import ray.data as rd

    from sits_ray.stages.similarity import hard_negative_topk, quantize_i64

    rng = np.random.default_rng(7)
    n, dim = 40, 8
    m = rng.normal(size=(n, dim)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int64)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [row.tolist() for row in m],
         "label": labels}
    )
    # force multiple blocks so the partial top-k merge path runs
    ds = rd.from_pandas([df.iloc[:13], df.iloc[13:26], df.iloc[26:]])
    out = hard_negative_topk(ds, n_anchors=5, k=3)

    q = quantize_i64(m.astype(np.float64))
    dots = q @ q.T
    for a in range(5):
        cand = [(int(-dots[a, j]), j) for j in range(n) if labels[j] != labels[a]]
        want = [j for _, j in sorted(cand)[:3]]
        got = out[out.anchor_id == a].sort_values("rnk")
        assert got.neg_id.tolist() == want
        assert got.dot_q.tolist() == [int(dots[a, j]) for j in want]
        assert got.rnk.tolist() == [1, 2, 3]
    # same-label rows never appear
    lab_of = dict(zip(df.vec_id, df.label))
    for r in out.itertuples():
        assert lab_of[r.neg_id] != lab_of[r.anchor_id]


# --- Johnson-Lindenstrauss sign projection -------------------------------------

def test_jl_projection_exact_and_distortion(ray_session):
    import ray.data as rd
    from sits_ray.stages.similarity import jl_project, jl_sign_matrix

    rng = np.random.default_rng(21)
    vecs = rng.normal(0, 1, size=(40, 64)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": list(vecs)}))
    out = jl_project(ds).to_pandas().sort_values("vec_id")
    q = np.floor(vecs.astype(np.float64) * 10000.0 + 0.5).astype(np.int64)
    s = jl_sign_matrix()
    assert s.shape == (64, 16) and set(np.unique(s)) == {-1, 1}
    y = np.stack(out["proj"].to_numpy()).astype(np.int64)
    assert (y == q @ s).all()                    # exact integer matmul
    # JL guarantee in expectation: mean pairwise distortion ~ 1
    ratios = []
    for a in range(0, 40, 2):
        d2o = int(((q[a] - q[a + 1]) ** 2).sum())
        d2p = int(((y[a] - y[a + 1]) ** 2).sum())
        ratios.append(d2p / (16 * d2o))
    m = float(np.mean(ratios))
    assert 0.7 < m < 1.3
    assert all(0.05 < r < 4.0 for r in ratios)  # chi2_16/16 tails


def test_jl_sign_matrix_balanced():
    from sits_ray.stages.similarity import jl_sign_matrix

    s = jl_sign_matrix()
    # parity hash should be near-balanced over the 1024 cells
    frac = (s == 1).mean()
    assert 0.4 < frac < 0.6
