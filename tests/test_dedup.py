import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.stages.dedup import (
    MinHasher,
    exact_dedup,
    hamming64,
    minhash_dedup,
    ngram_jaccard,
    simhash64,
)


def _docs():
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest to find some tasty food for the winter"
    )
    near = base.replace("tasty", "delicious")  # near-duplicate
    far = "completely different content about satellite image time series analysis"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": near},
        {"doc_id": 2, "text": far},
        {"doc_id": 3, "text": base},  # exact duplicate
        {"doc_id": 4, "text": "short text"},
    ]
    return pd.DataFrame(rows)


def test_ngram_jaccard():
    d = _docs()
    assert ngram_jaccard(d.text[0], d.text[3]) == 1.0
    assert ngram_jaccard(d.text[0], d.text[1]) > 0.7
    assert ngram_jaccard(d.text[0], d.text[2]) < 0.1


def test_minhash_similarity_estimates_jaccard():
    d = _docs()
    mh = MinHasher(n_perm=128)
    s0, s1, s2 = (mh.signature(d.text[i]) for i in (0, 1, 2))
    est01 = (s0 == s1).mean()
    est02 = (s0 == s2).mean()
    assert est01 > 0.6
    assert est02 < 0.2
    # deterministic
    np.testing.assert_array_equal(s0, MinHasher(n_perm=128).signature(d.text[0]))


def test_minhash_dedup_pipeline(ray_session):
    ds = rd.from_pandas(_docs())
    out = minhash_dedup(ds, threshold=0.7).to_pandas()
    pairs = {tuple(sorted((a, b))) for a, b in zip(out.doc_a, out.doc_b)}
    assert (0, 3) in pairs  # exact dup found
    assert (0, 1) in pairs or (1, 3) in pairs  # near dup found
    assert not any(2 in p for p in pairs)  # unrelated doc not paired


def test_exact_dedup(ray_session):
    ds = rd.from_pandas(_docs())
    out = exact_dedup(ds).to_pandas()
    assert len(out) == 4  # 5 docs, one exact dup removed
    assert 3 not in set(out.doc_id)  # first id wins


def test_simhash_near_vs_far():
    d = _docs()
    s0, s1, s2 = simhash64(d.text[0]), simhash64(d.text[1]), simhash64(d.text[2])
    assert hamming64(s0, s1) < hamming64(s0, s2)
    assert simhash64(d.text[0]) == simhash64(d.text[3])
    assert simhash64("") == 0


def test_simhash_stage_matches_scalar(ray_session):
    from sits_ray.stages.dedup import SimHashStage

    d = _docs()
    d.loc[len(d)] = {"doc_id": 5, "text": ""}
    stage = SimHashStage()
    out = stage(d)
    for i, t in zip(d.doc_id, d.text):
        assert int(out.loc[out.doc_id == i, "simhash"].iloc[0]) == simhash64(t), i
    # cross-batch actor cache returns identical results
    out2 = stage(d)
    assert (out2["simhash"].to_numpy() == out["simhash"].to_numpy()).all()


def test_minhash_bucket_cap(ray_session):
    from sits_ray.stages.dedup import minhash_candidates

    # 60 identical docs would emit C(60,2)=1770 pairs per band uncapped
    df = pd.DataFrame({"doc_id": range(60), "text": ["same text here okay"] * 60})
    cand = minhash_candidates(rd.from_pandas(df), max_bucket=10).to_pandas()
    # capped: each band contributes at most C(10,2)=45 distinct pairs
    assert len(cand) <= 45
    assert (cand["doc_a"] < cand["doc_b"]).all()


def test_minhash_dedup_no_driver_corpus(ray_session, tmp_path):
    """Verify path is join-based: works from a parquet-backed corpus and
    returns the same pairs; nothing iterates the full corpus on the driver
    (the round-1 implementation built a {doc_id: text} dict of the whole
    dataset — this pins the rewrite)."""
    import inspect

    from sits_ray.stages import dedup as m

    src = inspect.getsource(m.minhash_dedup)
    assert "iter_batches" not in src  # no full-corpus driver iteration
    d = _docs()
    p = str(tmp_path / "docs.parquet")
    d.to_parquet(p)
    out = minhash_dedup(rd.read_parquet(p), threshold=0.7).to_pandas()
    pairs = {tuple(sorted((a, b))) for a, b in zip(out.doc_a, out.doc_b)}
    assert (0, 3) in pairs and not any(2 in p_ for p_ in pairs)


def test_embedding_near_dups_recall(ray_session):
    """Planted near-identical vectors are found; unrelated ones are not."""
    import ray.data as rd

    from sits_ray.stages.dedup import embedding_near_dups

    rng = np.random.default_rng(13)
    base = rng.normal(size=(120, 16))
    # plant 10 near-dup pairs: id 200+i is a tiny perturbation of id i
    dup = base[:10] + rng.normal(scale=1e-3, size=(10, 16))
    ids = np.concatenate([np.arange(120), np.arange(200, 210)])
    vecs = np.vstack([base, dup])
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ).repartition(4)
    out = embedding_near_dups(ds, threshold=0.999, nlist=4, sample_rows=200).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    want = {(i, 200 + i) for i in range(10)}
    recall = len(found & want) / len(want)
    assert recall >= 0.9
    # no false positives among unrelated random vectors
    fp = [p for p in found - want if p[0] < 120 and p[1] < 120]
    assert not fp
    assert (out["cosine"] >= 0.999).all()


def test_embedding_near_dups_bucket_cap(ray_session):
    import ray.data as rd

    from sits_ray.stages.dedup import embedding_near_dups

    rng = np.random.default_rng(14)
    # all vectors identical direction -> one bucket; cap must kick in
    v = np.abs(rng.normal(size=16)) + 1.0
    vecs = np.stack([v * s for s in rng.uniform(0.5, 2.0, size=50)])
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(50), "embedding": list(vecs)})
    )
    out = embedding_near_dups(
        ds, threshold=0.99, nlist=2, sample_rows=50, max_bucket=10
    ).to_pandas()
    # the dominant bucket must have been capped (ulp noise may split a few
    # vectors into the second bucket, which legitimately stays uncapped)
    capped = out[out["truncated"]]
    assert len(capped) > 0
    # capped-bucket pairs can only involve that bucket's 10 smallest ids
    assert set(capped["id_a"]) | set(capped["id_b"]) <= set(range(11))


def test_minhash_stage_matches_scalar(ray_session):
    """Vectorized batch signatures == scalar MinHasher.signature, and the
    emitted (band_id, band_hash) rows match a scalar re-banding."""
    from sits_ray.stages.dedup import _SHINGLE_R, MinHashStage

    d = _docs()
    d.loc[len(d)] = {"doc_id": 5, "text": ""}
    d.loc[len(d)] = {"doc_id": 6, "text": "one two"}  # < k tokens
    stage = MinHashStage(n_perm=64, bands=16)
    sigs = stage._signatures(d.text)
    for i, t in enumerate(d.text):
        np.testing.assert_array_equal(sigs[i], stage.mh.signature(t)), i
    out = stage(d)
    assert len(out) == len(d) * 16
    r = stage.rows_per_band
    for i, t in zip(d.doc_id, d.text):
        sig = stage.mh.signature(t)
        rows = out[out.doc_id == i].sort_values("band_id")
        want = []
        with np.errstate(over="ignore"):
            for b in range(16):
                chunk = sig[b * r : (b + 1) * r]
                acc = chunk[0] * _SHINGLE_R[0]
                for j in range(1, r):
                    acc = acc ^ (chunk[j] * _SHINGLE_R[j % len(_SHINGLE_R)])
                want.append(int(np.uint64(acc).view(np.int64)))
        assert rows["band_hash"].tolist() == want
    # cross-batch actor cache keeps results identical
    out2 = stage(d)
    assert (out2["band_hash"].to_numpy() == out["band_hash"].to_numpy()).all()


def test_embedding_near_dups_skewed_reblock(ray_session):
    """Skewed bucket distribution (VERDICT r2 next #3): one coarse bucket
    holds ~everything; the sign-bit re-block must bound every pandas group
    near max_bucket (no truncation fires) while planted near-dup recall
    holds."""
    import ray.data as rd

    from sits_ray.stages.dedup import embedding_near_dups, split_bits_for

    # unit: split budget math
    assert split_bits_for({0: 100}, 100) == {}
    assert split_bits_for({0: 101}, 100) == {0: 1}
    assert split_bits_for({0: 900}, 100) == {0: 4}
    assert split_bits_for({0: 10**9}, 100, max_bits=8) == {0: 8}

    rng = np.random.default_rng(21)
    center = rng.normal(size=24) * 3.0
    # one dominant but angularly-diverse cluster (splittable by sign bits)
    base = center + rng.normal(scale=0.5, size=(800, 24))
    dup = base[:20] + rng.normal(scale=1e-4, size=(20, 24))
    ids = np.concatenate([np.arange(800), np.arange(1000, 1020)])
    vecs = np.vstack([base, dup])
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ).repartition(4)
    out = embedding_near_dups(
        ds, threshold=0.999, nlist=2, sample_rows=820, max_bucket=200
    ).to_pandas()
    # bounded groups: the dominant bucket was split, so no cap truncation
    assert len(out) > 0 and not out["truncated"].any()
    found = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    want = {(i, 1000 + i) for i in range(20)}
    recall = len(found & want) / len(want)
    # near-identical pairs almost never straddle a sign hyperplane
    assert recall >= 0.9


def test_auto_nlist_scales():
    from sits_ray.stages.similarity import auto_nlist

    assert auto_nlist(100) == 10
    assert auto_nlist(1_000_000) == 1000
    assert auto_nlist(10) == 4          # floor
    assert auto_nlist(10**9) == 4096    # ceiling


@pytest.mark.parametrize(
    "local_edges,broadcast_nodes",
    [(8_000_000, 4_000_000),  # tier 1: driver-local numpy loop
     (0, 4_000_000),          # tier 2: driver labels, distributed edges
     (0, 0)],                 # tier 3: fully distributed join+groupby
)
def test_connected_components_chain(ray_session, local_edges, broadcast_nodes):
    # chain 1-2, 2-3 plus isolated pair 10-11: components {1,2,3}, {10,11}.
    # All three adaptive tiers must return the identical labeling (the
    # min-label fixed point is unique).
    from sits_ray.stages.dedup import connected_components

    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_a": [2, 2, 10], "doc_b": [1, 3, 11]}
    ))
    out = connected_components(
        pairs, broadcast_nodes=broadcast_nodes, local_edges=local_edges
    ).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["rep_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_and_empty(ray_session):
    from sits_ray.stages.dedup import connected_components

    # a 12-node chain exercises multi-round propagation (diameter 11)
    n = 12
    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_a": list(range(n - 1)), "doc_b": list(range(1, n))}
    ))
    out = connected_components(pairs).to_pandas()
    assert set(out["rep_id"]) == {0} and len(out) == n

    empty = rd.from_pandas(pd.DataFrame({"doc_a": [], "doc_b": []})).filter(
        lambda r: False
    )
    eds = connected_components(empty)
    assert eds.schema().names == ["doc_id", "rep_id"] and eds.count() == 0


def test_poly_minhash_batch_matches_scalar(ray_session):
    """poly_band_rows (vectorized, SQL-replayable mod-2^31-1 path) must
    reproduce the scalar poly_minhash_signature + Horner band fold on
    every edge shape: empty doc, shorter-than-k, exactly-k, long, and
    mixed-case/unicode text (tokenizer is [a-z]+ on lower())."""
    from sits_ray.stages.dedup import (
        _POLY_B,
        _POLY_P,
        poly_band_rows,
        poly_minhash_signature,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "",
        "one",
        "two words",
        "a b c",
        "Ünïcode MiXED case 123 tokens!",
        "repeat repeat repeat repeat repeat",
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    rows = poly_band_rows(df)
    assert len(rows) == len(texts) * 4
    for i, t in enumerate(texts):
        sig = poly_minhash_signature(t)
        expect = []
        for band in range(4):
            acc = 0
            for w in sig[band * 4 : (band + 1) * 4]:
                acc = (acc * _POLY_B + int(w)) % _POLY_P
            expect.append(acc)
        got = rows[rows.doc_id == i].sort_values("band_id")["band_hash"].tolist()
        assert got == expect, f"doc {i}"


def test_poly_minhash_near_dups_collide(ray_session):
    """Near-identical docs must share at least one poly band bucket and
    surface as a band_pairs candidate; unrelated docs must not."""
    from sits_ray.stages.dedup import band_pairs, poly_band_rows

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [base, base + " mu", "totally different words entirely here now"],
        }
    )
    ds = rd.from_pandas(df).map_batches(poly_band_rows, batch_format="pandas")
    pairs = band_pairs(ds).to_pandas()
    keys = set(zip(pairs.doc_a, pairs.doc_b))
    assert (1, 2) in keys
    assert (1, 3) not in keys and (2, 3) not in keys


def test_simhash_poly_dups_recall(ray_session):
    """Near-identical docs (one token changed) must surface within
    Hamming radius; unrelated docs must not pair with them."""
    from sits_ray.stages.dedup import simhash_poly_dups

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    other = ("completely different content about weather patterns and "
             "ocean currents flowing through narrow channels") * 3
    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [base, base.replace("kappa", "kxppa"), other],
        }
    )
    out = simhash_poly_dups(rd.from_pandas(df), radius=3).to_pandas()
    keys = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in keys
    assert (1, 3) not in keys and (2, 3) not in keys
    row = out[(out.doc_a == 1) & (out.doc_b == 2)].iloc[0]
    assert 0 <= row.hamming <= 3 and 1 <= row.n_bands <= 4


# --- SemDeDup -----------------------------------------------------------------
def _semdedup_ref(ids, X, nlist, seed, tau_num=1, tau_den=2, qscale=100.0):
    from sits_ray.stages.similarity import seed_centroids, seq_dots

    C = seed_centroids(nlist, X.shape[1], seed)
    b = np.argmax(seq_dots(X.astype(np.float64), C), axis=1)
    q = np.floor(X.astype(np.float64) * qscale + 0.5).astype(np.int64)
    drop = np.zeros(len(ids), dtype=bool)
    for bk in np.unique(b):
        sel = np.where(b == bk)[0]
        o = sel[np.argsort(ids[sel])]
        G = q[o] @ q[o].T
        na = np.diag(G).copy()
        cond = (G > 0) & (
            tau_den * tau_den * G * G >= tau_num * tau_num * np.outer(na, na)
        )
        drop[o] = np.tril(cond, -1).any(axis=1)
    return dict(zip(ids.tolist(), zip(b.tolist(), drop.tolist())))


@pytest.mark.parametrize("num_partitions", [None, 3])
def test_semdedup_planted_duplicates(ray_session, num_partitions):
    """Planted near-identical groups must collapse to their min-id
    member; the staged pipeline must match the scalar reference
    bit-for-bit (bucket AND drop decision)."""
    from sits_ray.stages.dedup import semdedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, 8))
    X = base.copy()
    # groups of planted semantic dups: tiny jitter keeps cosine ~0.9999
    for grp in ((3, 11, 19), (4, 22)):
        for m in grp[1:]:
            X[m] = X[grp[0]] + rng.standard_normal(8) * 1e-3
    ids = np.arange(100, 130, dtype=np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(X.astype(np.float32))})
    got = (
        semdedup(rd.from_pandas(pdf).repartition(4), nlist=4, seed=7,
                 tau_num=19, tau_den=20, num_partitions=num_partitions)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = _semdedup_ref(ids, X.astype(np.float32), nlist=4, seed=7,
                        tau_num=19, tau_den=20)
    assert len(got) == len(ref)
    for r in got.itertuples():
        assert (int(r.bucket), bool(r.dropped)) == ref[int(r.vec_id)]
    # planted groups land in one cluster (they're near-identical) and
    # keep exactly the min id
    g = got.set_index("vec_id")
    assert not g.loc[103].dropped and g.loc[111].dropped and g.loc[119].dropped
    assert not g.loc[104].dropped and g.loc[122].dropped
    # most non-planted vectors survive at tau=0.95
    assert got.dropped.sum() <= 3 + 2


def test_semdedup_cross_cluster_dups_not_dropped(ray_session):
    """The SemDeDup contract: similarity is only evaluated WITHIN a
    cluster — identical vectors in different clusters both survive."""
    from sits_ray.stages.dedup import semdedup
    from sits_ray.stages.similarity import seed_centroids, seq_dots

    C = seed_centroids(4, 8, seed=7)
    # two vectors equal to two different centroids => different buckets
    X = np.stack([C[0], C[2], C[0] * 0.99]).astype(np.float32)
    ids = np.array([1, 2, 3], dtype=np.int64)
    b = np.argmax(seq_dots(X.astype(np.float64), C), axis=1)
    assert b[0] != b[1] and b[0] == b[2]
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    got = (
        semdedup(rd.from_pandas(pdf), nlist=4, seed=7,
                 tau_num=19, tau_den=20)
        .to_pandas()
        .set_index("vec_id")
    )
    assert not got.loc[1].dropped  # smallest id in its bucket
    assert not got.loc[2].dropped  # alone in its bucket
    assert got.loc[3].dropped      # same bucket as 1, cos ~1, larger id


# --- materialized pair cache ---------------------------------------------------
def test_materialized_pairs_reuse_and_invalidate(ray_session, tmp_path):
    from sits_ray.stages.dedup import materialized_pairs

    calls = []

    def build():
        calls.append(1)
        return rd.from_pandas(
            pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]})
        )

    cdir = str(tmp_path / "pairs_cache")
    fp = {"size": 10, "k": 5}
    a = materialized_pairs(build, cdir, fp).to_pandas()
    b = materialized_pairs(build, cdir, fp).to_pandas()  # cache hit
    assert len(calls) == 1
    pd.testing.assert_frame_equal(
        a.sort_values("doc_a").reset_index(drop=True),
        b.sort_values("doc_a").reset_index(drop=True),
    )
    # changed fingerprint rebuilds
    materialized_pairs(build, cdir, {"size": 11, "k": 5})
    assert len(calls) == 2
    # corrupt fingerprint reads as absent -> rebuild, not crash
    import os
    with open(os.path.join(cdir, "fingerprint.json"), "w") as fh:
        fh.write("{not json")
    materialized_pairs(build, cdir, fp)
    assert len(calls) == 3


def test_materialized_pairs_empty_bypasses_cache(ray_session, tmp_path):
    import os

    from sits_ray.stages.dedup import materialized_pairs

    def build():
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                }
            )
        )

    cdir = str(tmp_path / "empty_cache")
    out = materialized_pairs(build, cdir, {"x": 1})
    assert out.count() == 0
    assert not os.path.exists(os.path.join(cdir, "fingerprint.json"))


# --- edit-distance near-dup -----------------------------------------------------

def test_levenshtein_rows_bruteforce():
    from sits_ray.stages.dedup import levenshtein_rows

    def ref(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return dp[n]

    rng = np.random.default_rng(6)
    pairs = []
    for _ in range(120):
        la, lb = rng.integers(0, 15, size=2)
        pairs.append((
            "".join(rng.choice(list("abcd"), la)),
            "".join(rng.choice(list("abcd"), lb)),
        ))
    pairs += [("kitten", "sitting"), ("", ""), ("x", ""), ("", "y")]
    got = levenshtein_rows([a for a, _ in pairs], [b for _, b in pairs])
    assert [ref(a, b) for a, b in pairs] == got.tolist()


def test_editdist_near_dups_blocking_and_threshold(ray_session):
    import ray.data as rd

    from sits_ray.stages.dedup import editdist_near_dups

    base = "the quick brown fox jumps over the lazy dog and keeps running"
    texts = [
        base,                         # 0 \\ same prefix block,
        base.replace("lazy", "hazy"), # 1 /  distance 1
        base.replace("quick", "xxxxx"),  # 2: different prefix -> no block
        "completely different text here with nothing shared at all",  # 3
    ]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    out = editdist_near_dups(docs, prefix_len=16, max_dist=5).to_pandas()
    assert set(map(tuple, out[["doc_a", "doc_b"]].to_numpy())) == {(0, 1)}
    assert out["dist"].item() == 1
