"""Sampling / balancing operators (SURVEY.md §2.8).

* :func:`stratified_sample` — per-label FRACTION sampling (the reference's
  ``sits_sample``, ``R/sits_sample_functions.R:27-60``): each label keeps
  its own fraction; fractions > 1 oversample by row repetition. Selection
  is deterministic (id modulo) so the SQL oracle can reproduce it exactly.
* :func:`samples_prune` — keep only series of the MODAL length (the
  reference's ``.samples_prune`` / ``.tibble_prune``,
  ``R/api_tibble.R:239-255``): a group-count + tiny-modal semi-join.
* :func:`smote_oversample` / :func:`reduce_imbalance` — SMOTE synthetic
  minority oversampling + deterministic majority undersampling (the
  reference's ``sits_reduce_imbalance``, ``R/sits_reduce_imbalance.R:71``,
  ``R/api_smote.R:1-156``; SMOTE per Chawla et al. 2002).
* :func:`uncertainty_sampling_mindist` — greedy top-k by uncertainty
  subject to a minimum pairwise distance between picks (the reference's
  min-distance constraint, ``R/sits_uncertainty.R:254`` +
  ``R/sits_geo_dist.R`` — embedding distance stands in for geo distance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sits_ray.arrowutil import list_matrix


def stratified_sample(ds, fracs: dict, label_col: str = "lang",
                      id_col: str = "doc_id", mod: int = 100):
    """Per-label fraction sampling, deterministic: a row survives iff
    ``id % mod < round(frac[label] * mod)``; ``frac > 1`` emits
    ``floor(frac)`` full copies plus the fractional remainder."""
    items = sorted(fracs.items(), key=lambda kv: str(kv[0]))
    labels = [k for k, _ in items]
    whole = np.array([int(np.floor(v)) for _, v in items], dtype=np.int64)
    rem_thresh = np.array(
        [int(round((v - np.floor(v)) * mod)) for _, v in items], dtype=np.int64
    )
    lab_arr = pa.array(labels)

    def pick(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[label_col], value_set=lab_arr)
        ids = t[id_col].to_numpy()
        known = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        li = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        reps = np.where(known, whole[li] + (ids % mod < rem_thresh[li]), 0)
        rep_idx = np.repeat(np.arange(t.num_rows), reps)
        return t.take(pa.array(rep_idx, pa.int64()))

    return ds.map_batches(pick, batch_format="pyarrow")


def samples_prune(ds, key_col: str = "user_id"):
    """Keep only groups whose row count equals the MODAL count.

    Two tiny aggregations (per-key counts, then the modal count) and one
    broadcast-filtered pass — the group-count semi-join the reference runs
    before every model fit."""
    import ray
    from ray.data.aggregate import Count

    counts = ds.groupby(key_col).aggregate(Count(alias_name="n")).to_pandas()
    # modal n: most frequent count; ties -> smallest n (deterministic)
    freq = counts.groupby("n").size().reset_index(name="f")
    freq = freq.sort_values(["f", "n"], ascending=[False, True])
    modal_n = int(freq["n"].iloc[0])
    keep = pa.array(counts.loc[counts["n"] == modal_n, key_col].to_numpy())
    keep_ref = ray.put(keep)

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[key_col], value_set=ray.get(keep_ref)))

    return ds.map_batches(filt, batch_format="pyarrow"), modal_n


def smote_oversample(X: np.ndarray, n_new: int, k: int = 5, seed: int = 23
                     ) -> np.ndarray:
    """SMOTE (Chawla et al. 2002; reference ``R/api_smote.R:1-156``):
    each synthetic sample lies on the segment between a minority sample
    and one of its k nearest same-class neighbors. Deterministic."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n == 0 or n_new <= 0:
        return np.empty((0, X.shape[1] if X.ndim == 2 else 0))
    if n == 1:
        return np.repeat(X, n_new, axis=0)
    rng = np.random.default_rng(seed)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    kk = min(k, n - 1)
    nn = np.argsort(d2, axis=1)[:, :kk]  # (n, kk)
    base = rng.integers(0, n, size=n_new)
    pick = nn[base, rng.integers(0, kk, size=n_new)]
    gap = rng.random((n_new, 1))
    return X[base] + gap * (X[pick] - X[base])


def reduce_imbalance(ds, n_samples: int, label_col: str = "label",
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     k: int = 5, seed: int = 23):
    """``sits_reduce_imbalance`` analog: every label ends at exactly
    ``n_samples`` rows — majority labels deterministically undersampled
    (smallest ids win), minority labels topped up with SMOTE synthetics
    (``vec_id`` = -1, ``synthetic`` = true).

    Shape: per-label work happens in a ``groupby(label)`` over the (small)
    samples table — the reference also balances the samples tibble, not
    the cube."""

    def per_label(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        lab = g[label_col].iloc[0]
        if len(g) >= n_samples:
            out = g.head(n_samples).copy()
            out["synthetic"] = False
            return out
        X = np.stack(g[vec_col].to_numpy())
        import zlib

        syn = smote_oversample(
            X, n_samples - len(g), k=k,
            # stable per-label seed (Python's str hash is salted per
            # process — non-reproducible across runs/workers)
            seed=seed + (zlib.crc32(str(lab).encode()) % 1000),
        )
        extra = pd.DataFrame(
            {
                id_col: np.full(len(syn), -1, dtype=np.int64),
                label_col: lab,
                vec_col: list(syn),
            }
        )
        return pd.concat(
            [g.assign(synthetic=False), extra.assign(synthetic=True)],
            ignore_index=True,
        )

    return ds.groupby(label_col).map_groups(per_label, batch_format="pandas")


def _round_half_up(x):
    """Deterministic cross-engine rounding (SQL round / floor(x+.5));
    documented deviation from R's IEC-60559 half-to-even ``round``."""
    return np.floor(np.asarray(x, dtype=np.float64) + 0.5)


def _signif(x, digits: int = 3):
    x = np.asarray(x, dtype=np.float64)
    mag = np.where(x == 0, 0.0, np.floor(np.log10(np.abs(np.where(x == 0, 1, x)))))
    scale = 10.0 ** (digits - 1 - mag)
    return _round_half_up(x * scale) / scale


def sampling_design(label_counts: dict, expected_ua: float = 0.75,
                    alloc_options=(100, 75, 50), std_err: float = 0.01,
                    rare_class_prop: float = 0.1) -> pa.Table:
    """``sits_sampling_design`` (``R/sits_sample_functions.R:312-392``):
    Cochran/Olofsson stratified sample-size design over the classified
    map's per-class areas (row counts here). Per class: area proportion,
    stratum std-dev ``signif(sqrt(ua(1-ua)), 3)``, total
    ``n = round((sum(prop*sd)/std_err)^2)``, then equal / fixed-rare /
    proportional allocations. Driver-side: the design is a
    labels-sized table; the areas come from a distributed groupby."""
    items = sorted(label_counts.items(), key=lambda kv: str(kv[0]))
    labels = [str(k) for k, _ in items]
    n = np.array([v for _, v in items], dtype=np.float64)
    prop = n / n.sum()
    ua = np.full(len(labels), float(expected_ua))
    sd = _signif(np.sqrt(ua * (1.0 - ua)), 3)
    sample_size = float(_round_half_up((np.sum(prop * sd) / std_err) ** 2))
    k = len(labels)
    equal = np.full(k, _round_half_up(sample_size / k))
    rare = prop <= rare_class_prop
    sum_rare = prop[rare].sum()
    cols: dict = {
        "label": pa.array(labels),
        "prop": pa.array(prop),
        "expected_ua": pa.array(ua),
        "std_dev": pa.array(sd),
        "equal": pa.array(equal.astype(np.int64)),
    }
    for al in alloc_options:
        remaining = sample_size - al * int(rare.sum())
        alloc = np.where(
            rare, float(al),
            _round_half_up(prop / (1.0 - sum_rare) * remaining),
        )
        cols[f"alloc_{al}"] = pa.array(alloc.astype(np.int64))
    cols["alloc_prop"] = pa.array(
        _round_half_up(prop * sample_size).astype(np.int64)
    )
    return pa.table(cols)


_HASH_P = 2_147_483_647
_HASH_R = 2_654_435_761 % _HASH_P


def _id_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic multiplicative id hash, mod-first so every product
    fits int64 on both engines (SQL twin: ((id %% p) * r) %% p)."""
    return ((ids.astype(np.int64) % _HASH_P) * _HASH_R) % _HASH_P


def mix_temperature(ds, total: float, alpha: float = 0.5,
                    group_col: str = "source", id_col: str = "doc_id"):
    """Temperature-based corpus mixing (the multilingual/domain
    rebalancing step of LLM training pipelines, e.g. mBERT/XLM-R
    exponential smoothing): group ``i`` with ``n_i`` rows gets a target
    of ``total * n_i^alpha / sum_j n_j^alpha`` rows (capped at ``n_i``),
    flattening the head and boosting the tail as ``alpha -> 0``.

    Scale shape: one bounded count pass (per-batch value_counts partials,
    driver integer sum), then ONE streaming hash-threshold filter — no
    per-group sort, no shuffle; expected kept rows per group = target.
    Selection is the deterministic ``_id_hash`` threshold, and for
    ``alpha = 0.5`` every float op (sqrt, ordered sum fold, mul/div,
    floor) is mirrored exactly by the DuckDB twin
    (queries.mix_temperature_sample) — sqrt is IEEE-correctly-rounded on
    both engines, so thresholds are bit-identical."""
    import math

    from sits_ray.stages.joins import _right_as_table

    def cnt_part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[group_col].value_counts()
        return pd.DataFrame({group_col: vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(dtype=np.int64)})

    ct = _right_as_table(ds.map_batches(cnt_part, batch_format="pandas"))
    counts = (
        pd.DataFrame({group_col: ct[group_col].to_numpy(zero_copy_only=False),
                      "n": ct["n"].to_numpy()})
        .groupby(group_col, as_index=False)["n"].sum()
        .sort_values(group_col).reset_index(drop=True)
    )
    n = counts["n"].to_numpy(dtype=np.int64)
    if alpha == 0.5:
        s = np.sqrt(n.astype(np.float64))  # correctly rounded — SQL sqrt
    else:
        s = np.power(n.astype(np.float64), alpha)
    S = 0.0
    for v in s:  # LEFT fold in group order — the SQL list_reduce contract
        S += float(v)
    thr = {}
    for g, n_i, s_i in zip(counts[group_col], n, s):
        frac = min(1.0, ((total * float(s_i)) / S) / float(n_i))
        thr[g] = np.int64(math.floor(frac * 2147483647.0))
    thr_items = sorted(thr.items(), key=lambda kv: str(kv[0]))
    keys = pa.array([k for k, _ in thr_items])
    tvals = np.array([v for _, v in thr_items], dtype=np.int64)

    def pick(t: pa.Table) -> pa.Table:
        li = pc.index_in(t[group_col], value_set=keys)
        known = pc.is_valid(li).to_numpy(zero_copy_only=False)
        gi = pc.fill_null(li, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        h = _id_hash(t[id_col].to_numpy())
        return t.filter(pa.array(known & (h < tvals[gi])))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sampling(ds, design: pa.Table, alloc: str = "alloc_prop",
                        overhead: float = 1.2, label_col: str = "label",
                        id_col: str = "doc_id"):
    """``sits_stratified_sampling`` (``R/sits_sample_functions.R:398-556``,
    ``src/sampling.cpp``): allocate ``ceil(alloc * overhead)`` concrete
    sample rows per class from the classified map. Selection is the
    deterministic hash-rank order (= the reference's uniform pixel draw,
    made reproducible): per batch keep each label's n smallest hashes
    (candidate volume O(batches * labels * n)), then one tiny
    groupby(label) — group count O(labels) — finishes the exact top-n."""
    import math

    n_by_label = {
        str(l): int(math.ceil(a * overhead))
        for l, a in zip(design["label"].to_pylist(), design[alloc].to_pylist())
    }
    lab_arr = pa.array(sorted(n_by_label))
    n_arr = np.array([n_by_label[str(l)] for l in sorted(n_by_label)], dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        h = _id_hash(ids)
        li = pc.index_in(t[label_col], value_set=lab_arr)
        ok = pc.is_valid(li).to_numpy(zero_copy_only=False)
        li_np = pc.fill_null(li, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(t.num_rows, dtype=bool)
        for j in range(len(n_arr)):
            rows = np.flatnonzero(ok & (li_np == j))
            nj = int(n_arr[j])
            if rows.size > nj:
                # n smallest (h, id) of this batch — candidates only
                order = np.lexsort((ids[rows], h[rows]))[:nj]
                keep[rows[order]] = True
            else:
                keep[rows] = True
        t = t.append_column("_h", pa.array(h))
        return t.filter(pa.array(keep))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        nj = n_by_label.get(str(g[label_col].iloc[0]), 0)
        g = g.sort_values(["_h", id_col]).head(nj)
        return g[[id_col, label_col]]

    cand = ds.map_batches(partial, batch_format="pyarrow")
    return cand.groupby(label_col).map_groups(final, batch_format="pandas")


def topm_by_score(ds, m: int, score_col: str = "entropy",
                  id_col: str = "vec_id") -> pd.DataFrame:
    """Distributed partial top-M by score: per-batch top-M (the
    ``confidence_sampling_topk`` pattern), then one driver merge over the
    O(batches x M) candidate rows — never the corpus (VERDICT r2 "what's
    wrong" #1: the round-2 active-learning pick pulled every scored row to
    the driver)."""

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy()
        ids = t[id_col].to_numpy()
        if ids.size > m:
            sel = np.lexsort((ids, -s))[:m]
            t = t.take(pa.array(np.sort(sel)))
        return t

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        pdf.sort_values([score_col, id_col], ascending=[False, True])
        .head(m)
        .reset_index(drop=True)
    )


def cap_per_group(ds, k: int, group_col: str = "source",
                  id_col: str = "doc_id", rank_col: str = "fp") -> pd.DataFrame:
    """Frequency capping: keep at most ``k`` rows per group, chosen by a
    DETERMINISTIC content-addressed rank (the per-domain / per-source
    document caps of LLM data curation — reproducible across runs and
    cluster sizes, no RNG). Per-batch partial top-k per group (mergeable
    — smallest (rank, id) survive any merge order), then one driver
    merge over the O(batches x groups x k) candidate rows — never the
    corpus. Group cardinality is assumed small (domains/sources); for
    corpus-cardinality groups route through hashagg.part_aggregate."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([group_col, rank_col, id_col])
            .groupby(group_col, sort=False)
            .head(k)
        )

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        pdf.sort_values([group_col, rank_col, id_col])
        .groupby(group_col, sort=False)
        .head(k)
        .reset_index(drop=True)
    )


def weighted_priority_sample(ds, k: int, weight_col: str = "n_chars",
                             id_col: str = "doc_id") -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (the min-wise
    variant of Efraimidis-Spirakis priority sampling): priority =
    content-hash(id) / weight, keep the k SMALLEST — P(selected) grows
    ~linearly with weight, yet the draw is reproducible across runs,
    batch splits and cluster sizes (no RNG state). Per-batch partial
    top-k (mergeable: smallest (priority, id) survive any merge order),
    one driver merge over O(batches x k) candidates — never the corpus.

    Float contract: priority is ONE division of two exact integers
    (hash < 2^31, weight int), so the SQL twin's
    ``cast(fp as double) / cast(w as double)`` is bit-exact; equal
    doubles tie-break by id identically on both sides."""
    from sits_ray.kernels.text import fingerprint_batch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "pri": pd.Series([], dtype="float64"),
                }
            )
        fp = fingerprint_batch(
            [str(v) for v in df[id_col]]
        ).astype(np.float64)
        w = df[weight_col].to_numpy(dtype=np.int64).astype(np.float64)
        out = pd.DataFrame(
            {id_col: df[id_col].to_numpy(dtype=np.int64), "pri": fp / w}
        )
        return out.sort_values(["pri", id_col]).head(k)

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        pdf.sort_values(["pri", id_col]).head(k).reset_index(drop=True)
    )


_HRW_P = (1 << 31) - 1


def hrw_constants(n_shards: int, seed: int = 37):
    """Per-shard affine universal-hash constants (a_s, b_s) — random
    31-bit multipliers mix where small structured constants measurably
    do not (an earlier (2s+1)-multiplier variant left one of 8 shards
    EMPTY on 1000 sequential ids). Shared verbatim as literals by the
    engine and the generated SQL oracle."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _HRW_P, size=n_shards, dtype=np.int64)
    b = rng.integers(0, _HRW_P, size=n_shards, dtype=np.int64)
    return a, b


def rendezvous_assign(ds, n_a: int = 8, n_b: int = 9,
                      id_col: str = "doc_id", seed: int = 37):
    """Rendezvous (highest-random-weight) sharding — the consistent-
    hashing assignment that makes partitioned output RESUMABLE across
    cluster resizes: each id goes to the shard with the highest
    ``score(id, shard)``, so growing from ``n_a`` to ``n_b`` shards only
    moves the ids whose argmax IS a new shard (~1/n_b of them), not a
    full re-mod reshuffle. Emits both assignments plus a ``moved`` flag
    per id as the stability evidence.

    score_s = (a_s * fp + b_s) mod (2^31 - 1) with per-shard random
    31-bit constants (:func:`hrw_constants`) — products stay < 2^62 so
    int64 arithmetic is exact and the SQL twin is literal; ties break to
    the smallest shard (np.argmax first-max == ``row_number() over
    (order by score desc, s)``). Stateless map_batches; no shuffle."""
    from sits_ray.kernels.text import fingerprint_batch

    a, b = hrw_constants(n_b, seed)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "shard_a": pd.Series([], dtype="int64"),
                    "shard_b": pd.Series([], dtype="int64"),
                    "moved": pd.Series([], dtype="bool"),
                }
            )
        fp = fingerprint_batch([str(v) for v in df[id_col]])
        scores = (a[None, :] * fp[:, None] + b[None, :]) % _HRW_P
        sa = np.argmax(scores[:, :n_a], axis=1)
        sb = np.argmax(scores, axis=1)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(dtype=np.int64),
                "shard_a": sa.astype(np.int64),
                "shard_b": sb.astype(np.int64),
                "moved": sa != sb,
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def fetch_rows_by_id(ds, ids, id_col: str = "vec_id") -> pd.DataFrame:
    """Semi-join fetch of a SMALL id set's rows: the ids are broadcast
    once (``ray.put``), every batch filters against them — only matching
    rows ever reach the driver."""
    import ray

    id_arr = pa.array(np.asarray(ids))
    ref = ray.put(id_arr)

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=ray.get(ref)))

    return ds.map_batches(filt, batch_format="pyarrow").to_pandas()


def uncertainty_sampling_mindist(scored_df: pd.DataFrame, vecs: np.ndarray,
                                 k: int, min_dist: float,
                                 score_col: str = "entropy") -> pd.DataFrame:
    """Greedy diverse top-k: walk candidates by descending uncertainty,
    keep one iff its distance to every already-kept pick >= ``min_dist``.
    Runs on the (small) candidate pool the distributed scorer produced."""
    order = scored_df.sort_values(
        [score_col, scored_df.columns[0]], ascending=[False, True]
    ).index.to_numpy()
    picked: list[int] = []
    for i in order:
        v = vecs[i]
        if all(np.linalg.norm(v - vecs[j]) >= min_dist for j in picked):
            picked.append(i)
            if len(picked) >= k:
                break
    return scored_df.loc[picked]
