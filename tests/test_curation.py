"""Curation operators: chunk-level boilerplate removal, Bloom
decontamination, MOSS winnowing (stages/curation.py). Each stage is
pinned against a brute-force scalar twin on structured synthetic docs;
the DuckDB oracles certify them again in the gate."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from sits_ray.stages.curation import (
    _P,
    _bloom_positions,
    bloom_constants,
    bloom_decontaminate,
    boilerplate_chunks,
    winnow_fingerprints,
    winnow_scalar,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _corpus(n=40, seed=7, planted_every=4, plant_tail=False):
    rng = np.random.default_rng(seed)
    shared = " ".join(rng.choice(VOCAB, 10))
    docs = []
    for i in range(n):
        body = " ".join(rng.choice(VOCAB, int(rng.integers(5, 40))))
        if planted_every and i % planted_every == 0:
            body = (body + " " + shared) if plant_tail else (shared + " " + body)
        docs.append(body)
    return pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "text": docs}
    )


def _ds(pdf, parts=5):
    import ray.data as rd

    return rd.from_pandas(pdf).repartition(parts)


def _brute_boiler(pdf, w=10, min_docs=2):
    rows, cnt = {}, Counter()
    for d, t in zip(pdf.doc_id, pdf.text):
        ws = re.findall(r"[a-z]+", t.lower())
        occ = Counter(
            " ".join(ws[i : i + w]) for i in range(0, len(ws) - w + 1, w)
        )
        rows[d] = occ
        for c in occ:
            cnt[c] += 1
    out = []
    for d, occ in rows.items():
        if not occ:
            continue
        nl = sum(occ.values())
        nb = sum(o for c, o in occ.items() if cnt[c] >= min_docs)
        kept = sum(o * len(c) for c, o in occ.items() if cnt[c] < min_docs)
        out.append((d, nl, nb, kept, nb / nl))
    return (
        pd.DataFrame(
            out,
            columns=["doc_id", "n_chunks", "n_boiler", "kept_chars",
                     "boiler_frac"],
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_boilerplate_chunks_matches_brute_force(ray_session):
    pdf = _corpus()
    got = (
        boilerplate_chunks(_ds(pdf), w=10, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_boiler(pdf)
    assert got.astype(exp.dtypes.to_dict()).equals(exp)
    assert (got["n_boiler"] > 0).sum() >= 2  # planted chunk detected


def test_boilerplate_within_doc_repeat_and_short_docs(ray_session):
    # doc 0 repeats the SAME 10-token chunk twice (occ=2, but n_docs=1 ->
    # not boilerplate); doc 2 shares a chunk with doc 0; doc 3 is too
    # short for any chunk and must be absent from the output
    c1 = " ".join(VOCAB[:8] + VOCAB[:2])
    c2 = " ".join(reversed(VOCAB + VOCAB[:2]))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [c1 + " " + c1, c2, c1 + " " + c2, "too short"],
        }
    )
    got = (
        boilerplate_chunks(_ds(pdf, parts=2), w=10, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_boiler(pdf)
    assert got.astype(exp.dtypes.to_dict()).equals(exp)
    assert set(got["doc_id"]) == {0, 1, 2}
    r0 = got.set_index("doc_id").loc[0]
    assert r0["n_chunks"] == 2 and r0["n_boiler"] == 2  # both occurrences


def test_winnow_matches_scalar_twin(ray_session):
    pdf = _corpus(seed=11)
    got = winnow_fingerprints(_ds(pdf), k=4, w=5).to_pandas()
    exp_rows = [
        (d, p, h)
        for d, t in zip(pdf.doc_id, pdf.text)
        for p, h in winnow_scalar(re.findall(r"[a-z]+", t.lower()), k=4, w=5)
    ]
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "pos", "fp"])
    srt = lambda df: df.sort_values(["doc_id", "pos"]).reset_index(drop=True)  # noqa: E731
    assert srt(got).astype("int64").equals(srt(exp).astype("int64"))


def test_winnow_coverage_guarantee(ray_session):
    # winnowing invariant: every w-window contains >= 1 selected position
    # -> gaps between consecutive selected positions are <= w (a gap of
    # w+1 would leave one window with no selection inside it)
    pdf = _corpus(n=20, seed=3)
    got = winnow_fingerprints(_ds(pdf, 3), k=4, w=5).to_pandas()
    for d, g in got.groupby("doc_id"):
        ps = np.sort(g["pos"].to_numpy())
        toks = re.findall(r"[a-z]+", pdf.text[int(d)].lower())
        nwin = len(toks) - 4 + 1
        assert ps[0] < 5 and ps[-1] >= nwin - 5
        assert (np.diff(ps) <= 5).all()


def test_winnow_rightmost_tie_rule_and_short_docs(ray_session):
    # all-identical tokens -> every 4-gram hash equal -> each window
    # selects its RIGHTMOST position -> fingerprints = {w-1 .. nwin-1};
    # 4-token doc has 1 window but no full 5-window -> no rows
    pdf = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": [" ".join(["same"] * 12), "only four tokens here"],
        }
    )
    got = winnow_fingerprints(_ds(pdf, 2), k=4, w=5).to_pandas()
    assert set(got["doc_id"]) == {0}
    nwin = 12 - 4 + 1  # 9
    assert sorted(got["pos"]) == list(range(4, nwin))


def test_bloom_matches_brute_force_including_fps(ray_session):
    from sits_ray.kernels.text import window_hash_scalar

    pdf = _corpus(seed=5, planted_every=10)  # docs 0,10,20,30 share text
    a, b = bloom_constants(3, 29)
    m = 1 << 20
    bench_pos, gh = set(), {}
    for d, t in zip(pdf.doc_id, pdf.text):
        hs = set(window_hash_scalar(re.findall(r"[a-z]+", t.lower()), w=3))
        gh[d] = hs
        if d % 20 == 0:
            for h in hs:
                for j in range(3):
                    bench_pos.add(int((int(a[j]) * h + int(b[j])) % _P % m))
    exp = []
    for d, hs in gh.items():
        if d % 20 == 0:
            continue
        n = sum(
            1
            for h in hs
            if all(
                int((int(a[j]) * h + int(b[j])) % _P % m) in bench_pos
                for j in range(3)
            )
        )
        exp.append((d, n, n > 0))
    exp = (
        pd.DataFrame(exp, columns=["doc_id", "n_bloom_hits", "flagged"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        bloom_decontaminate(_ds(pdf), bench_mod=20)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.astype(exp.dtypes.to_dict()).equals(exp)
    # docs 10 and 30 replicate benchmark docs 0/20 -> must be flagged
    assert got.set_index("doc_id").loc[[10, 30], "flagged"].all()


def test_bloom_positions_int64_exact():
    a, b = bloom_constants(3, 29)
    h = np.array([0, 1, _P - 1], dtype=np.int64)
    pos = _bloom_positions(h, a, b, 1 << 20)
    assert pos.shape == (3, 3)
    for j in range(3):
        for i, hv in enumerate([0, 1, _P - 1]):
            assert pos[j, i] == (int(a[j]) * hv + int(b[j])) % _P % (1 << 20)


def test_bloom_no_bench_docs_flags_nothing(ray_session):
    # no doc_id % 20 == 0 -> empty filter -> only (impossible) all-zero
    # positions could hit; every probe doc reports 0 hits
    pdf = _corpus(n=15, seed=9, planted_every=0)
    pdf["doc_id"] = pdf["doc_id"] + 1  # ids 1..15, none % 20 == 0
    got = bloom_decontaminate(_ds(pdf, 3), bench_mod=20).to_pandas()
    assert len(got) == 15
    assert (got["n_bloom_hits"] == 0).all() and (~got["flagged"]).all()


# --- blocklist phrase filter -------------------------------------------------

def test_blocklist_counts_and_keep(ray_session):
    import ray.data as rd

    from sits_ray.stages.curation import blocklist_hits

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "Bad Phrase here and bad phrase there",  # 2 (case-insensitive)
                "clean document",                         # 0
                "overlap aaa aaa",                        # 'aa aa' spans? no
                "bad phrasebad phrase",                   # 2, adjacent
                "phrase bad",                             # 0 (order matters)
            ],
        }
    )
    out = (
        blocklist_hits(rd.from_pandas(docs), ("bad phrase", "aaa"))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["hits_0"].tolist() == [2, 0, 0, 2, 0]
    assert out["hits_1"].tolist() == [0, 0, 2, 0, 0]
    assert out["n_hits"].tolist() == [2, 0, 2, 2, 0]
    assert out["keep"].tolist() == [False, True, False, False, True]


def test_blocklist_nonoverlapping_matches_replace_identity(ray_session):
    import ray.data as rd

    from sits_ray.stages.curation import blocklist_hits

    # self-overlapping pattern: 'aaaa' contains 'aa' 2x non-overlapping
    # (the replace identity), not 3x (overlapping)
    docs = pd.DataFrame({"doc_id": [0], "text": ["aaaa"]})
    out = blocklist_hits(rd.from_pandas(docs), ("aa",)).to_pandas()
    s = "aaaa"
    assert out["hits_0"].item() == (len(s) - len(s.replace("aa", ""))) // 2 == 2


def test_blocklist_empty_raises(ray_session):
    import ray.data as rd

    from sits_ray.stages.curation import blocklist_hits

    with pytest.raises(ValueError):
        blocklist_hits(rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x"]})), ())


# --- DSIR importance weights -------------------------------------------------
def _dsir_brute(docs, target_lang="en", B=128):
    import math
    import re

    from sits_ray.kernels.text import fingerprint_batch

    def buckets(text):
        ws = re.findall(r"[a-z]+", text.lower())
        return fingerprint_batch(ws) % B if ws else []

    ct = np.zeros(B, np.int64)
    cs = np.zeros(B, np.int64)
    for _, r in docs.iterrows():
        for b in buckets(r["text"]):
            (ct if r["lang"] == target_lang else cs)[b] += 1
    T, S = int(ct.sum()), int(cs.sum())
    lam = [
        math.log(float(int(ct[b]) + 1) / float(T + B))
        - math.log(float(int(cs[b]) + 1) / float(S + B))
        for b in range(B)
    ]
    out = {}
    for _, r in docs.iterrows():
        bs = buckets(r["text"])
        if not len(bs):
            continue
        c = np.bincount(bs, minlength=B)
        s = 0.0
        for b in range(B):
            s += c[b] * lam[b]
        out[r["doc_id"]] = (int(c.sum()), s)
    return out


def test_dsir_scores_matches_brute_and_separates(ray_session):
    import ray.data as rd

    from sits_ray.stages.curation import dsir_scores

    en = "the quick brown fox jumps over the lazy dog again and again"
    de = "der schnelle braune fuchs springt wieder ueber den faulen hund"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [en, en + " more english words here", de, de + " noch mehr",
                     "123 456 !!!"],  # zero [a-z]+ words -> omitted
            "lang": ["en", "en", "de", "de", "de"],
        }
    )
    out = (
        dsir_scores(rd.from_pandas(docs).repartition(2), target_lang="en")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = _dsir_brute(docs)
    assert out["doc_id"].tolist() == sorted(exp)  # doc 4 omitted
    for _, r in out.iterrows():
        n, s = exp[r["doc_id"]]
        assert r["n_words"] == n
        assert r["dsir_logw"] == s
    byid = out.set_index("doc_id")["dsir_logw"]
    # English docs must outscore German docs under the en-target weights
    assert min(byid[0], byid[1]) > max(byid[2], byid[3])


# --- k-anonymity audit --------------------------------------------------------

def test_k_anonymity_counts(ray_session):
    import ray.data as rd
    from sits_ray.stages.curation import k_anonymity

    # classes: (en,web,0):3  (en,web,1):1  (fr,book,0):2
    df = pd.DataFrame({
        "lang":   ["en"] * 4 + ["fr"] * 2,
        "source": ["web"] * 4 + ["book"] * 2,
        "n_chars": [10, 20, 30, 150, 40, 50],
    })
    out = k_anonymity(rd.from_pandas(df), k_values=(2, 3))
    k2 = out.loc[out["k"] == 2].iloc[0]
    assert k2["n_classes"] == 3
    assert k2["n_risky_classes"] == 1          # the singleton (en,web,1)
    assert k2["n_risky_records"] == 1
    assert k2["risk_frac"] == 1 / 6
    k3 = out.loc[out["k"] == 3].iloc[0]
    assert k3["n_risky_classes"] == 2          # sizes 1 and 2 both < 3
    assert k3["n_risky_records"] == 3
    assert k3["risk_frac"] == 3 / 6


def test_k_anonymity_batching_invariance(ray_session):
    import numpy as np
    import ray.data as rd
    from sits_ray.stages.curation import k_anonymity

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "lang": rng.choice(["en", "fr", "de"], 500),
        "source": rng.choice(["web", "book"], 500),
        "n_chars": rng.integers(0, 1000, 500),
    })
    one = k_anonymity(rd.from_pandas(df))
    many = k_anonymity(rd.from_pandas(df).repartition(11))
    pd.testing.assert_frame_equal(one, many)


# --- DP Laplace mechanism (seeded) ---------------------------------------------

def test_dp_noise_distribution_properties(ray_session):
    # inverse-CDF sanity on the deterministic draw chain itself
    import math
    import numpy as np
    from sits_ray.kernels.text import fingerprint_batch
    from sits_ray.stages.sketch import kmv_mix

    names = [f"type_{i}" for i in range(2000)]
    m = kmv_mix(fingerprint_batch(names))
    u = (m.astype(np.float64) + 0.5) / 2147483647.0
    assert ((u > 0) & (u < 1)).all()
    noise = np.array([
        -(1.0 if x >= 0.5 else -1.0) * math.log(1.0 - 2.0 * abs(x - 0.5))
        for x in u])
    # Laplace(b=1): mean ~ 0, E|X| = 1, P(|X| <= ln 2) = 1/2
    assert abs(noise.mean()) < 0.1
    assert abs(np.abs(noise).mean() - 1.0) < 0.1
    frac = (np.abs(noise) <= math.log(2.0)).mean()
    assert abs(frac - 0.5) < 0.05


def test_dp_noisy_counts_deterministic(ray_session):
    from sits_ray.queries import QUERIES

    a = QUERIES["dp_noisy_type_counts"]("/root/testdata/sf0.001")
    b = QUERIES["dp_noisy_type_counts"]("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert (a["noisy_n"] != a["n"]).all()   # noise actually applied
