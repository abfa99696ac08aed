import numpy as np
import pandas as pd
import pytest

from sits_ray.kernels import rolling as R
from sits_ray.kernels import text as T


def _brute(m, w, fn, edge="mirror"):
    leg = w // 2
    m = np.atleast_2d(m)
    out = np.empty_like(m, dtype=np.float64)
    for i in range(m.shape[0]):
        row = m[i]
        if edge == "mirror":
            pad = np.pad(row, leg, mode="symmetric")
        else:
            pad = np.pad(row, leg, mode="constant", constant_values=np.nan)
        for j in range(row.size):
            out[i, j] = fn(pad[j : j + w])
    return out


@pytest.fixture(scope="module")
def mtx():
    return np.random.default_rng(11).normal(size=(4, 23))


@pytest.mark.parametrize(
    "name,npfn",
    [
        ("w_mean", np.nanmean),
        ("w_median", np.nanmedian),
        ("w_min", np.nanmin),
        ("w_max", np.nanmax),
    ],
)
def test_rolling_vs_brute(mtx, name, npfn):
    for w in (3, 5, 7):
        got = R.ROLLING_KERNELS[name](mtx, w)
        exp = _brute(mtx, w, npfn)
        np.testing.assert_allclose(got, exp)


def test_rolling_sd_var(mtx):
    got = R.w_sd(mtx, 5)
    exp = _brute(mtx, 5, lambda a: np.std(a[~np.isnan(a)], ddof=1))
    np.testing.assert_allclose(got, exp)
    np.testing.assert_allclose(R.w_var(mtx, 5), got**2)


def test_rolling_modal():
    m = np.array([[1.0, 1.0, 2.0, 2.0, 2.0, 3.0]])
    got = R.w_modal(m, 3)
    # symmetric pad: [1,|1,1,2,2,2,3|,3]; windows -> modes
    np.testing.assert_allclose(got[0], [1, 1, 2, 2, 2, 3])
    m2 = np.array([[1.0, np.nan, 2.0]])
    assert np.isnan(R.w_modal(m2, 3)).all()  # NaN in window -> NaN


def test_rolling_clip_edges(mtx):
    got = R.w_mean(mtx, 5, edge="clip")
    exp = _brute(mtx, 5, np.nanmean, edge="clip")
    np.testing.assert_allclose(got, exp)


def test_mirror_matches_reference_locus():
    # reference locus_mirror (src/kernel.cpp:8-20): prefix [a1,a0], suffix
    # [a_{n-1}, a_{n-2}] for leg=2 == numpy 'symmetric'
    row = np.arange(5, dtype=np.float64)
    got = R.w_mean(row[None, :], 5)[0]
    pad = np.array([1, 0, 0, 1, 2, 3, 4, 4, 3], dtype=np.float64)
    exp = [pad[i : i + 5].mean() for i in range(5)]
    np.testing.assert_allclose(got, exp)


def test_token_counts():
    assert T.token_count("hello  world\n foo") == 3
    assert T.token_count("") == 0
    assert T.bpeish_token_count("ab12-cd") == 4  # ab,12,-,cd


def test_quality_features():
    f = T.quality_features("The cat and the dog. And the bird!")
    assert f["n_chars"] == 34
    assert 0 < f["punct_ratio"] < 0.2
    assert f["stopword_ratio"] > 0.3
    z = T.quality_features("")
    assert z["n_tokens"] == 0 and z["stopword_ratio"] == 0


def test_detect_lang():
    assert T.detect_lang("the cat and the dog is in a house for it") == "en"
    assert T.detect_lang("der hund und die katze ist nicht ein vogel") == "de"
    assert T.detect_lang("el perro y la casa es un gato que por") == "es"
    assert T.detect_lang("一二三四五六七八九十一二三") == "zh"
    assert T.detect_lang("zzz qqq xxx") == "und"


def test_rolling_fingerprint_stable():
    a = T.rolling_fingerprint("hello world")
    assert a == T.rolling_fingerprint("hello world")
    assert a != T.rolling_fingerprint("hello worlds")


def test_fingerprint_batch_matches_scalar():
    import numpy as np

    texts = ["hello world", "", "a", "hello worlds", "x" * 5000, "mixed 123 !?"]
    got = T.fingerprint_batch(texts)
    exp = [T.rolling_fingerprint(t, mod=(1 << 31) - 1) for t in texts]
    assert list(got) == exp
    # distinct texts -> distinct fingerprints here
    nz = [g for g, t in zip(got, texts) if t]
    assert len(set(nz)) == len(nz)


def test_bigram_counts_adjacency_and_boundaries():
    import pandas as pd

    s = pd.Series(["The quick brown fox", "quick brown", "x", "", "!!!"])
    vc = T.bigram_counts(s)
    assert vc["quick brown"] == 2          # counted in both docs
    assert vc["the quick"] == 1            # lowercased
    assert "fox quick" not in vc.index     # no cross-document bigrams
    assert T.bigram_counts(pd.Series(["", "?!"])).empty
    # single-token docs yield nothing
    assert T.bigram_counts(pd.Series(["word"])).empty


def test_redact_batch_emails_and_digits():
    import pandas as pd

    s = pd.Series(
        ["contact a.b+x@mail.example.org now", "pin 1234 then 5", "clean"]
    )
    red, cnt = T.redact_batch(s)
    assert list(red) == [
        "contact <PII> now", "pin <PII> then <PII>", "clean"
    ]
    assert list(cnt) == [1, 2, 0]


def test_repetition_features_edges_and_bruteforce():
    import pandas as pd

    s = pd.Series(
        ["the the the cat", "", "x", "one two one two one two",
         "alpha beta gamma delta epsilon zeta eta theta iota kappa"]
    )
    out = T.repetition_features(s)
    # brute-force twin per doc
    for i, txt in enumerate(s):
        import re
        ws = re.findall(r"[a-z]+", txt.lower())
        n = len(ws)
        assert out["n_words"].iloc[i] == n
        if n == 0:
            assert out["mean_word_len"].iloc[i] == 0.0
            assert out["top_word_frac"].iloc[i] == 0.0
            continue
        assert out["mean_word_len"].iloc[i] == sum(map(len, ws)) / n
        top = max(ws.count(w) for w in set(ws))
        assert out["top_word_frac"].iloc[i] == top / n
        if n >= 2:
            bis = [ws[j] + " " + ws[j + 1] for j in range(n - 1)]
            topb = max(bis.count(b) for b in set(bis))
            assert out["top_bigram_frac"].iloc[i] == topb / (n - 1)
        else:
            assert out["top_bigram_frac"].iloc[i] == 0.0
    # "the the the cat": top_word_frac 0.75 -> dropped; 10-word clean doc kept
    assert not out["keep"].iloc[0]
    assert out["keep"].iloc[4]


def test_repetition_features_batch_boundary_isolation():
    """Bigrams never span documents: two docs that would form a repeated
    bigram if concatenated stay independent."""
    import pandas as pd

    out = T.repetition_features(pd.Series(["aa bb", "bb aa bb aa"]))
    assert out["top_bigram_frac"].iloc[0] == 1.0  # its own single bigram
    assert out["top_bigram_frac"].iloc[1] == 2 / 3


def test_simhash_poly_batch_scalar_parity_and_stability():
    import re
    from collections import Counter

    import pandas as pd

    texts = ["the cat sat on the mat", "cat the sat", "", "q",
             "alpha beta alpha beta alpha"]
    out = T.simhash_poly_batch(pd.Series(texts))

    def scalar(t, bits=16):
        acc = np.zeros(bits)
        for w, c in Counter(re.findall(r"[a-z]+", t.lower())).items():
            h = int(T.fingerprint_batch([w])[0])
            for j in range(bits):
                acc[j] += c if (h >> j) & 1 else -c
        return sum((1 << j) for j in range(bits) if acc[j] > 0)

    assert out.tolist() == [scalar(t) for t in texts]
    # signature is order-invariant in token positions but weight-sensitive
    a = T.simhash_poly_batch(pd.Series(["x y z", "z y x"]))
    assert a.iloc[0] == a.iloc[1]
    # batch split must not change any signature
    half = pd.concat(
        [T.simhash_poly_batch(pd.Series(texts[:2])),
         T.simhash_poly_batch(pd.Series(texts[2:]))]
    )
    assert half.tolist() == out.tolist()


def test_token_window_hashes_scalar_parity():
    import re

    from sits_ray.kernels.text import token_window_hashes, window_hash_scalar

    texts = pd.Series(
        [
            "Foo bar baz qux quux corge grault garply waldo fred",
            "short one",
            "",
            "a b c d e f g h",  # exactly w tokens -> one window
            "x1 y2 z3 mixed UPPER case tokens here and more words",
        ]
    )
    di, wh = token_window_hashes(texts, w=8)
    got = {}
    for d, h in zip(di, wh):
        got.setdefault(int(d), []).append(int(h))
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z]+", t.lower())
        want = window_hash_scalar(toks, w=8)
        assert got.get(i, []) == want, i


def test_token_window_hashes_empty_batch():
    from sits_ray.kernels.text import token_window_hashes

    di, wh = token_window_hashes(pd.Series(["", "ab"]), w=8)
    assert di.size == 0 and wh.size == 0


def test_dup_passages_e2e(ray_session):
    import ray.data as rd

    from sits_ray.stages.dedup import dup_passages

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                f"intro words here {shared} closing remarks now",
                f"{shared} different tail tokens follow after this",
                "completely unrelated text with enough tokens to form windows yes",
                "tiny",  # < 8 tokens -> zero windows
            ],
        }
    )
    out = (
        dup_passages(rd.from_pandas(docs), w=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2, 3]
    # docs 0 and 1 share the full 8-token run -> at least one dup window
    assert out.loc[0, "dup_windows"] >= 1
    assert out.loc[1, "dup_windows"] >= 1
    assert out.loc[2, "dup_windows"] == 0
    assert out.loc[3, "n_windows"] == 0 and out.loc[3, "dup_ratio"] == 0.0
    assert (out["dup_windows"] <= out["n_windows"]).all()


def test_dup_passages_text_never_shuffles(ray_session):
    """Structural: everything after the first map ships only
    (doc_id, hash, cnt) integers — no text column, no driver corpus
    materialization inside the pipeline builder."""
    import inspect

    import ray.data as rd

    from sits_ray.stages import dedup as m

    src = inspect.getsource(m.dup_passages)
    assert "to_pandas" not in src and "take_all" not in src
    docs = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c d e f g h i", "a b c d e f g h j"]}
    )
    out = m.dup_passages(rd.from_pandas(docs), w=8)
    # output schema carries no payload text
    assert set(out.schema().names) == {
        "doc_id", "n_windows", "dup_windows", "dup_ratio"
    }


def test_unigram_nll_matches_scalar_and_drops_empty(ray_session):
    import math

    import ray.data as rd

    from sits_ray.stages.lmscore import corpus_unigram_counts, unigram_nll

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["the cat sat", "the the the", "", "cat cat sat dog"],
        }
    )
    ds = rd.from_pandas(df)
    counts, total = corpus_unigram_counts(ds)
    assert total == 10
    out = unigram_nll(ds, counts, total).to_pandas().sort_values("doc_id")
    assert list(out.doc_id) == [0, 1, 3]  # empty doc dropped
    cnt = dict(zip(counts["token"], counts["cnt"]))
    for _, row in out.iterrows():
        toks = df.loc[df.doc_id == row.doc_id, "text"].iloc[0].split()
        acc = np.float64(0.0)
        for t in toks:
            acc = acc + np.float64(-math.log(cnt[t] / total))
        assert row.nll == acc / np.float64(len(toks))
        assert row.n_tokens == len(toks)
    # repeated-word doc scores lower NLL than rare-word doc
    nll = dict(zip(out.doc_id, out.nll))
    assert nll[1] < nll[3]


def test_unigram_nll_oov_raises(ray_session):
    """Out-of-vocabulary tokens must fail loudly, not NaN-poison nll."""
    import ray.data as rd

    from sits_ray.stages.lmscore import unigram_nll

    counts = pd.DataFrame({"token": ["alpha", "beta"], "cnt": [3, 1]})
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["alpha beta gamma"]})
    )
    with pytest.raises(Exception, match="gamma"):
        unigram_nll(docs, counts, total=4).to_pandas()


def test_collocations_bruteforce(ray_session, tmp_path):
    import collections
    import re

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sits_ray.queries import QUERIES

    texts = ["strong tea strong tea strong tea bites",
             "strong tea and weak coffee strong tea",
             "weak coffee weak coffee bites dog"] * 3
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"),
    )
    out = QUERIES["collocations_topk"](str(tmp_path))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    uni = collections.Counter()
    bi = collections.Counter()
    for t in texts:
        ws = re.findall(r"[a-z]+", t.lower())
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n = sum(bi.values())
    want = sorted(
        ((n * c) / (uni[a] * uni[b]), a, b, c)
        for (a, b), c in bi.items() if c >= 5
    )
    want.sort(key=lambda r: (-r[0], r[1], r[2]))
    got = list(map(tuple, out[["w1", "w2", "cab", "lift"]].to_numpy()))
    assert got == [(a, b, c, l) for l, a, b, c in want[:20]]
    # both planted collocations survive; the rarer pair has higher lift
    pairs = {g[:2] for g in got}
    assert {("strong", "tea"), ("weak", "coffee")} <= pairs
    assert got[0][:2] == ("weak", "coffee")


def test_zipf_slope_near_minus_one_on_zipfian(ray_session):
    """A synthetic corpus drawn from an exact Zipf distribution recovers
    slope ~ -1; a uniform-frequency corpus recovers slope ~ 0."""
    import math

    import ray.data as rd
    from sits_ray.queries import QUERIES, _ZIPF_V

    # build documents whose token counts are exactly zipfian: token_i
    # appears floor(C/i) times
    def wname(i):
        a, b = divmod(i, 26)
        return "w" + chr(97 + a) + chr(97 + b)

    words = [wname(i) for i in range(300)]
    toks = []
    for i, w in enumerate(words, start=1):
        toks.extend([w] * (3000 // i))
    import numpy as np
    rng = np.random.default_rng(0)
    rng.shuffle(toks)
    import pandas as pd
    docs = [" ".join(toks[i::40]) for i in range(40)]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame({"text": docs}).to_parquet(
            os.path.join(d, "documents.parquet"))
        out = QUERIES["zipf_slope"](d)
    assert -1.15 < out.loc[0, "slope"] < -0.85
    # uniform corpus
    toks_u = [w for w in words for _ in range(10)]
    docs_u = [" ".join(toks_u[i::10]) for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame({"text": docs_u}).to_parquet(
            os.path.join(d, "documents.parquet"))
        out_u = QUERIES["zipf_slope"](d)
    assert abs(out_u.loc[0, "slope"]) < 0.05
    assert out_u.loc[0, "n_ranked"] == 300


# --- bigram LM scoring -----------------------------------------------------------

def test_bigram_nll_matches_scalar_twin(ray_session):
    import math
    import ray.data as rd
    from sits_ray.stages.lmscore import (bigram_nll, corpus_bigram_counts,
                                         corpus_unigram_counts)

    docs = ["the cat sat on the mat", "the cat ran", "dogs bark", "a"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                                      "text": docs}))
    uni, _ = corpus_unigram_counts(ds)
    bi = corpus_bigram_counts(ds)
    out = (bigram_nll(ds, bi, uni).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 3 ('a') has < 2 tokens -> dropped
    assert out["doc_id"].tolist() == [0, 1, 2]
    # scalar twin
    from collections import Counter
    toks = [d.split() for d in docs]
    c1 = Counter(w for t in toks for w in t)
    c2 = Counter((a, b) for t in toks for a, b in zip(t, t[1:]))
    v = len(c1)
    for _, row in out.iterrows():
        t = toks[int(row["doc_id"])]
        acc = 0.0
        for a, b in zip(t, t[1:]):
            acc = acc + (-math.log((c2[(a, b)] + 1) / (c1[a] + v)))
        assert row["nll"] == acc / (len(t) - 1)      # bit-exact
        assert row["n_tokens"] == len(t)


def test_bigram_nll_context_sensitivity(ray_session):
    # scrambled word order shares the unigram profile but scores worse
    # under the bigram model
    import ray.data as rd
    from sits_ray.stages.lmscore import (bigram_nll, corpus_bigram_counts,
                                         corpus_unigram_counts)

    base = "the quick brown fox jumps over the lazy dog"
    scram = "dog the over quick lazy jumps fox brown the"
    docs = [base] * 8 + [scram]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(9, dtype=np.int64),
                                      "text": docs}))
    uni, _ = corpus_unigram_counts(ds)
    bi = corpus_bigram_counts(ds)
    out = bigram_nll(ds, bi, uni).to_pandas().set_index("doc_id")
    assert out.loc[8, "nll"] > out.loc[0, "nll"] + 0.5


# --- readability ------------------------------------------------------------------

def test_readability_counts_hand_checked():
    from sits_ray.kernels.text import readability_counts

    w, s, y = readability_counts(pd.Series([
        "The cat sat. It ran!",      # 5 words, 2 sents, 5 syllables
        "Tsk tsk hmm",               # vowel-less words get 1 syllable each
        "beautiful education",       # eau/i/u + e/u/a/io = 7
        "",                          # empty: all zeros
    ]))
    assert w.tolist() == [5, 3, 2, 0]
    assert s.tolist() == [2, 1, 1, 0]
    assert y.tolist() == [5, 3, 7, 0]


def test_readability_orders_simple_before_complex(ray_session):
    from sits_ray.queries import QUERIES
    import ray.data as rd  # noqa: F401

    # simple repeated monosyllables vs long latinate words
    out = QUERIES["readability_scores"]("/root/testdata/sf0.001")
    assert len(out.to_pandas() if hasattr(out, "to_pandas") else out) > 0


def test_bigram_nll_forced_cap(ray_session):
    """Broadcast bound (VERDICT r4 watch item): with
    max_broadcast_bigrams forcing a prune, (a) kept-only docs score
    bit-identically to the exact path, (b) pruned bigrams back off to
    the add-one unseen mass 1/(c1(prev)+V), matching a scalar replay of
    the PRUNED model."""
    import math

    import ray.data as rd
    from collections import Counter

    from sits_ray.stages.lmscore import (bigram_nll, corpus_bigram_counts,
                                         corpus_unigram_counts)

    # 'the cat' is frequent (kept under any top-K); 'dogs bark' is rare
    docs = ["the cat sat", "the cat ran", "the cat sat", "dogs bark run"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                                      "text": docs}))
    uni, _ = corpus_unigram_counts(ds)
    bi = corpus_bigram_counts(ds)
    exact = (bigram_nll(ds, bi, uni).to_pandas()
             .sort_values("doc_id").set_index("doc_id"))
    capped = (bigram_nll(ds, bi, uni, max_broadcast_bigrams=3).to_pandas()
              .sort_values("doc_id").set_index("doc_id"))

    # deterministic top-3 cut (cnt desc, pair asc)
    kept = set(bi.sort_values(["cnt", "pair"], ascending=[False, True])
                 .head(3)["pair"])
    toks = [d.split() for d in docs]
    c1 = Counter(w for t in toks for w in t)
    c2 = Counter((a, b) for t in toks for a, b in zip(t, t[1:]))
    v = len(c1)
    for did, t in enumerate(toks):
        pairs = list(zip(t, t[1:]))
        acc = 0.0
        for a, b in pairs:
            if f"{a} {b}" in kept:
                acc += -math.log((c2[(a, b)] + 1) / (c1[a] + v))
            else:
                acc += -math.log(1 / (c1[a] + v))
        assert capped.loc[did, "nll"] == acc / len(pairs)
        if all(f"{a} {b}" in kept for a, b in pairs):
            assert capped.loc[did, "nll"] == exact.loc[did, "nll"]
    # pruned docs must score WORSE than exact (mass removed)
    assert (capped["nll"] >= exact["nll"]).all()
    assert (capped["nll"] > exact["nll"]).any()
