"""A/B: per-pair C-set verify (production, stages/dedup.py) vs the
exploded-shingle-join vectorization VERDICT r4 next-round item #5
proposed. MEASURED OUTCOME (recorded in BASELINE.md): the exploded
join is 8-10x SLOWER at realistic candidate shapes, so the production
code keeps the cached-set path. The set path was never per-pair
*interpreter* work in the costly sense: each doc's shingle set builds
once per batch and the intersection is a C-level hash op of
O(min(|A|,|B|)); the exploded alternative pays an O(E log E) lexsort
over E = sum over pairs of (|A|+|B|) rows, which loses whenever docs
recur across pairs (they always do — that is what a candidate bucket
is).

Usage: python tools/ab_pair_verify.py [n_docs] [doc_len] [n_pairs]
Prints one JSON line with both timings; asserts identical outputs.
"""

import json
import sys
import time

import numpy as np
import pandas as pd


def char_shingles(text: str, k: int = 5) -> set:
    return {text[i:i + k] for i in range(max(len(text) - k + 1, 1))}


def scalar_verify(texts, da, db):
    cache = {}

    def sh(i):
        s = cache.get(i)
        if s is None:
            s = cache[i] = char_shingles(texts[i])
        return s

    return np.fromiter(
        (len(sh(a) & sh(b)) for a, b in zip(da, db)), np.int64, len(da)
    )


def exploded_verify(texts, da, db):
    ids = list(da) + list(db)
    flat, lens, order, seen = [], [], [], set()
    for i in ids:
        if i in seen:
            continue
        seen.add(i)
        sh = char_shingles(texts[i])
        flat.extend(sh)
        lens.append(len(sh))
        order.append(i)
    codes, _ = pd.factorize(np.asarray(flat, dtype=object))
    by_doc, off = {}, 0
    for i, n in zip(order, lens):
        by_doc[i] = np.unique(codes[off:off + n])
        off += n
    A = [by_doc[d] for d in da]
    B = [by_doc[d] for d in db]
    n = len(A)
    la = np.fromiter((a.size for a in A), np.int64, n)
    lb = np.fromiter((b.size for b in B), np.int64, n)
    idx = np.concatenate([np.repeat(np.arange(n), la),
                          np.repeat(np.arange(n), lb)])
    val = np.concatenate(A + B)
    o = np.lexsort((val, idx))
    iv, vv = idx[o], val[o]
    dup = (iv[1:] == iv[:-1]) & (vv[1:] == vv[:-1])
    return np.bincount(iv[1:][dup], minlength=n).astype(np.int64)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
    rng = np.random.default_rng(1)
    alpha = np.array(list("abcdefghij "))
    texts = {i: "".join(rng.choice(alpha, size=doc_len))
             for i in range(n_docs)}
    da = rng.integers(0, n_docs, size=n_pairs)
    db = rng.integers(0, n_docs, size=n_pairs)

    t0 = time.perf_counter()
    a = scalar_verify(texts, da, db)
    ts = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = exploded_verify(texts, da, db)
    tv = time.perf_counter() - t0
    assert (a == b).all()
    print(json.dumps({
        "n_docs": n_docs, "doc_len": doc_len, "n_pairs": n_pairs,
        "scalar_cset_sec": round(ts, 3),
        "exploded_join_sec": round(tv, 3),
        "exploded_over_scalar": round(tv / ts, 1),
        "identical": True,
    }))


if __name__ == "__main__":
    main()
