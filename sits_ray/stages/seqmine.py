"""Sequential pattern mining over event streams (length-2 patterns).

Reference analog: the sits workflow mines temporal orderings of events
(e.g. which land-cover transition precedes which) the way basket mining
(`assoc_rules_types`) mines co-occurrence; this module adds the ORDERED
counterpart — "users who do A before they ever do B" — the classic
support count of the 2-sequence <A, B> (GSP/PrefixSpan at length 2,
Srikant & Agrawal 1996), which is the workhorse audit for tool-usage
ordering in transcript pipelines.

Scale shape: one per-batch combiner collapses the stream to per-(user,
type) FIRST occurrence partials (bounded by batch rows, typically far
fewer), one ``part_aggregate`` shuffle keyed by user_id (O(n_parts)
groups) finishes the min and counts ordered type pairs per partition,
and only types^2-sized partials reach the driver. No corpus-sized
groupby, no global sort; all counts are int64 (order-free exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sits_ray.stages.hashagg import part_aggregate


def _first_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: min(event_id) per (user_id, event_type)."""
    g = (df.groupby(["user_id", "event_type"], sort=False, observed=True)
           ["event_id"].min().reset_index())
    return g


def _pair_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-partition kernel: finish per-user first-occurrence mins,
    then count ordered (type_a before type_b) pairs and distinct users.
    Runs once per hash partition; every row of one user is co-located
    (part_aggregate contract), so mins and pair counts are exact."""
    f = (df.groupby(["user_id", "event_type"], sort=False, observed=True)
           ["event_id"].min().reset_index())
    m = f.merge(f, on="user_id", suffixes=("_a", "_b"))
    # event_id is unique per event, so strict < is a total order and the
    # a != b guard is implied; keep it explicit for self-documentation.
    m = m[(m["event_id_a"] < m["event_id_b"])
          & (m["event_type_a"] != m["event_type_b"])]
    out = (m.groupby(["event_type_a", "event_type_b"], sort=False,
                     observed=True)
            .size().rename("n_users").reset_index())
    out.columns = ["type_a", "type_b", "n_users"]
    out["n_users"] = out["n_users"].astype(np.int64)
    out["is_total"] = np.zeros(len(out), dtype=np.int8)
    # disjoint user partitions -> partial distinct-user counts sum
    # exactly; the total-users row is tagged with a dedicated marker
    # column, NOT an in-band key value — a genuine empty-string
    # event_type must count as a normal key (ADVICE r4)
    sent = pd.DataFrame({
        "type_a": [""], "type_b": [""],
        "n_users": np.asarray([f["user_id"].nunique()], dtype=np.int64),
        "is_total": np.asarray([1], dtype=np.int8),
    })
    return pd.concat([out, sent], ignore_index=True)


def seq_patterns_topk(ds, k: int = 20, n_parts: int = 32) -> pd.DataFrame:
    """Top-k 2-sequences <type_a, type_b> by user support.

    Support = number of users whose FIRST type_a event precedes their
    first type_b event (both present). Returns columns
    ``type_a, type_b, n_users, support_frac`` sorted by support desc,
    then (type_a, type_b) asc — a total order, so the cut is
    deterministic. support_frac = n_users / total_users in double; both
    operands are exact bigint->double casts (< 2^53)."""
    pre = ds.map_batches(_first_partial, batch_format="pandas")
    parts = part_aggregate(pre, _pair_counts, key_col="user_id",
                           n_parts=n_parts).to_pandas()
    total = int(parts.loc[parts["is_total"] == 1, "n_users"].sum())
    pairs = (parts[parts["is_total"] == 0]
             .groupby(["type_a", "type_b"], sort=False, observed=True)
             ["n_users"].sum().reset_index())
    pairs["n_users"] = pairs["n_users"].astype(np.int64)
    pairs = pairs.sort_values(
        ["n_users", "type_a", "type_b"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)
    pairs["support_frac"] = (
        pairs["n_users"].to_numpy(dtype=np.float64) / float(total)
    )
    return pairs
