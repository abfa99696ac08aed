"""Resumable training-shard export — the end of the LLM-data pipeline.

Composes the engine's certified pieces into the artifact a trainer
actually reads: curated documents, reproducibly shuffled, written as
``n_shards`` shard DIRECTORIES of pos-ordered Parquet block files with
per-block atomic publish + resume.

    quality gate + near-dup keep list   (queries.curation_chain —
        SQL-exact end to end as `curation_keep_docs`)
    -> reproducible global shuffle rank (stages/curriculum.shuffle_order
        — NO Dataset.random_shuffle, NO global sort; bit-exact twin)
    -> shard = pos % n_shards           (round-robin over the shuffled
        order: every shard is an interleaved sample of the whole
        corpus — the property trainers rely on for per-shard loss
        stationarity); block = pos // (n_shards * block_rows)
    -> one Parquet file per (shard, block), rows sorted by pos,
        fsync+rename atomic publish, _SUCCESS fingerprint marker

Resume contract (the flagship manifest discipline at file granularity):
a block whose marker matches the run fingerprint (corpus row count +
layout config) is skipped; missing/mismatched blocks rebuild alone.
Output is byte-identical across runs and across resume boundaries
(pinned in tests/test_training_export.py).

Scale shape: the shuffle rank uses bounded histograms + ONE hash
exchange (curriculum machinery); the writes go through ONE
``part_aggregate`` keyed by (shard, block) — text crosses the object
store once, each partition's kernel writes its blocks with
``block_rows``-bounded memory per file, and only (shard, block, n)
summary rows reach the driver. Shard membership is a pure function of
``pos``, so no extra repartition exists anywhere.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def _fingerprint(n_rows: int, n_shards: int, block_rows: int) -> str:
    return json.dumps({"rows": n_rows, "shards": n_shards,
                       "block_rows": block_rows,
                       "v": "round-robin-pos-v1"}, sort_keys=True)


def export_training_shards(docs_ds, out_dir: str, n_shards: int = 8,
                           block_rows: int = 4096, n_parts: int = 32,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           curate: bool = True) -> dict:
    """Run (or resume) the export. Returns summary metrics
    (n_rows, blocks_built, blocks_skipped, shards)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sits_ray.stages.curriculum import shuffle_order
    from sits_ray.stages.exchange import _durable_publish
    from sits_ray.stages.hashagg import part_aggregate
    from sits_ray.stages.joins import adaptive_join_unique

    os.makedirs(out_dir, exist_ok=True)

    if curate:
        from sits_ray.queries import curation_chain

        keep = curation_chain(docs_ds).materialize()
        kept = adaptive_join_unique(
            keep, docs_ds, on=id_col, right_on=id_col,
            value_cols={text_col: text_col},
        ).materialize()
    else:
        kept = docs_ds.materialize()

    order = shuffle_order(kept.select_columns([id_col]), id_col=id_col)
    ranked = adaptive_join_unique(
        order, kept, on=id_col, right_on=id_col,
        value_cols={text_col: text_col},
    ).materialize()
    n_rows = ranked.count()
    fp = _fingerprint(n_rows, n_shards, block_rows)

    per_block = n_shards * block_rows

    def key_rows(df: pd.DataFrame) -> pd.DataFrame:
        pos = df["pos"].to_numpy(np.int64)
        out = df[[id_col, "pos", text_col]].copy(deep=False)
        out["shard"] = pos % n_shards
        out["block"] = pos // per_block
        out["gb"] = out["shard"] * 1_000_000 + out["block"]
        return out

    keyed = ranked.map_batches(key_rows, batch_format="pandas")

    def write_blocks(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (s, b), sub in g.groupby(["shard", "block"], sort=True):
            s, b = int(s), int(b)
            d = os.path.join(out_dir, f"shard-{s:04d}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"block-{b:06d}.parquet")
            marker = dst + "._SUCCESS"
            if os.path.exists(marker) and os.path.exists(dst):
                with open(marker) as fh:
                    if fh.read() == fp:
                        rows.append({"shard": np.int64(s),
                                     "block": np.int64(b),
                                     "n": np.int64(len(sub)),
                                     "built": np.int64(0)})
                        continue
            sub = sub.sort_values("pos")
            tbl = pa.table({
                id_col: pa.array(sub[id_col].to_numpy(np.int64)),
                "pos": pa.array(sub["pos"].to_numpy(np.int64)),
                text_col: pa.array(sub[text_col].to_numpy(dtype=object),
                                   pa.string()),
            })
            tmp = dst + ".tmp"
            pq.write_table(tbl, tmp)
            _durable_publish(tmp, dst)
            mtmp = marker + ".tmp"
            with open(mtmp, "w") as fh:
                fh.write(fp)
            _durable_publish(mtmp, marker)
            rows.append({"shard": np.int64(s), "block": np.int64(b),
                         "n": np.int64(len(sub)),
                         "built": np.int64(1)})
        return pd.DataFrame(
            rows, columns=["shard", "block", "n", "built"])

    summary = part_aggregate(keyed, write_blocks, key_col="gb",
                             n_parts=n_parts).to_pandas()
    return {
        "n_rows": n_rows,
        "n_shards": n_shards,
        "blocks_built": int(summary["built"].sum()),
        "blocks_skipped": int((summary["built"] == 0).sum()),
        "blocks_total": len(summary),
        "fingerprint": fp,
    }
