"""sits_ray — a from-scratch Ray-Data-native time-series rollup/retention engine.

Re-expresses the query & transform semantics of e-sensing/sits (temporal
regularization / compositing, gap-fill, smoothing, temporal reduction,
per-series scoring — see SURVEY.md) over Parquet tables of multi-turn
conversation/agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Architecture is idiomatic Ray Data: every stage is a ``ray.data.Dataset``
transform (``map_batches`` over zero-copy Arrow batches, actor pools for
stateful stages, ``groupby``/``sort``/``repartition`` for the wide steps).
Kernels live in :mod:`sits_ray.kernels` as pure numpy functions with
single-process reference twins used as test oracles (the sits test pattern,
reference ``tests/testthat/test-reduce.R:29-34``).
"""

from sits_ray import timeline  # noqa: F401

__version__ = "0.1.0"

#: bump when the tier schema changes — resumable output directories embed
#: this so a resume never mixes schema generations
SCHEMA_VERSION = 2

TRANSCRIPT_SCHEMA = {
    "conv_id": "string",
    "turn_idx": "int32",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp[us]",
}

# Retention tiers (continuous aggregates), finest → coarsest.
TIERS = ("1m", "1h", "1d")
