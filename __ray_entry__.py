"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship retention pipeline (transcripts -> gap-filled
1m/1h/1d tiers with Gorilla blocks + lineage manifests) on a deterministic
synthetic transcript table (BASELINE.json ``input_hint`` shape; seeded, no
external data) and returns the 1m long tier.

``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 over the driver's testdata tables; see
``sits_ray/queries.py``. Ray is initialised by the driver before import —
nothing here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline on a synthetic sf0.001-scale transcript table."""
    from sits_ray import SCHEMA_VERSION
    from sits_ray.pipelines.flagship import read_tier, run_flagship
    from sits_ray.synth import write_transcripts

    in_dir = write_transcripts(
        "/tmp/sits_ray_entry/transcripts", n_convs=100, mean_turns=30, seed=42, files=4
    )
    out_dir = f"/tmp/sits_ray_entry/tiers_v{SCHEMA_VERSION}"
    run_flagship(in_dir, out_dir, tiers=("1m", "1h", "1d"), n_parts=8)
    return read_tier(out_dir, "1m")


def queries() -> dict[str, Callable[[str], Any]]:
    from sits_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sits_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
