"""Layered run configuration — the reference's config overlay surface
(``R/sits_config.R``, ``inst/extdata/config.yml``: package defaults
merged under a user YAML merged under function arguments). Here:
package DEFAULTS <- config file (TOML or JSON) <- explicit overrides,
deep-merged in that order, then validated against the engine's
invariants (tier widths known, salt window a multiple of every tier —
the same check the exchange enforces at run time).
"""

from __future__ import annotations

import json
from copy import deepcopy

DEFAULTS: dict = {
    "flagship": {
        "tiers": ["1m", "1h", "1d"],
        "n_parts": 32,
        "gapfill": True,
        "dedup": False,
        "resume": True,
        "write_blocks": True,
        "salt_turn_threshold": None,
        "salt_window_us": 7 * 86_400_000_000,
    },
    "classify": {
        "batch_rows": 4096,
        "concurrency": [1, 4],
    },
    "retention": {
        # days each tier is kept before mosaic/expiry (policy metadata;
        # consumed by callers, not enforced by the engine)
        "1m": 30,
        "1h": 365,
        "1d": 3650,
    },
}


def _deep_merge(base: dict, over: dict) -> dict:
    out = deepcopy(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = deepcopy(v)
    return out


def _load_file(path: str) -> dict:
    if path.endswith(".toml"):
        import tomllib

        with open(path, "rb") as fh:
            return tomllib.load(fh)
    with open(path) as fh:
        return json.load(fh)


def validate(cfg: dict) -> None:
    from sits_ray.stages.exchange import _validate_salt_window
    from sits_ray.stages.regularize import TIER_WIDTH_US

    fl = cfg["flagship"]
    unknown = [t for t in fl["tiers"] if t not in TIER_WIDTH_US]
    if unknown:
        raise ValueError(f"unknown tiers {unknown}; known: {sorted(TIER_WIDTH_US)}")
    _validate_salt_window(
        fl.get("salt_turn_threshold"), fl.get("salt_window_us", 0),
        tuple(fl["tiers"]),
    )
    npv = fl["n_parts"]
    if npv != "auto" and int(npv) < 1:
        raise ValueError('n_parts must be >= 1 or "auto"')


def load_config(path: str | None = None, overrides: dict | None = None) -> dict:
    """DEFAULTS <- file <- overrides, deep-merged then validated."""
    cfg = DEFAULTS
    if path:
        cfg = _deep_merge(cfg, _load_file(path))
    if overrides:
        cfg = _deep_merge(cfg, overrides)
    validate(cfg)
    return cfg


def flagship_kwargs(cfg: dict) -> dict:
    """The validated config's flagship section as run_flagship kwargs."""
    fl = cfg["flagship"]
    return dict(
        tiers=tuple(fl["tiers"]),
        n_parts=fl["n_parts"] if fl["n_parts"] == "auto" else int(fl["n_parts"]),
        gapfill=bool(fl["gapfill"]),
        dedup=bool(fl["dedup"]),
        resume=bool(fl["resume"]),
        write_blocks=bool(fl["write_blocks"]),
        salt_turn_threshold=fl["salt_turn_threshold"],
        salt_window_us=int(fl["salt_window_us"]),
    )


def config_show(cfg: dict | None = None) -> str:
    """Pretty-printed effective config (``sits_config_show``,
    ``R/sits_config.R``)."""
    return json.dumps(cfg if cfg is not None else DEFAULTS,
                      indent=2, sort_keys=True)


def user_config_path() -> str:
    """The user overlay file location (``sits_config_user_file``):
    honors ``SITS_RAY_CONFIG`` like the reference honors
    ``SITS_CONFIG_USER_FILE``; defaults under the home directory."""
    import os

    return os.environ.get(
        "SITS_RAY_CONFIG", os.path.expanduser("~/.sits_ray/config.json")
    )
