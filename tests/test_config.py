"""Layered config overlay (sits_ray/config.py = R/sits_config.R surface)."""

import json

import pytest

from sits_ray.config import DEFAULTS, flagship_kwargs, load_config


def test_defaults_pass_validation():
    cfg = load_config()
    assert cfg == DEFAULTS
    kw = flagship_kwargs(cfg)
    assert kw["tiers"] == ("1m", "1h", "1d") and kw["n_parts"] == 32


def test_file_and_override_layering(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"flagship": {"n_parts": 8}, "retention": {"1m": 7}}))
    cfg = load_config(str(p), overrides={"flagship": {"dedup": True}})
    assert cfg["flagship"]["n_parts"] == 8          # from file
    assert cfg["flagship"]["dedup"] is True          # from override
    assert cfg["flagship"]["gapfill"] is True        # default survives
    assert cfg["retention"]["1m"] == 7 and cfg["retention"]["1h"] == 365


def test_toml_file(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text('[flagship]\ntiers = ["1h"]\nn_parts = 4\n')
    cfg = load_config(str(p))
    assert flagship_kwargs(cfg)["tiers"] == ("1h",)


def test_validation_rejects_bad_tier_and_salt(tmp_path):
    with pytest.raises(ValueError, match="unknown tiers"):
        load_config(overrides={"flagship": {"tiers": ["9z"]}})
    with pytest.raises(ValueError, match="not a multiple"):
        load_config(
            overrides={
                "flagship": {
                    "tiers": ["1h"],
                    "salt_turn_threshold": 10,
                    "salt_window_us": 90 * 60 * 1_000_000,
                }
            }
        )
    with pytest.raises(ValueError, match="n_parts"):
        load_config(overrides={"flagship": {"n_parts": 0}})


def test_flagship_runs_from_config(ray_session, transcripts_dir, tmp_path):
    from sits_ray.pipelines.flagship import run_flagship

    cfg = load_config(overrides={"flagship": {"tiers": ["1d"], "n_parts": 4}})
    res = run_flagship(transcripts_dir, str(tmp_path / "out"), **flagship_kwargs(cfg))
    assert res["tiers"]["1d"] > 0
