"""Reference-named facade (sits_ray/api.py): every exported verb resolves,
and a reference-shaped mini-pipeline runs verb-for-verb."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def test_every_reference_verb_resolves():
    import sits_ray.api as api

    verbs = [n for n in dir(api) if n.startswith("sits_")]
    assert len(verbs) >= 40
    for v in verbs:
        assert callable(getattr(api, v)), v


def test_reference_shaped_pipeline(ray_session, transcripts_dir, tmp_path):
    """The reference lifecycle, verb-for-verb: regularize -> filter
    (whittaker closure) -> labels/sample -> train -> classify ->
    label_classification."""
    from sits_ray import api

    # regularize (sits tibble path): nested 1h tier
    ds = rd.read_parquet(transcripts_dir)
    nested = api.sits_regularize(
        ds, tiers=("1h",), key="conv_id", ts_col="ts",
        order_col="turn_idx", tool_col="tool",
    )
    long = api.nested_to_long(nested)
    assert long.count() > 0

    # filter closure factory over every band
    filt = api.sits_filter(
        nested.limit(50), api.sits_whittaker(0.5), cols=("mean_latency",)
    ).to_pandas()
    assert "mean_latency_filt" in filt.columns

    # samples: labels -> per-label sample -> train -> classify
    rng = np.random.default_rng(4)
    X = rng.normal(size=(240, 8))
    y = np.where(X[:, 0] > 0, "tool_heavy", "chatty")
    samples = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(240), "label": y, "embedding": list(X)})
    )
    assert api.sits_labels(samples) == ["chatty", "tool_heavy"]
    model = api.sits_train(X, y, api.sits_mlr(iters=150))
    scored = api.sits_classify(samples, model).to_pandas()
    acc = (scored["pred_label"].to_numpy() == y).mean()
    assert acc > 0.9

    # uncertainty + csv sink
    probs = scored[[c for c in scored.columns if c.startswith("prob_")]].to_numpy()
    ent = api.sits_uncertainty_entropy(probs)
    assert ent.shape == (240,) and (ent >= 0).all()
    out = api.sits_to_csv(rd.from_pandas(scored.head(10)), str(tmp_path / "csv"))
    import glob
    import os

    assert glob.glob(os.path.join(out, "*.csv"))
