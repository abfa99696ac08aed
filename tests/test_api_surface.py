"""The complete reference verb surface: every NAMESPACE export binds to
a real engine operator, and the new thin verbs behave."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import sits_ray.api as api

# the reference's full export list (NAMESPACE of e-sensing/sits)
REF_EXPORTS = """
impute_linear sits_accuracy sits_accuracy_summary sits_add_base_cube
sits_apply sits_as_sf sits_as_stars sits_as_terra sits_bands sits_bbox
sits_classify sits_clean sits_cluster_clean sits_cluster_dendro
sits_cluster_frequency sits_colors sits_colors_qgis sits_colors_reset
sits_colors_set sits_colors_show sits_combine_predictions
sits_confidence_sampling sits_config sits_config_show
sits_config_user_file sits_cube sits_cube_copy sits_factory_function
sits_formula_linear sits_formula_logref sits_geo_dist sits_get_class
sits_get_data sits_get_probs sits_impute sits_kfold_validate
sits_label_classification sits_labels sits_labels_summary sits_lightgbm
sits_lighttae sits_list_collections sits_merge sits_mgrs_to_roi
sits_mixture_model sits_mlp sits_mlr sits_model_export sits_mosaic
sits_patterns sits_pred_features sits_pred_normalize
sits_pred_references sits_pred_sample sits_predictors sits_reclassify
sits_reduce sits_reduce_imbalance sits_regularize sits_resnet sits_rfor
sits_roi_to_mgrs sits_roi_to_tiles sits_run_examples sits_run_tests
sits_sample sits_sampling_design sits_segment sits_show_prediction
sits_slic sits_smooth sits_som_clean_samples sits_som_evaluate_cluster
sits_som_map sits_som_remove_samples sits_stats sits_stratified_sampling
sits_svm sits_tae sits_tempcnn sits_texture sits_tiles_to_roi
sits_timeline sits_timeseries_to_csv sits_to_csv sits_to_xlsx
sits_train sits_tuning sits_tuning_hparams sits_uncertainty
sits_uncertainty_sampling sits_validate sits_variance sits_view
sits_whittaker sits_xgboost
""".split()


def test_every_reference_export_is_bound():
    missing = [v for v in REF_EXPORTS if not hasattr(api, v)]
    assert missing == [], f"unbound reference exports: {missing}"
    # and each binding is callable or a module-level value, never None
    for v in REF_EXPORTS:
        assert getattr(api, v) is not None


# --- predictors family -------------------------------------------------------

def _samples_table(n=40, d=6, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    labels = np.array(["a", "b", "c", "d"])[np.arange(n) % 4]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "label": pa.array(labels),
            "embedding": pa.array([r.tolist() for r in X]),
        }
    ), X, labels


def test_predictors_shape_and_heads():
    t, X, labels = _samples_table()
    pred = api.sits_predictors(t)
    assert list(pred.columns[:2]) == ["label_id", "label"]
    assert pred.shape == (40, 2 + 6)
    # label_id = 1-based index into sorted distinct labels
    assert pred.loc[pred["label"] == "a", "label_id"].unique().tolist() == [1]
    assert pred.loc[pred["label"] == "d", "label_id"].unique().tolist() == [4]
    np.testing.assert_allclose(api.sits_pred_features(pred), X)
    assert (api.sits_pred_references(pred) == labels).all()


def test_stats_normalize_roundtrip():
    t, X, _ = _samples_table()
    pred = api.sits_predictors(t)
    stats = api.sits_stats(pred)
    assert stats["q02"].shape == (6,)
    norm = api.sits_pred_normalize(pred, stats)
    Xn = api.sits_pred_features(norm)
    # normalize_minmax maps q02 -> 0, q98 -> 1, clamped to [1e-4, 1]
    # (reference src/normalize_data.cpp:10-20)
    j = 2
    expect = (X[:, j] - stats["q02"][j]) / (stats["q98"][j] - stats["q02"][j])
    np.testing.assert_allclose(Xn[:, j], np.clip(expect, 0.0001, 1.0))
    # categorical head untouched
    assert (norm["label"] == pred["label"]).all()


def test_pred_sample_deterministic_and_per_label():
    t, _, _ = _samples_table(n=400)
    pred = api.sits_predictors(t)
    s1 = api.sits_pred_sample(pred, 0.5)
    s2 = api.sits_pred_sample(pred, 0.5)
    pd.testing.assert_frame_equal(s1, s2)  # no RNG
    assert 0.3 < len(s1) / len(pred) < 0.7
    sub = api.sits_pred_sample(pred, 0.25)
    assert set(sub.index) <= set(s1.index) or True  # monotone threshold:
    # hash < 250k implies hash < 500k
    assert set(sub.index) <= set(s1.index)


def test_formula_linear_logref():
    pred = pd.DataFrame(
        {"label_id": [1, 2], "label": ["a", "b"],
         "x0": [1.0, np.e], "x1": [4.0, 2.0]}
    )
    np.testing.assert_allclose(
        api.sits_formula_linear()(pred), [[1.0, 4.0], [np.e, 2.0]]
    )
    np.testing.assert_allclose(
        api.sits_formula_logref()(pred)[1, 0], 1.0
    )
    np.testing.assert_allclose(
        api.sits_formula_linear(predictors_index=[1])(pred), [[4.0], [2.0]]
    )
    bad = pred.assign(x0=[-1.0, 1.0])
    with pytest.raises(ValueError):
        api.sits_formula_logref()(bad)


def test_factory_function_both_arms():
    assert api.sits_factory_function(None, abs) is abs
    assert api.sits_factory_function(-3, abs) == 3


def test_tuning_hparams_wraps_constants():
    hp = api.sits_tuning_hparams(lr=0.5, hidden=api.sits_formula_linear)
    rng = np.random.default_rng(0)
    assert hp["lr"](rng) == 0.5
    assert callable(hp["hidden"])


# --- colors ------------------------------------------------------------------

def test_colors_deterministic_override_reset():
    api.sits_colors_reset()
    c1 = api.sits_colors(["Forest", "Water"])
    c2 = api.sits_colors(["Forest", "Water"])
    assert c1 == c2 and all(v.startswith("#") and len(v) == 7 for v in c1.values())
    assert c1["Forest"] != c1["Water"]
    api.sits_colors_set({"Forest": "#00ff00"})
    assert api.sits_colors(["Forest"])["Forest"] == "#00FF00"
    show = api.sits_colors_show(["Forest", "Water"])
    assert show.loc[show.label == "Forest", "source"].item() == "user"
    api.sits_colors_reset()
    assert api.sits_colors(["Forest"]) == {"Forest": c1["Forest"]}
    with pytest.raises(ValueError):
        api.sits_colors_set({"x": "green"})


def test_colors_qgis_xml(tmp_path):
    api.sits_colors_reset()
    xml = api.sits_colors_qgis(["a", "b"], path=str(tmp_path / "style.xml"))
    assert 'value="1"' in xml and 'label="b"' in xml
    assert (tmp_path / "style.xml").read_text() == xml


# --- grid / roi --------------------------------------------------------------

def test_grid_roundtrip_and_partition_tie():
    roi = api.sits_mgrs_to_roi("T064-007")
    assert roi["lo"] < roi["hi"]
    tiles = api.sits_roi_to_tiles(roi, n=64)
    assert tiles == ["T064-007"]
    # a coarser grid covers the same interval with one parent tile
    assert api.sits_roi_to_tiles(roi, n=8) == ["T008-000"]
    span = api.sits_tiles_to_roi(["T064-007", "T064-009"])
    assert span["lo"] == roi["lo"] and span["hi"] > roi["hi"]
    assert api.sits_roi_to_mgrs(roi)  # 60-zone default grid non-empty

    from sits_ray.grid import roi_filter_ids, tiles_of_ids
    from sits_ray.stages.hashagg import part_of_values

    ids = np.arange(5000, dtype=np.int64)
    tiles_idx = tiles_of_ids(ids, n=16)
    assert tiles_idx.min() >= 0 and tiles_idx.max() < 16
    # every id lands in exactly the tile whose interval contains it
    inside = roi_filter_ids(ids, api.sits_mgrs_to_roi("T016-003"))
    assert (tiles_idx[inside] == 3).all() and (tiles_idx[~inside] != 3).all()
    # tile grid uses the SAME mixer as the engine partitioner (mod form)
    assert (part_of_values(ids, 1 << 30) >= 0).all()

    with pytest.raises(ValueError):
        api.sits_mgrs_to_roi("X1")
    with pytest.raises(ValueError):
        api.sits_tiles_to_roi([])


# --- thin dataset verbs ------------------------------------------------------

def _scored_ds():
    n = 60
    rng = np.random.default_rng(7)
    probs = rng.dirichlet([1, 1, 1], size=n)
    order = np.argsort(probs, axis=1)
    margin = 1.0 - (probs[np.arange(n), order[:, -1]]
                    - probs[np.arange(n), order[:, -2]])  # uncertainty form
    ent = -(probs * np.log(probs)).sum(axis=1)
    lab = np.array(["l0", "l1", "l2"])[probs.argmax(axis=1)]
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "pred_label": lab,
         "entropy": ent, "margin": margin,
         "prob_l0": probs[:, 0], "prob_l1": probs[:, 1],
         "prob_l2": probs[:, 2]}
    )
    return rd.from_pandas(df), df


def test_uncertainty_dispatch():
    p = np.array([[0.7, 0.2, 0.1], [1 / 3, 1 / 3, 1 / 3]])
    e = api.sits_uncertainty(p, "entropy")
    assert e[1] > e[0]
    m = api.sits_uncertainty(p, "margin")  # 1-(p1-p2): higher = more uncertain
    assert m[0] < m[1]
    api.sits_uncertainty(p, "least")
    with pytest.raises(ValueError):
        api.sits_uncertainty(p, "nope")


def test_uncertainty_and_confidence_sampling():
    ds, df = _scored_ds()
    top = api.sits_uncertainty_sampling(ds, n=5)
    want = df.sort_values(["entropy", "vec_id"], ascending=[False, True]).head(5)
    assert set(top["vec_id"]) == set(want["vec_id"])
    conf = api.sits_confidence_sampling(ds, n=3)
    for lab, g in df.groupby("pred_label"):
        want_ids = set(g.sort_values("margin").head(3)["vec_id"])
        got_ids = set(conf.loc[conf["pred_label"] == lab, "vec_id"])
        assert got_ids == want_ids


def test_geo_dist_shapes():
    rng = np.random.default_rng(1)
    X, Y = rng.normal(size=(30, 4)), rng.normal(size=(20, 4)) + 5.0
    d = api.sits_geo_dist(X, Y)
    ss = d[d["type"] == "sample-to-sample"]["distance"]
    sp = d[d["type"] == "sample-to-prediction"]["distance"]
    assert len(ss) == 30 and len(sp) == 30
    assert sp.mean() > ss.mean()  # Y is far away by construction


def test_get_data_class_probs_timeline_bbox():
    ds, df = _scored_ds()
    got = api.sits_get_data(ds, [3, 5], key_col="vec_id").to_pandas()
    assert sorted(got["vec_id"]) == [3, 5]
    cls = api.sits_get_class(ds, [3], id_col="vec_id").to_pandas()
    assert list(cls.columns) == ["vec_id", "pred_label"]
    pr = api.sits_get_probs(ds, [3], id_col="vec_id").to_pandas()
    assert "prob_l0" in pr.columns

    tl_ds = rd.from_pandas(pd.DataFrame(
        {"bucket_ts": [30, 10, 20, 10], "user_id": ["b", "a", "c", "a"],
         "ts": [4, 1, 9, 2]}))
    assert api.sits_timeline(tl_ds) == [10, 20, 30]
    box = api.sits_bbox(tl_ds, ts_col="ts", key_col="user_id")
    assert box == {"t0": 1, "t1": 9, "key_min": "a", "key_max": "c"}


def test_merge_and_add_base_cube():
    a = rd.from_pandas(pd.DataFrame(
        {"user_id": ["u1", "u2"], "bucket_ts": [1, 1], "va": [10.0, 20.0]}))
    b = rd.from_pandas(pd.DataFrame(
        {"user_id": ["u1", "u2"], "bucket_ts": [1, 2], "vb": [5.0, 6.0]}))
    m = api.sits_merge(a, b, num_partitions=2).to_pandas()
    assert len(m) == 1 and m["va"].item() == 10.0 and m["vb"].item() == 5.0

    base = pa.table({"user_id": ["u1", "u2"], "segment": ["s1", "s2"]})
    j = api.sits_add_base_cube(a, base, on="user_id").to_pandas()
    assert sorted(j["segment"]) == ["s1", "s2"]


def test_patterns_label_means():
    t, X, labels = _samples_table(n=40)
    ds = rd.from_arrow(t)
    pat = api.sits_patterns(ds)
    assert list(pat["label"]) == ["a", "b", "c", "d"]
    np.testing.assert_allclose(
        np.asarray(pat.loc[pat.label == "a", "pattern"].item()),
        X[labels == "a"].mean(axis=0), rtol=1e-12,
    )


def test_variance_clean_impute_view_over_nested():
    # nested tier rows: one conv, explicit per-step arrays
    vals = np.array([1.0, 1.0, 9.0, np.nan, 5.0, 5.0])
    t = pa.table(
        {
            "conv_id": pa.array(["c1"]),
            "tier": pa.array(["1h"]),
            "bucket_ts": pa.array([list(range(6))], pa.list_(pa.int64())),
            "mean_latency": pa.array([vals.tolist()], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t)
    # sits_filter emits LONG rows (one per time step)
    v = api.sits_variance(ds, window_size=3).to_pandas()
    assert "mean_latency_var" in v.columns and len(v) == 6
    imp = api.sits_impute(ds).to_pandas().sort_values("bucket_ts")
    filled = imp["mean_latency_imputed"].to_numpy()
    assert not np.isnan(filled).any() and filled[3] == pytest.approx(7.0)

    lab = pa.table(
        {
            "conv_id": pa.array(["c1"]),
            "tier": pa.array(["1h"]),
            "bucket_ts": pa.array([list(range(5))], pa.list_(pa.int64())),
            "label_code": pa.array([[1.0, 1.0, 2.0, 1.0, 1.0]],
                                   pa.list_(pa.float64())),
        }
    )
    cl = api.sits_clean(rd.from_arrow(lab), window_size=3).to_pandas()
    cl = cl.sort_values("bucket_ts")
    assert cl["label_code_clean"].to_numpy()[2] == 1.0  # speckle removed

    view = api.sits_view(ds, n_out=4).to_pandas()
    assert {"conv_id", "bucket_ts", "value"} <= set(view.columns)
    assert len(view) <= 6


def test_as_stars_and_as_sf():
    long = rd.from_pandas(pd.DataFrame(
        {"conv_id": ["a", "a", "b"], "bucket_ts": [1, 2, 1],
         "mean_latency": [1.0, 2.0, 3.0]}))
    grid = api.sits_as_stars(long)
    assert grid["values"].shape == (2, 2)
    assert grid["values"][0, 0] == 1.0 and np.isnan(grid["values"][1, 1])
    assert api.sits_as_terra is api.sits_as_stars

    pts = rd.from_pandas(pd.DataFrame({"x": [0.0], "y": [1.0], "v": [2]}))
    df = api.sits_as_sf(pts)
    assert list(df["x"]) == [0.0]
    with pytest.raises(ValueError):
        api.sits_as_sf(pts, x_col="lon")


def test_labels_summary_and_accuracy_summary():
    ds, df = _scored_ds()
    summ = api.sits_labels_summary(ds, label_col="pred_label")
    want = df["pred_label"].value_counts()
    got = dict(zip(summ["label"], summ["n"]))
    assert got == want.to_dict()
    assert summ["frac"].sum() == pytest.approx(1.0)

    from sits_ray.kernels.ml import accuracy_metrics, confusion_matrix

    acc = accuracy_metrics(confusion_matrix(
        np.array([0, 1, 1, 0]), np.array([0, 1, 0, 0]), 2))
    tab = api.sits_accuracy_summary(acc)
    assert tab.loc[tab.metric == "overall_accuracy", "value"].item() == 0.75
    assert (tab.metric == "producers_accuracy").sum() == 2


def test_show_prediction_and_timeseries_csv(tmp_path):
    ds, _ = _scored_ds()
    shown = api.sits_show_prediction(ds, n=4)
    assert len(shown) == 4 and "prob_l1" in shown.columns

    t = pa.table(
        {
            "conv_id": pa.array(["c1"]),
            "tier": pa.array(["1h"]),
            "bucket_ts": pa.array([[0, 1]], pa.list_(pa.int64())),
            "mean_latency": pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
        }
    )
    out = api.sits_timeseries_to_csv(rd.from_arrow(t), str(tmp_path / "ts"))
    import glob

    files = glob.glob(out + "/*.csv")
    assert files and "conv_id" in open(files[0]).read()


def test_config_surface():
    cfg = api.sits_config()
    shown = api.sits_config_show(cfg)
    assert '"flagship"' in shown
    path = api.sits_config_user_file()
    assert path.endswith(".json") or "/" in path


def test_run_tests_collect_only_and_examples():
    assert api.sits_run_tests(collect_only=True) == 0
    res = api.sits_run_examples(names=("label_distribution",))
    assert res["rows"].item() > 0 and res["sec"].item() > 0


def test_lighttae_and_lightgbm_are_real_factories():
    rng = np.random.default_rng(0)
    X = np.vstack([rng.normal(0, 1, (20, 8)), rng.normal(3, 1, (20, 8))])
    y = np.array(["a"] * 20 + ["b"] * 20, dtype=object)
    from sits_ray.stages.train import predict_probs, train

    for factory in (api.sits_lighttae(iters=60), api.sits_lightgbm(n_rounds=10)):
        model = train(X, y, ml_method=factory)
        acc = (np.asarray(model["labels"], dtype=object)[
            predict_probs(model, X).argmax(axis=1)] == y).mean()
        assert acc > 0.9


def test_view_table_downsample_pivot():
    """sits_view_table: LTTB downsample -> wide pivot, one column per
    series, NaN where a series has no picked point (the headless
    plot-data verb)."""
    t = pa.table({
        "conv_id": pa.array(["a", "b"]),
        "tier": pa.array(["1h", "1h"]),
        "bucket_ts": pa.array([list(range(10)), [0, 5]],
                              pa.list_(pa.int64())),
        "mean_latency": pa.array(
            [[float(i) for i in range(10)], [7.0, 8.0]],
            pa.list_(pa.float64())),
    })
    out = api.sits_view_table(rd.from_arrow(t), n_out=4)
    assert list(out.columns) == ["bucket_ts", "a", "b"]
    # timestamps come back as datetime64[us]; compare on the us value
    us = out["bucket_ts"].astype("datetime64[us]").astype("int64")
    # series a: <= 4 picked points incl. first and last
    a = out["a"].dropna()
    assert 2 <= len(a) <= 4
    assert out.loc[us == 0, "a"].iloc[0] == 0.0
    assert out.loc[us == 9, "a"].iloc[0] == 9.0
    # series b passes through whole (2 <= n_out), NaN elsewhere
    b = out["b"].to_numpy()
    assert b[(us == 0).to_numpy()][0] == 7.0
    assert b[(us == 5).to_numpy()][0] == 8.0
    import numpy as _np
    assert _np.isnan(b[((us != 0) & (us != 5)).to_numpy()]).all()
