"""Vector IO (sits_ray/vector.py): shp/dbf round-trips, polygon parsing,
point-in-polygon with holes, streaming ROI filter."""

import numpy as np
import pandas as pd
import pytest

from sits_ray.vector import (
    points_in_polygon,
    read_dbf,
    read_shapefile_points,
    read_shp,
    roi_filter,
    write_dbf,
    write_shp_points,
    write_shp_polygon,
)


def test_shp_point_round_trip(tmp_path):
    xs = np.array([0.5, -3.25, 1e6])
    ys = np.array([1.5, 2.0, -7.125])
    p = write_shp_points(str(tmp_path / "pts.shp"), xs, ys)
    back = read_shp(p)
    assert back["shape_type"] == 1
    np.testing.assert_array_equal([r["x"] for r in back["records"]], xs)
    np.testing.assert_array_equal([r["y"] for r in back["records"]], ys)
    assert back["bbox"] == (-3.25, -7.125, 1e6, 2.0)


def test_shp_polygon_round_trip_with_hole(tmp_path):
    outer = (np.array([0.0, 10, 10, 0]), np.array([0.0, 0, 10, 10]))
    hole = (np.array([4.0, 6, 6, 4]), np.array([4.0, 4, 6, 6]))
    p = write_shp_polygon(str(tmp_path / "poly.shp"), [outer, hole])
    back = read_shp(p)
    assert back["shape_type"] == 5
    rings = back["records"][0]["rings"]
    assert len(rings) == 2
    np.testing.assert_array_equal(rings[0][0][:-1], outer[0])
    np.testing.assert_array_equal(rings[1][1][:-1], hole[1])


def test_dbf_round_trip(tmp_path):
    df = pd.DataFrame({"conv_id": ["c1", "c2"], "label": ["crop", "forest"],
                       "n": [3, 42], "w": [0.5, 1.25]})
    p = write_dbf(str(tmp_path / "a.dbf"), df)
    back = read_dbf(p)
    assert back["CONV_ID"].tolist() == ["c1", "c2"]
    assert back["N"].tolist() == [3, 42]
    assert back["W"].tolist() == [0.5, 1.25]


def test_read_shapefile_points_with_attrs(tmp_path):
    base = str(tmp_path / "samples")
    write_shp_points(base + ".shp", [1.0, 2.0], [3.0, 4.0])
    write_dbf(base + ".dbf", pd.DataFrame({"label": ["a", "b"]}))
    got = read_shapefile_points(base)
    assert got["LABEL"].tolist() == ["a", "b"]
    assert got["x"].tolist() == [1.0, 2.0]


def test_points_in_polygon_hole_and_edges():
    square = (np.array([0.0, 10, 10, 0]), np.array([0.0, 0, 10, 10]))
    hole = (np.array([4.0, 6, 6, 4]), np.array([4.0, 4, 6, 6]))
    px = np.array([5.0, 5.0, -1.0, 2.0, 11.0, 5.0])
    py = np.array([2.0, 5.0, 5.0, 5.0, 5.0, 4.5])
    got = points_in_polygon(px, py, [square, hole])
    #            in, in-hole, out, in, out, in-hole(y between 4 and 6? x=5 in)
    assert got.tolist() == [True, False, False, True, False, False]
    # brute-force parity on a random cloud vs single-ring crossing count
    rng = np.random.default_rng(3)
    qx, qy = rng.uniform(-2, 12, 500), rng.uniform(-2, 12, 500)
    got = points_in_polygon(qx, qy, [square])
    exp = (qx >= 0) & (qx < 10) & (qy >= 0) & (qy < 10)  # axis-aligned square
    # boundary-free points (none are exactly on the edge) must agree
    assert (got == exp).all()


def test_roi_filter_streaming(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"x": rng.uniform(0, 10, 400),
                       "y": rng.uniform(0, 10, 400),
                       "v": np.arange(400)})
    tri = (np.array([0.0, 10.0, 0.0]), np.array([0.0, 0.0, 10.0]))
    shp = read_shp(write_shp_polygon(str(tmp_path / "roi.shp"), [tri]))
    got = roi_filter(rd.from_pandas(df).repartition(4), shp).to_pandas()
    exp = df[points_in_polygon(df["x"], df["y"], [tri])]
    assert sorted(got["v"]) == sorted(exp["v"])
    assert len(got) > 50  # triangle is half the square
