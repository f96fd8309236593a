"""Unit tests for core geometry / tiling / rng (no Ray pipelines)."""

import math

import numpy as np

from whitebox_geospatial_analysis_tools_ray.core import geom, rng, tiles


def test_geocode_deterministic_and_in_extent():
    ids = np.arange(10000)
    x, y = rng.geocode_xy(ids)
    x2, y2 = rng.geocode_xy(ids)
    assert (x == x2).all() and (y == y2).all()
    assert (x >= rng.WEST).all() and (x < rng.EAST).all()
    assert (y >= rng.SOUTH).all() and (y < rng.NORTH).all()


def test_geocode_matches_sql_expression():
    import duckdb
    ids = np.arange(5000)
    x, y = rng.geocode_xy(ids)
    xs, ys = rng.geocode_sql("i")
    df = duckdb.sql(
        f"SELECT {xs} AS x, {ys} AS y FROM range(0, 5000) t(i)").fetchdf()
    assert (df["x"].to_numpy() == x).all()
    assert (df["y"].to_numpy() == y).all()


def test_rect_grid_matches_reference_rule():
    # TileLasFile.groovy:120-176 worked example
    g = tiles.RectGrid.from_extent(10.0, 20.0, 990.0, 740.0,
                                   origin_x=0.0, origin_y=0.0,
                                   width_x=250.0, width_y=250.0)
    assert g.start_x == 0 and g.start_y == 0
    assert g.cols == 4 and g.rows == 3
    t = g.tile_of(np.array([10.0, 260.0, 989.0]), np.array([20.0, 300.0, 739.0]))
    assert list(t) == [0, 1 * 4 + 1, 2 * 4 + 3]


def test_hex_assignment_matches_nearest_center_bruteforce():
    g = tiles.HexGrid(minx=0.0, maxy=1000.0, extent_w=1000.0,
                      extent_h=1000.0, width=100.0)
    # enumerate all centers exactly as HexBinning.groovy:166-188
    centers = []
    for row in range(g.n_rows):
        cy = g.cy0 - row * g.tq_height
        ncol = g.cols_in_row(row)
        for col in range(ncol):
            cx = (g.cx0 - g.half_width * (row % 2)) + col * g.width
            centers.append((cx, cy))
    centers = np.array(centers)
    rs = np.random.default_rng(7)
    x = rs.uniform(0, 1000, 2000)
    y = rs.uniform(0, 1000, 2000)
    d2 = (x[:, None] - centers[None, :, 0]) ** 2 + (y[:, None] - centers[None, :, 1]) ** 2
    brute = d2.argmin(axis=1)
    fast = g.hex_of(x, y)
    assert (brute == fast).all()


def test_row_start_index_matches_enumeration():
    g = tiles.HexGrid(minx=0.0, maxy=1000.0, extent_w=1000.0,
                      extent_h=1000.0, width=100.0)
    acc = 0
    for row in range(g.n_rows):
        assert g.row_start_index(np.array([row]))[0] == acc
        acc += g.cols_in_row(row)


def test_pip_even_odd_with_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)[::-1]  # CW
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7]], dtype=float)  # CCW
    poly = geom.Polygon([shell, hole])
    x = np.array([5.0, 1.0, 11.0, 3.5])
    y = np.array([5.0, 1.0, 5.0, 5.0])
    res = geom.points_in_polygon(x, y, poly)
    assert list(res) == [False, True, False, False]


def test_triangle_pip_matches_sql():
    import duckdb
    t = dict(ax=0.0, ay=0.0, bx=10.0, by=0.0, cx=5.0, cy=10.0)
    rs = np.random.default_rng(3)
    x = rs.uniform(-2, 12, 500)
    y = rs.uniform(-2, 12, 500)
    mine = geom.points_in_triangle(x, y, **t)
    pred = geom.triangle_pip_sql("x", "y", t["ax"], t["ay"], t["bx"],
                                 t["by"], t["cx"], t["cy"])
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"x": x, "y": y}))
    sql = con.execute(f"SELECT {pred} AS hit FROM pts").fetchdf()["hit"].to_numpy()
    assert (mine == sql).all()


def test_wkb_roundtrip():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    poly = geom.Polygon([ring])
    kind, parsed = geom.parse_wkb(geom.wkb_polygon(poly))
    assert kind == "polygon"
    assert np.allclose(parsed.rings[0], ring)
    kind, (x, y) = geom.parse_wkb(geom.wkb_point(1.5, -2.5))
    assert kind == "point" and x == 1.5 and y == -2.5


def test_convex_hull_and_area():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1]], dtype=float)
    hull = geom.convex_hull(pts)
    assert len(hull) == 4
    cw_ring = np.array([[0, 0], [0, 2], [2, 2], [2, 0]], dtype=float)
    assert geom.is_clockwise(cw_ring)
    assert geom.polygon_area(geom.Polygon([cw_ring])) == 4.0


def test_clip_convex_rect():
    tri = np.array([[-5, 1], [5, 1], [0, 8]], dtype=float)
    rect = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)  # CCW
    clipped = geom.clip_convex(tri, rect)
    assert (clipped[:, 0] >= 0).all()
    # area preserved on the kept side
    a = abs(geom.signed_area(clipped))
    assert 0 < a < abs(geom.signed_area(tri))


def test_salted_shuffle_join_matches_unsalted(ray_session):
    """Hot-cell salting must not change the join result (SURVEY §7.5 #5)."""
    from whitebox_geospatial_analysis_tools_ray.core.features import rect_zones
    from whitebox_geospatial_analysis_tools_ray.stages.points import read_points
    from whitebox_geospatial_analysis_tools_ray.stages.spatial_join import (
        cell_partitioned_pip_join)

    def run(salt):
        return (cell_partitioned_pip_join(
            read_points("/root/testdata/sf0.001"), rect_zones(), salt=salt)
            .to_pandas().sort_values(["rec_id", "zone_id"])
            .reset_index(drop=True))

    import pandas as pd
    pd.testing.assert_frame_equal(run(1), run(4))


def test_azimuth_between_points_matches_script_rule():
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.core.geom import (
        azimuth_between_points)

    assert azimuth_between_points(0, 0, 0, 1) == 0.0      # due north
    assert azimuth_between_points(0, 0, 1, 0) == 90.0     # due east
    assert azimuth_between_points(0, 0, 0, -1) == 180.0
    assert azimuth_between_points(0, 0, -1, 0) == 270.0
    a = azimuth_between_points(np.zeros(4), np.zeros(4),
                               np.array([1.0, 1, -1, -1]),
                               np.array([1.0, -1, -1, 1]))
    assert np.allclose(a, [45.0, 135.0, 225.0, 315.0])
