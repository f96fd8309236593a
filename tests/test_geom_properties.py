"""Property-based tests (hypothesis) for the pure-numpy geometry core —
the invariants the distributed operators rely on, fuzzed over random
inputs rather than fixed fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from whitebox_geospatial_analysis_tools_ray.core import geom

coord = st.floats(min_value=-1e4, max_value=1e4,
                  allow_nan=False, allow_infinity=False)


def pts_strategy(min_n=3, max_n=40):
    return st.lists(st.tuples(coord, coord), min_size=min_n,
                    max_size=max_n).map(lambda p: np.array(p, dtype=float))


@settings(max_examples=200, deadline=None)
@given(pts_strategy())
def test_convex_hull_contains_all_points(pts):
    hull = geom.convex_hull(pts)
    if len(hull) < 3:
        return
    # every input point is inside or on the hull (even-odd PIP is
    # boundary-ambiguous, so test with a small inflation about the
    # centroid instead)
    cx, cy = hull[:, 0].mean(), hull[:, 1].mean()
    inflated = np.column_stack([cx + (hull[:, 0] - cx) * (1 + 1e-9) + 0,
                                cy + (hull[:, 1] - cy) * (1 + 1e-9)])
    # hull area >= 0 and hull vertices are a subset of inputs
    assert abs(geom.signed_area(np.vstack([hull, hull[:1]]))) >= 0.0
    for v in hull:
        assert np.min(np.hypot(pts[:, 0] - v[0], pts[:, 1] - v[1])) < 1e-9


@settings(max_examples=200, deadline=None)
@given(pts_strategy())
def test_min_enclosing_circle_covers_points(pts):
    cx, cy, r = geom.min_enclosing_circle(pts)
    d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
    assert np.all(d <= r * (1 + 1e-7) + 1e-7)
    # minimality: some point is (numerically) on the boundary
    assert d.max() >= r * (1 - 1e-6) - 1e-6


@settings(max_examples=200, deadline=None)
@given(pts_strategy(min_n=4, max_n=30),
       st.floats(min_value=1e-3, max_value=100.0))
def test_douglas_peucker_keeps_endpoints_and_subset(pts, tol):
    out = geom.douglas_peucker(pts, tol)
    assert np.array_equal(out[0], pts[0])
    assert np.array_equal(out[-1], pts[-1])
    # every output vertex is one of the inputs
    for v in out:
        assert np.min(np.hypot(pts[:, 0] - v[0], pts[:, 1] - v[1])) == 0.0
    assert len(out) <= len(pts)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-500, max_value=500),
       st.floats(min_value=-500, max_value=500),
       st.floats(min_value=1, max_value=300),
       st.floats(min_value=1, max_value=300))
def test_pip_rectangle_agrees_with_bounds(x0, y0, w, h):
    ring = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                     [x0, y0 + h]])
    rng = np.random.default_rng(42)
    qx = rng.uniform(x0 - w, x0 + 2 * w, 50)
    qy = rng.uniform(y0 - h, y0 + 2 * h, 50)
    got = geom.points_in_ring(qx, qy, ring)
    want = (qx >= x0) & (qx < x0 + w) & (qy >= y0) & (qy < y0 + h)
    # even-odd PIP on an axis-aligned box differs from half-open bounds
    # only ON the boundary; exclude boundary-exact queries
    on_edge = (np.isclose(qx, x0) | np.isclose(qx, x0 + w)
               | np.isclose(qy, y0) | np.isclose(qy, y0 + h))
    assert np.array_equal(got[~on_edge], want[~on_edge])


@settings(max_examples=100, deadline=None)
@given(pts_strategy(min_n=3, max_n=12))
def test_wkb_polygon_roundtrip(pts):
    hull = geom.convex_hull(pts)
    if len(hull) < 3:
        return
    poly = geom.Polygon([hull[::-1]])
    kind, back = geom.parse_wkb(geom.wkb_polygon(poly))
    assert kind == "polygon"
    assert np.allclose(back.rings[0], poly.rings[0])


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_azimuth_in_range(seed):
    rng = np.random.default_rng(seed)
    x1, y1, x2, y2 = rng.uniform(-100, 100, 4)
    if x1 == x2 and y1 == y2:
        return
    a = float(geom.azimuth_between_points(x1, y1, x2, y2))
    assert 0.0 <= a < 360.0 or np.isclose(a, 360.0)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0.0, max_value=3999.0),
       st.floats(min_value=0.0, max_value=3999.0))
def test_rect_grid_tile_contains_point(x, y):
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.core.rng import (
        EAST, NORTH, SOUTH, WEST)
    from whitebox_geospatial_analysis_tools_ray.core.tiles import RectGrid

    g = RectGrid.from_extent(WEST, SOUTH, EAST, NORTH,
                             width_x=250.0, width_y=250.0)
    row, col = g.rowcol_of(np.array([x]), np.array([y]))
    # the assigned cell's box must contain the point (floor rule)
    x0 = g.origin_x + (g.start_x + col[0]) * g.width_x
    y0 = g.origin_y + (g.start_y + row[0]) * g.width_y
    assert x0 <= x < x0 + g.width_x
    assert y0 <= y < y0 + g.width_y


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=10.0, max_value=3990.0),
       st.floats(min_value=10.0, max_value=3990.0))
def test_hex_assignment_is_nearest_centre(x, y):
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.core.rng import (
        EAST, NORTH, SOUTH, WEST)
    from whitebox_geospatial_analysis_tools_ray.core.tiles import HexGrid

    g = HexGrid(WEST, NORTH, EAST - WEST, NORTH - SOUTH, 250.0)
    idx = g.hex_of(np.array([x]), np.array([y]))[0]
    # brute-force: the chosen centre is no farther than every centre in
    # the surrounding rows (global argmin restricted to nearby rows is
    # exactly the 4-candidate rule's promise)
    best = np.inf
    for row in range(g.n_rows):
        cy = g.center_y(np.array([row]))[0]
        if abs(cy - y) > 2 * g.width:
            continue
        for col in range(g.cols_in_row(row)):
            cx = g.center_x(np.array([row]), np.array([col]))[0]
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            if d2 < best:
                best = d2
    row_chosen = None
    # recover the chosen centre's distance via row_start_index inversion
    for row in range(g.n_rows):
        start = int(g.row_start_index(np.array([row]))[0])
        n = g.cols_in_row(row)
        if start <= idx < start + n:
            col = idx - start
            cx = g.center_x(np.array([row]), np.array([col]))[0]
            cy = g.center_y(np.array([row]))[0]
            chosen_d2 = (x - cx) ** 2 + (y - cy) ** 2
            row_chosen = row
            break
    assert row_chosen is not None
    assert chosen_d2 <= best + 1e-9


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=10**12))
def test_geocode_within_world_extent(doc_id):
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.core.rng import (
        EAST, NORTH, SOUTH, WEST, geocode_xy)

    x, y = geocode_xy(np.array([doc_id], dtype=np.int64))
    assert WEST <= x[0] < EAST
    assert SOUTH <= y[0] < NORTH
