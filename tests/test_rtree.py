"""Packed-Hilbert R-tree: curve bijectivity, candidate completeness vs
brute force, and join-output equality with the grid-index PIP join."""
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from whitebox_geospatial_analysis_tools_ray.core.rtree import (
    PackedHilbertRTree, hilbert_d)

SF = "/root/testdata/sf0.001"


def test_hilbert_bijective_order4():
    side = 16
    xx, yy = np.meshgrid(np.arange(side), np.arange(side))
    d = hilbert_d(4, xx.ravel(), yy.ravel())
    assert sorted(d.tolist()) == list(range(side * side))


def test_hilbert_locality_steps():
    """Consecutive d values are grid neighbours (the curve is
    continuous) — the property that makes the packing cache-friendly."""
    side = 32
    xx, yy = np.meshgrid(np.arange(side), np.arange(side))
    xs, ys = xx.ravel(), yy.ravel()
    d = hilbert_d(5, xs, ys)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert ((dx + dy) == 1).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 60), st.integers(0, 2**31 - 1))
def test_rtree_candidates_complete(n_boxes, seed):
    """Every (point, box) bbox containment appears in query_points —
    the tree may only over-approximate, never miss."""
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(0, 100, n_boxes)
    y0 = rng.uniform(0, 100, n_boxes)
    boxes = np.c_[x0, y0, x0 + rng.uniform(0, 30, n_boxes),
                  y0 + rng.uniform(0, 30, n_boxes)]
    px = rng.uniform(-10, 140, 200)
    py = rng.uniform(-10, 140, 200)
    tree = PackedHilbertRTree(boxes, fanout=4)
    prow, bid = tree.query_points(px, py)
    got = set(zip(prow.tolist(), bid.tolist()))
    want = {(i, j) for i in range(len(px)) for j in range(n_boxes)
            if boxes[j, 0] <= px[i] <= boxes[j, 2]
            and boxes[j, 1] <= py[i] <= boxes[j, 3]}
    assert want == got  # exact: leaf filter is the bbox predicate


def test_rtree_join_equals_grid_join(ray_session):
    from whitebox_geospatial_analysis_tools_ray.core.features import (
        seeded_polygons)
    from whitebox_geospatial_analysis_tools_ray.stages.points import (
        read_points)
    from whitebox_geospatial_analysis_tools_ray.stages.spatial_join import (
        broadcast_pip_join, rtree_pip_join)
    pts = read_points(SF)
    a = (broadcast_pip_join(pts, seeded_polygons()).to_pandas()
         .sort_values(["rec_id", "zone_id"]).reset_index(drop=True))
    b = (rtree_pip_join(pts, seeded_polygons()).to_pandas()
         .sort_values(["rec_id", "zone_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
