"""Distributed cost-distance == whole-grid Dijkstra mirror."""

import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import cost
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec


def test_cost_accumulation_matches_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = cost.cost_accumulation(spec)
    want = cost.cost_accumulation_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    assert got["n_reached"].sum() > 0


def test_cost_accumulation_tiling_invariant(ray_session):
    a = cost.cost_accumulation(RasterSpec(rows=96, cols=64, tile_rows=16))
    b = cost.cost_accumulation(RasterSpec(rows=96, cols=64, tile_rows=48))
    pd.testing.assert_frame_equal(a, b)
