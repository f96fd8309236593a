"""Distributed banded-wavefront viewshed == literal reference mirror."""

import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import viewshed as vs
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec


def test_viewshed_matches_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = vs.viewshed(spec)
    want = vs.viewshed_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    assert got["n_visible"].sum() > 0


def test_viewshed_tiling_invariant(ray_session):
    a = vs.viewshed(RasterSpec(rows=96, cols=80, tile_rows=16))
    b = vs.viewshed(RasterSpec(rows=96, cols=80, tile_rows=48))
    pd.testing.assert_frame_equal(a, b)


def test_viewshed_nonsquare(ray_session):
    spec = RasterSpec(rows=64, cols=112, tile_rows=32)
    got = vs.viewshed(spec)
    want = vs.viewshed_naive(spec)
    pd.testing.assert_frame_equal(got, want)


def test_visibility_index_matches_naive(ray_session):
    import pandas as pd

    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec
    from whitebox_geospatial_analysis_tools_ray.stages.viewshed import (
        visibility_index, visibility_index_naive)

    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    want = visibility_index_naive(spec)
    got = visibility_index(spec).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert float(want["index_sum"].sum()) > 0
