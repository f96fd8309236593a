"""Banded in-place thinning/spur-removal == literal reference mirrors."""

import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import thinning as th
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec


def test_line_thinning_matches_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = th.line_thinning(spec)
    want = th.line_thinning_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    assert 0 < got["n_foreground"].sum()


def test_remove_spurs_matches_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = th.remove_spurs(spec)
    want = th.remove_spurs_naive(spec)
    pd.testing.assert_frame_equal(got, want)


def test_thinning_tiling_invariant(ray_session):
    a = th.line_thinning(RasterSpec(rows=96, cols=64, tile_rows=16))
    b = th.line_thinning(RasterSpec(rows=96, cols=64, tile_rows=48))
    pd.testing.assert_frame_equal(a, b)


def test_find_ridges_matches_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = th.find_ridges(spec)
    want = th.find_ridges_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    assert got["n_foreground"].sum() > 0


def test_find_ridges_tiling_invariant(ray_session):
    a = th.find_ridges(RasterSpec(rows=96, cols=64, tile_rows=16))
    b = th.find_ridges(RasterSpec(rows=96, cols=64, tile_rows=48))
    pd.testing.assert_frame_equal(a, b)


def test_thicken_line_matches_naive_and_tiling_invariant(ray_session):
    import pandas as pd

    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec
    from whitebox_geospatial_analysis_tools_ray.stages.thinning import (
        thicken_line, thicken_line_naive)

    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = thicken_line(spec).reset_index(drop=True)
    want = thicken_line_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    alt = thicken_line(RasterSpec(rows=96, cols=96, tile_rows=16)) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(alt, want)
    assert int(got["n_foreground"].sum()) > 0
