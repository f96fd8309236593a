"""Contour polyline assembly: distributed == mirror, exact stitching."""

import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import vectorize as vz
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec


def test_contour_polylines_match_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = vz.contour_polylines(spec).to_pandas().reset_index(drop=True)
    want = vz.contour_polylines_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_polylines"] > 0).all()
    assert (got["n_segments"] >= got["n_polylines"]).all()


def test_contour_polylines_tiling_invariant(ray_session):
    a = vz.contour_polylines(RasterSpec(rows=96, cols=64, tile_rows=16)) \
        .to_pandas().reset_index(drop=True)
    b = vz.contour_polylines(RasterSpec(rows=96, cols=64, tile_rows=48)) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_contour_length_consistent_with_lengths_query(ray_session):
    """Total length must agree with the additive per-tile reduction."""
    from whitebox_geospatial_analysis_tools_ray.stages.raster_stats import (
        contour_lengths)
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    asm = vz.contour_polylines(spec).to_pandas()
    red = contour_lengths(spec)
    m = asm.merge(red, on="level")
    assert len(m) == len(asm)
    assert (abs(m["total_length_x"] - m["total_length_y"]) < 1e-3).all()
