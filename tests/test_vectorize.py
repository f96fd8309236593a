"""RasterToVectorPolygons: distributed edge-shuffle assembly == mirror,
and ring areas exactly tile the class cell counts."""

import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import vectorize as vz
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec


def test_polygons_match_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = vz.raster_to_polygons(spec).to_pandas().reset_index(drop=True)
    want = vz.raster_to_polygons_naive(spec)
    pd.testing.assert_frame_equal(got, want)


def test_polygon_areas_equal_cell_counts(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = vz.raster_to_polygons(spec).to_pandas()
    counts = vz.class_cell_counts(spec)
    merged = got.merge(counts, on="value")
    assert len(merged) == len(got)
    assert (merged["area"] == merged["n_cells"]).all()
    assert (got["n_rings"] >= 1).all()
    assert (got["perimeter"] > 0).all()


def test_polygons_tiling_invariant(ray_session):
    a = vz.raster_to_polygons(RasterSpec(rows=96, cols=64, tile_rows=16)) \
        .to_pandas().reset_index(drop=True)
    b = vz.raster_to_polygons(RasterSpec(rows=96, cols=64, tile_rows=48)) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_raster_to_vector_lines_mirror_and_tiling(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import vectorize
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    a = vectorize.raster_to_vector_lines()
    assert len(a) > 100                       # the synthetic grid has lines
    assert (a["n_points"] >= 2).all()
    b = vectorize.raster_to_vector_lines_naive()
    assert a.equals(b)                        # literal mirror
    c = vectorize.raster_to_vector_lines(RasterSpec(tile_rows=37))
    assert a.equals(c)                        # band size cannot matter
