"""USGS/CDED DEM text roundtrip through byte-range profile reads."""

import numpy as np
import pytest

from whitebox_geospatial_analysis_tools_ray.sources import dem
from whitebox_geospatial_analysis_tools_ray.sources.grids import WHITEBOX_NODATA
from whitebox_geospatial_analysis_tools_ray.sources.raster_io import RasterHeader


def test_dem_roundtrip(tmp_path, ray_session):
    g = np.random.default_rng(21)
    rows, cols = 53, 41
    grid = g.integers(-400, 3000, (rows, cols)).astype(np.float64)
    grid[g.uniform(size=(rows, cols)) < 0.05] = WHITEBOX_NODATA
    hdr = RasterHeader(rows=rows, cols=cols, north=46.0, south=45.0,
                       east=-71.0, west=-72.0)
    p = str(tmp_path / "t.dem")
    dem.write_dem(p, hdr, grid)

    hdr2 = dem.read_dem_header(p)
    assert (hdr2.rows, hdr2.cols) == (rows, cols)
    assert hdr2.west == pytest.approx(hdr.west)
    assert hdr2.north == pytest.approx(hdr.north)

    _, tiles = dem.import_dem(p, tile_rows=16, cols_per_task=13)
    frames = tiles.to_pandas().sort_values("tile_id")
    got = np.vstack([np.asarray(r.data).reshape(-1, cols)
                     for r in frames.itertuples()])
    np.testing.assert_array_equal(got, grid)
