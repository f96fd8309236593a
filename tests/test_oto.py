import numpy as np
import pandas as pd


def test_cleave_peaks_2d_removes_isolated_peak():
    """A tower on a flat plane is cleaved to the plane and re-interpolated
    from its rim; a broad hill attached to the edge survives."""
    from whitebox_geospatial_analysis_tools_ray.stages import oto

    size = 9
    sub = np.full((size + 2, size + 2), -32768.0)
    core = np.full((size, size), 10.0)
    core[4, 4] = 50.0  # off-terrain tower
    sub[1:-1, 1:-1] = core
    oto.cleave_peaks_2d(sub, -32768.0, size, min_oto_height=1.0)
    out = sub[1:-1, 1:-1]
    assert out[4, 4] == 10.0  # IDW of the flat rim
    assert (out[np.abs(out - 10.0) > 1e-12] == out[4, 4]).all() or \
        np.allclose(out, 10.0)


def test_cleave_peaks_2d_keeps_shallow_hill():
    from whitebox_geospatial_analysis_tools_ray.stages import oto

    size = 9
    sub = np.full((size + 2, size + 2), -32768.0)
    core = np.full((size, size), 10.0)
    # shallow cone: max height 10.6, neighbour steps < min_oto_height
    for r in range(size):
        for c in range(size):
            core[r, c] = 10.0 + max(0.0, 0.2 * (4 - max(abs(r - 4),
                                                        abs(c - 4))))
    sub[1:-1, 1:-1] = core.copy()
    oto.cleave_peaks_2d(sub, -32768.0, size, min_oto_height=1.0)
    # lowered by < minOTOHeight everywhere → flag 2 → input untouched
    assert np.array_equal(sub[1:-1, 1:-1], core)


def test_cleave_peaks_1d_trims_line_peak():
    from whitebox_geospatial_analysis_tools_ray.stages import oto

    size = 7
    data = np.full(size + 2, -32768.0)
    data[1:-1] = [5.0, 5.0, 5.0, 30.0, 5.0, 5.0, 5.0]
    oto.cleave_peaks_1d(data, -32768.0, size, min_oto_height=1.0)
    assert data[4] == 5.0  # 2-NN IDW of the flat neighbours


def test_remove_oto_matches_naive(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import oto
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    spec = RasterSpec(rows=64, cols=64, tile_rows=32)
    got = oto.remove_off_terrain_objects(spec)
    want = oto.remove_off_terrain_objects_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    # the pass must have lowered something on the noise DEM
    from whitebox_geospatial_analysis_tools_ray.stages.raster import synth_value
    z = synth_value(np.arange(spec.rows * spec.cols,
                              dtype=np.int64)).reshape(spec.rows, spec.cols)
    valid = z != spec.nodata
    orig = np.where(valid, z, 0.0).sum()
    assert got["row_sum"].sum() < orig


def test_remove_oto_tiling_invariant(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import oto
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    a = oto.remove_off_terrain_objects(RasterSpec(rows=64, cols=96,
                                                  tile_rows=32))
    b = oto.remove_off_terrain_objects(RasterSpec(rows=64, cols=96,
                                                  tile_rows=16))
    pd.testing.assert_frame_equal(a, b)
