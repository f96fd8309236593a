import numpy as np
import pandas as pd


def test_breach_pit_carves_through_barrier():
    """A pit one barrier away from lower ground gets a carved channel
    cascading previousZ − aSmallValue."""
    from whitebox_geospatial_analysis_tools_ray.stages import breach

    g = np.tile(np.arange(11, dtype=np.float64) * 0.5 + 10.0, (11, 1))
    g[:, 0:5] = 8.0   # lower ground to the west, beyond...
    g[:, 5] = 12.5    # ...a barrier column
    g[5, 6] = 9.0     # the pit, one barrier away from lower ground
    lnd = np.abs(np.arange(7) - 3)
    lnd = (lnd[None, :] + lnd[:, None]) * 1e-3
    before = g.copy()
    carved = breach.breach_pit(g, 5, 6, -32768.0, 3, 1e-3, lnd)
    assert carved
    # the path west was lowered below the pit in small decrements
    ch = np.nonzero(g != before)
    assert len(ch[0]) > 0
    assert (g[ch] < 9.0).all()


def test_breach_pit_unsolved_without_sources():
    from whitebox_geospatial_analysis_tools_ray.stages import breach

    g = np.full((11, 11), 10.0)
    g[5, 5] = 1.0  # deep pit, nothing lower in range
    lnd = np.abs(np.arange(7) - 3)
    lnd = (lnd[None, :] + lnd[:, None]) * 1e-3
    before = g.copy()
    assert not breach.breach_pit(g, 5, 5, -32768.0, 3, 1e-3, lnd)
    assert np.array_equal(g, before)


def test_components_split_distant_pits():
    from whitebox_geospatial_analysis_tools_ray.stages.breach import _components

    pits = [(10, 10), (10, 15), (100, 100)]
    comps = _components(pits, max_dist=5)
    assert sorted(map(len, comps)) == [1, 2]


def test_breach_depressions_matches_naive(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import breach
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = breach.breach_depressions(spec)
    want = breach.breach_depressions_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    # something was actually carved
    g = breach._grid_rows(spec, 0, spec.rows)
    ok = g != spec.nodata
    orig = np.round(np.where(ok, g, 0.0).sum(axis=1), 6)
    assert (want["row_sum"].to_numpy() != orig).any()


def test_breach_depressions_tiling_invariant(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import breach
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    a = breach.breach_depressions(RasterSpec(rows=96, cols=64, tile_rows=16))
    b = breach.breach_depressions(RasterSpec(rows=96, cols=64, tile_rows=48))
    pd.testing.assert_frame_equal(a, b)
