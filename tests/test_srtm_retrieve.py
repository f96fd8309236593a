"""RetrieveSRTMData pipeline (tile naming → fetch → void-fill →
mosaic → fixElevations) with an injected fetcher — the FTP transport
is the only scoped-out piece (RetrieveSRTMData.groovy:199-404)."""

import numpy as np
import pytest

from whitebox_geospatial_analysis_tools_ray.sources import srtm_retrieve as sr
from whitebox_geospatial_analysis_tools_ray.sources.grids import (
    WHITEBOX_NODATA)

SIDE = 1201


def _synth_tile(lat: int, lon: int) -> np.ndarray:
    """Deterministic terrain per tile; a few voids; an ocean strip on
    the southernmost row band of lat==45 tiles."""
    r = np.arange(SIDE)[:, None]
    c = np.arange(SIDE)[None, :]
    a = (100.0 + 10.0 * np.sin((lat * 7 + r) / 97.0)
         + 5.0 * np.cos((lon * 13 + c) / 53.0)).astype(np.float64)
    a = np.round(a)  # int16-representable like real SRTM
    a[600 + lat % 3, 600 + lon % 5] = -32768.0   # speckle void
    a[700, 700:703] = -32768.0                   # 3-cell void run
    if lat == 45:
        a[-5:, :10] = 0.0                        # "ocean" zeros
    return a


def _fetcher(name: str):
    """Parse the tile name back and synthesize; pretend N46E008 is
    missing from the server (the groovy's ret==1 skip path)."""
    if name == "N46E008":
        return None
    lat = int(name[1:3]) * (1 if name[0] == "N" else -1)
    lon = int(name[4:7]) * (1 if name[3] == "E" else -1)
    return _synth_tile(lat, lon).astype(">i2").tobytes()


def test_tile_name_padding_matches_groovy():
    # RetrieveSRTMData.groovy:202-231 padding cases
    assert sr.srtm_tile_name(9, 8) == "N09E008"
    assert sr.srtm_tile_name(-9, -8) == "S09W008"
    assert sr.srtm_tile_name(45, 99) == "N45E099"
    assert sr.srtm_tile_name(45, 100) == "N45E100"
    assert sr.srtm_tile_name(-45, -100) == "S45W100"
    assert sr.srtm_tile_name(0, 0) == "N00E000"
    assert sr.srtm_tile_names(45, 46, 7, 8) == [
        "N45E007", "N45E008", "N46E007", "N46E008"]


def test_default_fetcher_is_loud():
    with pytest.raises(NotImplementedError, match="network"):
        sr.retrieve_srtm(45, 45, 7, 7)


def test_fill_voids_idw():
    a = _synth_tile(45, 7)
    f = sr.fill_voids(a)
    assert (f != -32768.0).all()
    # untouched where no void
    mask = a != -32768.0
    np.testing.assert_array_equal(f[mask], a[mask])
    # the filled value is inside the neighbourhood's value range
    v = f[700, 701]
    nb = a[695:706, 695:710]
    nb = nb[nb != -32768.0]
    assert nb.min() <= v <= nb.max()


def test_retrieve_srtm_mosaic(ray_session):
    hdr, ds = sr.retrieve_srtm(45, 46, 7, 8, fetcher=_fetcher)
    # 2×2 requested, one tile missing; grid spans the full box
    assert (hdr.rows, hdr.cols) == (2 * 1200 + 1, 2 * 1200 + 1)
    assert (hdr.south, hdr.north, hdr.west, hdr.east) == (45, 47, 7, 9)
    frames = ds.to_pandas().sort_values("tile_id")
    grid = np.vstack([np.asarray(r.data).reshape(-1, hdr.cols)
                      for r in frames.itertuples()])
    assert grid.shape == (hdr.rows, hdr.cols)
    # the missing tile's footprint (N46E008 = top-right block) is NoData
    assert (grid[:100, 1300:] == WHITEBOX_NODATA).all()
    # present tiles carry data (voids filled — no -32768 inside them;
    # NoData shares the -32768 encoding, so check present footprints)
    assert (grid[1300:-5, :1200] != WHITEBOX_NODATA).all()
    assert (grid[:1200, :1200] != WHITEBOX_NODATA).all()
    # fixElevations: the lat-45 ocean zeros became NoData
    # (southernmost rows of the lat=45 tiles = bottom of the mosaic)
    assert (grid[-5:, :10] == WHITEBOX_NODATA).all()
    # seam rule: shared column between lon 7 and lon 8 tiles — the
    # WEST tile's edge col equals the EAST tile's col 0 by construction
    # only where the synth functions agree; assert the seam is valid
    assert (grid[:1200, 1200] != WHITEBOX_NODATA).all()
    # interior values match the source tile (north-west block row 10)
    t = _synth_tile(46, 7)
    np.testing.assert_array_equal(grid[10, :100], t[10, :100])


def test_retrieve_srtm_per_tile(ray_session):
    out = sr.retrieve_srtm(45, 45, 7, 7, fetcher=_fetcher,
                           mosaic_tiles=False)
    assert len(out) == 1
    name, hdr, ds = out[0]
    assert name == "N45E007"
    assert (hdr.rows, hdr.cols) == (1201, 1201)
    got = np.concatenate(
        [np.asarray(d) for d in
         ds.to_pandas().sort_values("tile_id")["data"]]).reshape(1201, 1201)
    want = sr.fix_elevations(sr.fill_voids(_synth_tile(45, 7)))
    np.testing.assert_array_equal(got, want)


def test_fill_voids_sparse_matches_full_plane_mirror():
    """The sparse per-void walk must be bit-identical to the original
    full-plane scatter accumulation (same per-cell float += order) —
    literal mirror, block voids and edge voids included."""
    def fill_mirror(a, k=6, window=8):
        hole = a == -32768.0
        if not hole.any():
            return a
        H, W = a.shape
        valid = ~hole
        edge = np.zeros_like(valid)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ys = slice(max(0, -dy), H - max(0, dy))
                xs = slice(max(0, -dx), W - max(0, dx))
                yd = slice(max(0, dy), H - max(0, -dy))
                xd = slice(max(0, dx), W - max(0, -dx))
                e = np.zeros_like(valid)
                e[yd, xd] = hole[ys, xs]
                edge |= e
        edge &= valid
        offs = sorted(((dy * dy + dx * dx, dy, dx)
                       for dy in range(-window, window + 1)
                       for dx in range(-window, window + 1) if dy or dx))
        pad = window
        zp = np.full((H + 2 * pad, W + 2 * pad), np.nan)
        zp[pad:-pad, pad:-pad] = a
        ep = np.zeros((H + 2 * pad, W + 2 * pad), dtype=bool)
        ep[pad:-pad, pad:-pad] = edge
        cnt = np.zeros((H, W), dtype=np.int64)
        sw = np.zeros((H, W))
        swv = np.zeros((H, W))
        for d2, dy, dx in offs:
            e = ep[pad + dy:pad + dy + H, pad + dx:pad + dx + W]
            ev = zp[pad + dy:pad + dy + H, pad + dx:pad + dx + W]
            sel = hole & e & (cnt < k)
            w = 1.0 / d2
            sw += np.where(sel, w, 0.0)
            swv += np.where(sel, w * np.where(np.isnan(ev), 0.0, ev), 0.0)
            cnt += sel
        out = a.copy()
        out[hole] = swv[hole] / sw[hole]
        return out

    rng = np.random.default_rng(3)
    base = np.round(100 + 10 * np.sin(np.arange(200)[:, None] / 17.0)
                    + 5 * np.cos(np.arange(200)[None, :] / 7.0))
    cases = []
    for voids in ([(50, 50, 1, 1), (100, 100, 1, 3)],
                  [(10, 10, 4, 4), (150, 150, 3, 8), (195, 195, 5, 5)],
                  [(0, 0, 2, 2), (0, 198, 2, 2), (198, 0, 2, 2)]):
        a = base.copy()
        for (y, x, h, w) in voids:
            a[y:y + h, x:x + w] = -32768.0
        cases.append(a)
    a = base.copy()
    a[rng.random(a.shape) < 0.003] = -32768.0
    cases.append(a)
    for a in cases:
        np.testing.assert_array_equal(sr.fill_voids(a.copy()),
                                      fill_mirror(a.copy()))
