"""Baseline GeoTIFF import/export roundtrip through Ray tile rows."""

import numpy as np
import pytest

from whitebox_geospatial_analysis_tools_ray.sources import geotiff as gt
from whitebox_geospatial_analysis_tools_ray.sources.raster_io import RasterHeader


def _synth_ds(hdr, grid, tile_rows=16):
    import pandas as pd
    import ray.data as rd
    frames = []
    for t in range(0, hdr.rows, tile_rows):
        frames.append({"tile_id": t // tile_rows,
                       "data": grid[t:t + tile_rows].ravel()})
    return rd.from_pandas(pd.DataFrame(frames))


@pytest.mark.parametrize("dtype", ["<f4", "<f8", "<i2", "<u2"])
def test_geotiff_roundtrip(tmp_path, ray_session, dtype):
    g = np.random.default_rng(9)
    rows, cols = 48, 37
    grid = (g.uniform(0, 1000, (rows, cols)).astype(np.dtype(dtype))
            .astype(np.float64))
    hdr = RasterHeader(rows=rows, cols=cols, north=100.0, south=52.0,
                       east=200.0, west=163.0)
    p = str(tmp_path / f"t{dtype[1:]}.tif")
    gt.export_geotiff(hdr, _synth_ds(hdr, grid), p, dtype=np.dtype(dtype),
                      rows_per_strip=13)
    hdr2, ds = gt.import_geotiff(p, tile_rows=11)
    assert (hdr2.rows, hdr2.cols) == (rows, cols)
    assert hdr2.west == pytest.approx(hdr.west)
    assert hdr2.north == pytest.approx(hdr.north)
    assert hdr2.east == pytest.approx(hdr.east)
    frames = ds.to_pandas().sort_values("tile_id")
    got = np.vstack([np.asarray(r.data).reshape(-1, cols)
                     for r in frames.itertuples()])
    np.testing.assert_array_equal(got, grid)


def test_geotiff_rejects_compressed(tmp_path):
    # minimal IFD with Compression=5 (LZW)
    import struct
    p = str(tmp_path / "c.tif")
    ifd = struct.pack("<H", 3)
    for tag, typ, cnt, val in ((256, 4, 1, 4), (257, 4, 1, 4),
                               (259, 3, 1, 5)):
        ifd += struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)
    ifd += struct.pack("<I", 0)
    open(p, "wb").write(b"II*\0" + struct.pack("<I", 8) + ifd)
    with pytest.raises(NotImplementedError):
        gt.read_geotiff_header(p)


def test_geotiff_rejects_non_tiff(tmp_path):
    p = str(tmp_path / "x.tif")
    open(p, "wb").write(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError):
        gt.read_geotiff_header(p)


def test_png_codec_all_filters_and_shapes():
    import struct
    import zlib

    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.sources.png import (
        _paeth, decode_png, write_png)

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(50, 37), dtype=np.uint8)
    write_png("/tmp/t_png_grey.png", a)
    assert np.array_equal(
        a, decode_png(open("/tmp/t_png_grey.png", "rb").read()))
    c = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    write_png("/tmp/t_png_rgb.png", c)
    assert np.array_equal(
        c, decode_png(open("/tmp/t_png_rgb.png", "rb").read()))

    # adaptive per-row filters 0-4 (encoders we don't emit but must read)
    def chunk(tag, p):
        return struct.pack(">I", len(p)) + tag + p + struct.pack(
            ">I", zlib.crc32(tag + p) & 0xFFFFFFFF)

    h, w = a.shape
    rows = []
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        ft = [0, 1, 2, 3, 4][r % 5]
        row = a[r]
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = np.empty(w, np.uint8)
            enc[0] = row[0]
            enc[1:] = row[1:] - row[:-1]
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            left = np.concatenate([[0], row[:-1]]).astype(np.int32)
            enc = (row.astype(np.int32)
                   - (left + prev.astype(np.int32)) // 2).astype(np.uint8)
        else:
            left = np.concatenate([[0], row[:-1]])
            ul = np.concatenate([[0], prev[:-1]])
            enc = (row.astype(np.int32)
                   - _paeth(left, prev, ul).astype(np.int32)).astype(np.uint8)
        rows.append(bytes([ft]) + enc.tobytes())
        prev = row
    raw = b"".join(rows)
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) \
        + chunk(b"IEND", b"")
    assert np.array_equal(a, decode_png(data))


def test_jpeg_codec_roundtrip_and_determinism():
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.sources.jpeg import (
        decode_jpeg, write_jpeg)

    y, x = np.mgrid[0:64, 0:80]
    img = (128 + 60 * np.sin(x / 9.0)
           + 50 * np.cos(y / 7.0)).clip(0, 255).astype(np.uint8)
    rgb = np.stack([img, np.roll(img, 3, axis=1), 255 - img], axis=2)
    write_jpeg("/tmp/t_jpeg_smooth.jpg", rgb, quality=85)
    dec = decode_jpeg(open("/tmp/t_jpeg_smooth.jpg", "rb").read())
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert dec.shape == rgb.shape and err.mean() < 6.0
    assert np.array_equal(
        dec, decode_jpeg(open("/tmp/t_jpeg_smooth.jpg", "rb").read()))

    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, size=(37, 51, 3), dtype=np.uint8)
    for q in (20, 95):
        write_jpeg("/tmp/t_jpeg_noise.jpg", noise, quality=q)
        d = decode_jpeg(open("/tmp/t_jpeg_noise.jpg", "rb").read())
        assert d.shape == noise.shape
