"""Baseline (uncompressed, strip-organized) GeoTIFF import/export.

Reference: WhiteboxAPI/src/whitebox/geospatialfiles/GeoTiff.java:58
(tag table :295, read :438; strip-oriented access :607-619; rejects
compressed data :613) and ImportGeoTiff.java (372) / ExportGeoTiff.java
(406). Same scope here: uncompressed single-band strips, uint8/16/32,
int16/32, float32/64, either byte order; ModelPixelScale (0x830E) and
ModelTiepoint (0x8482) carry the georeference.

Ray shape: the IFD is parsed once on the driver (tiny); raster rows
stream through byte-range strip reads — one Ray task per output row
band, the sources/grids.py pattern.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd

from .grids import WHITEBOX_NODATA
from .raster_io import RasterHeader

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 0x830E
_TAG_TIEPOINT = 0x8482
_TAG_GDAL_NODATA = 42113

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd(path: str) -> dict[int, tuple[int, list]]:
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:2] == b"II":
            bo = "<"
        elif head[:2] == b"MM":
            bo = ">"
        else:
            raise ValueError(f"{path}: not a TIFF")
        if struct.unpack(bo + "H", head[2:4])[0] != 42:
            raise ValueError(f"{path}: bad TIFF magic")
        (ifd_off,) = struct.unpack(bo + "I", head[4:8])
        f.seek(ifd_off)
        (n_tags,) = struct.unpack(bo + "H", f.read(2))
        raw = f.read(n_tags * 12)
        tags: dict[int, tuple[int, list]] = {}
        pending = []
        for i in range(n_tags):
            tag, typ, cnt = struct.unpack_from(bo + "HHI", raw, i * 12)
            size = _TYPE_SIZE.get(typ, 1) * cnt
            val_bytes = raw[i * 12 + 8: i * 12 + 12]
            if size <= 4:
                tags[tag] = (typ, list(struct.unpack_from(
                    bo + str(cnt) + _TYPE_FMT.get(typ, "B"), val_bytes)))
            else:
                (off,) = struct.unpack(bo + "I", val_bytes)
                pending.append((tag, typ, cnt, off))
        for tag, typ, cnt, off in pending:
            f.seek(off)
            data = f.read(_TYPE_SIZE[typ] * cnt)
            if typ == 5:  # rational
                vals = struct.unpack(bo + str(2 * cnt) + "I", data)
                tags[tag] = (typ, [vals[i] / vals[i + 1]
                                   for i in range(0, len(vals), 2)])
            elif typ == 2:  # ascii
                tags[tag] = (typ, [data.rstrip(b"\0").decode("ascii",
                                                             "replace")])
            else:
                tags[tag] = (typ, list(struct.unpack(
                    bo + str(cnt) + _TYPE_FMT[typ], data)))
    tags[-1] = (0, [bo])  # stash byte order
    return tags


def read_geotiff_header(path: str):
    """(RasterHeader, numpy dtype, strip layout dict)."""
    tags = _read_ifd(path)
    bo = tags[-1][1][0]
    cols = tags[_TAG_WIDTH][1][0]
    rows = tags[_TAG_HEIGHT][1][0]
    comp = tags.get(_TAG_COMPRESSION, (0, [1]))[1][0]
    if comp != 1:
        raise NotImplementedError(
            f"{path}: compressed TIFF (type {comp}) unsupported "
            "(GeoTiff.java:613 rejects these too)")
    bits = tags.get(_TAG_BITS, (0, [8]))[1][0]
    fmt = tags.get(_TAG_SAMPLE_FORMAT, (0, [1]))[1][0]  # 1 uint 2 int 3 float
    kind = {1: "u", 2: "i", 3: "f"}[fmt]
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")
    sx, sy = tags.get(_TAG_PIXEL_SCALE, (0, [1.0, 1.0, 0.0]))[1][:2]
    tie = tags.get(_TAG_TIEPOINT, (0, [0, 0, 0, 0.0, 0.0, 0.0]))[1]
    west, north = tie[3], tie[4]
    nodata = WHITEBOX_NODATA
    if _TAG_GDAL_NODATA in tags:
        try:
            nodata = float(tags[_TAG_GDAL_NODATA][1][0])
        except (TypeError, ValueError):
            pass
    hdr = RasterHeader(rows=rows, cols=cols, north=north,
                       south=north - sy * rows, east=west + sx * cols,
                       west=west, nodata=nodata)
    layout = {"offsets": tags[_TAG_STRIP_OFFSETS][1],
              "counts": tags[_TAG_STRIP_COUNTS][1],
              "rows_per_strip": tags.get(_TAG_ROWS_PER_STRIP,
                                         (0, [rows]))[1][0]}
    return hdr, dtype, layout


def import_geotiff(path: str, tile_rows: int = 64):
    """(header, Dataset of tile rows) — byte-range strip reads, one Ray
    task per row band."""
    import ray.data as rd

    hdr, dtype, layout = read_geotiff_header(path)
    rows, cols = hdr.rows, hdr.cols
    rps = layout["rows_per_strip"]
    offsets = layout["offsets"]
    n_tiles = math.ceil(rows / tile_rows)
    item = dtype.itemsize

    def load(batch) -> pd.DataFrame:
        out = {"tile_id": [], "data": []}
        for tid in batch["id"]:
            r0 = int(tid) * tile_rows
            r1 = min(r0 + tile_rows, rows)
            parts = []
            with open(path, "rb") as f:
                r = r0
                while r < r1:
                    strip = r // rps
                    srow = r % rps
                    take = min(r1 - r, rps - srow)
                    f.seek(offsets[strip] + srow * cols * item)
                    raw = f.read(take * cols * item)
                    parts.append(np.frombuffer(raw, dtype=dtype)
                                 .reshape(take, cols))
                    r += take
            a = np.vstack(parts).astype(np.float64)
            if hdr.nodata != WHITEBOX_NODATA:
                a[a == hdr.nodata] = WHITEBOX_NODATA
            out["tile_id"].append(int(tid))
            out["data"].append(a.ravel())
        return pd.DataFrame(out)

    return hdr, rd.range(n_tiles).map_batches(load, batch_format="numpy")


def export_geotiff(hdr: RasterHeader, ds, path: str,
                   dtype: np.dtype = np.dtype("<f4"),
                   rows_per_strip: int = 64) -> None:
    """Write an uncompressed little-endian strip GeoTIFF (driver-side
    assembly — export is a small-side sink, like the grid exporters)."""
    frames = ds.to_pandas().sort_values("tile_id")
    grid = np.vstack([np.asarray(r.data).reshape(-1, hdr.cols)
                      for r in frames.itertuples()]).astype(dtype)
    rows, cols = grid.shape
    n_strips = math.ceil(rows / rows_per_strip)
    item = dtype.itemsize
    strips = [grid[i * rows_per_strip: (i + 1) * rows_per_strip]
              for i in range(n_strips)]
    counts = [s.shape[0] * cols * item for s in strips]

    tags = []  # (tag, type, count, value_or_bytes)
    sx = (hdr.east - hdr.west) / cols
    sy = (hdr.north - hdr.south) / rows
    fmt_code = {"u": 1, "i": 2, "f": 3}[dtype.kind]

    # layout: header(8) + IFD + external data + strips
    n_entries = 11
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()

    def ext_put(data: bytes) -> int:
        nonlocal ext
        off = ext_off + len(ext)
        ext += data
        return off

    scale_off = ext_put(struct.pack("<3d", sx, sy, 0.0))
    tie_off = ext_put(struct.pack("<6d", 0.0, 0.0, 0.0,
                                  hdr.west, hdr.north, 0.0))
    strip_off_pos = ext_put(b"\0" * (4 * n_strips))
    strip_cnt_off = ext_put(struct.pack(f"<{n_strips}I", *counts))
    data_start = ext_off + len(ext)
    offs = []
    pos = data_start
    for c in counts:
        offs.append(pos)
        pos += c
    struct.pack_into(f"<{n_strips}I", ext,
                     strip_off_pos - ext_off, *offs)

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)

    ifd = struct.pack("<H", n_entries)
    ifd += entry(_TAG_WIDTH, 4, 1, cols)
    ifd += entry(_TAG_HEIGHT, 4, 1, rows)
    ifd += entry(_TAG_BITS, 3, 1, item * 8)
    ifd += entry(_TAG_COMPRESSION, 3, 1, 1)
    ifd += entry(262, 3, 1, 1)  # PhotometricInterpretation: BlackIsZero
    ifd += entry(_TAG_STRIP_OFFSETS, 4, n_strips,
                 offs[0] if n_strips == 1 else strip_off_pos)
    ifd += entry(_TAG_ROWS_PER_STRIP, 4, 1, rows_per_strip)
    ifd += entry(_TAG_STRIP_COUNTS, 4, n_strips,
                 counts[0] if n_strips == 1 else strip_cnt_off)
    ifd += entry(_TAG_SAMPLE_FORMAT, 3, 1, fmt_code)
    ifd += entry(_TAG_PIXEL_SCALE, 12, 3, scale_off)
    ifd += entry(_TAG_TIEPOINT, 12, 6, tie_off)
    ifd += struct.pack("<I", 0)  # next IFD

    with open(path, "wb") as f:
        f.write(b"II*\0" + struct.pack("<I", ifd_off))
        f.write(ifd)
        f.write(bytes(ext))
        for s in strips:
            f.write(s.tobytes())
