"""Sidecar-aware file utilities: CopyFile / DeleteFiles /
CreateNewShapefile.

Reference parity: FIleOperations/src/plugins/CopyFile.java:195-233
(copies the .tas twin of a .dep and the .shx/.dbf/.prj sidecars of a
.shp), DeleteFiles.java (same sidecar closure, delete), and
CreateNewShapefile.java:190-258 (empty typed shapefile + a one-field
NUMERIC ``FID`` attribute table). These are driver-side utilities by
nature — single small files, no Dataset involved — so they are plain
functions, not stages.
"""

from __future__ import annotations

import os
import shutil
import struct

import pandas as pd

# ShapeType codes per the shapefile spec (and CreateNewShapefile.java's
# name → type switch)
SHAPE_TYPES = {
    "point": 1, "polyline": 3, "polygon": 5, "multipoint": 8,
    "pointz": 11, "polylinez": 13, "polygonz": 15, "multipointz": 18,
    "pointm": 21, "polylinem": 23, "polygonm": 25, "multipointm": 28,
}


def _sidecars(path: str) -> list[str]:
    """The file plus every sidecar the reference's CopyFile closes over."""
    out = [path]
    lower = path.lower()
    if lower.endswith(".dep"):
        out.append(path[:-4] + ".tas")
    elif lower.endswith(".shp"):
        out += [path[:-4] + ext for ext in (".shx", ".dbf", ".prj")]
    return out


def copy_file(src: str, dst: str) -> list[str]:
    """Copy ``src`` to ``dst`` with its sidecar closure (.dep→.tas,
    .shp→.shx/.dbf/.prj). Returns the destination paths written."""
    if os.path.splitext(src)[1].lower() != os.path.splitext(dst)[1].lower():
        raise ValueError(
            f"source and destination extensions must match: {src} -> {dst}")
    written = []
    for s, d in zip(_sidecars(src), _sidecars(dst)):
        if os.path.exists(s):
            shutil.copyfile(s, d)
            written.append(d)
    if not written:
        raise FileNotFoundError(src)
    return written


def delete_files(paths: str | list[str]) -> list[str]:
    """Delete each path with its sidecar closure; returns what was
    removed (missing sidecars are skipped, as the reference does)."""
    if isinstance(paths, str):
        paths = [paths]
    removed = []
    for p in paths:
        for s in _sidecars(p):
            if os.path.exists(s):
                os.remove(s)
                removed.append(s)
    return removed


def create_new_shapefile(shp_path: str, shape_type: str | int) -> None:
    """Create an EMPTY shapefile of the given type: typed .shp/.shx
    headers with no records, plus a .dbf with the single NUMERIC ``FID``
    field (CreateNewShapefile.java:250-258)."""
    st = (SHAPE_TYPES[shape_type.lower()] if isinstance(shape_type, str)
          else int(shape_type))
    if st not in SHAPE_TYPES.values():
        raise ValueError(f"unknown shape type {shape_type!r}")

    def header(total_bytes: int) -> bytes:
        h = struct.pack(">i", 9994) + b"\0" * 20
        h += struct.pack(">i", total_bytes // 2)
        h += struct.pack("<ii", 1000, st)
        h += struct.pack("<dddd", 0.0, 0.0, 0.0, 0.0)  # empty extent
        h += struct.pack("<dddd", 0.0, 0.0, 0.0, 0.0)
        return h

    with open(shp_path, "wb") as f:
        f.write(header(100))
    with open(shp_path[:-4] + ".shx", "wb") as f:
        f.write(header(100))
    from .shapefile_io import _write_dbf
    _write_dbf(shp_path[:-4] + ".dbf",
               pd.DataFrame({"FID": pd.Series([], dtype="float64")}))
