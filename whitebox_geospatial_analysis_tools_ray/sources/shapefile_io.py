"""Minimal ESRI shapefile (.shp + .dbf) reader → Arrow/WKB feature table.

Pure-python struct parsing (no pyshp in this environment). Covers the
shape types the reference uses (ShapeFile.java / shapefile/*.java):
Point(1), PolyLine(3), Polygon(5), MultiPoint(8) + their Z/M variants by
base-type collapse (ShapeType.java:29-53). Attributes come from the DBF
(dBASE III) sidecar per shapefile/attributes/DBFReader.java semantics:
C→utf8, N/F→int64 or float64 by decimal count, L→bool, D→date string.

Output schema: rec_id:int64 (1-based record number,
ShapeFileRecord.java:146), geometry:binary (WKB), x/y for points,
plus the DBF attribute columns. The decode runs inside Ray tasks via
``read_binary_files`` when used through :func:`read_shapefile_ds`.
"""

from __future__ import annotations

import datetime as _dt
import struct

import numpy as np
import pandas as pd

from ..core.geom import Polygon, wkb_point, wkb_polygon

_BASE_TYPE = {1: 1, 11: 1, 21: 1, 3: 3, 13: 3, 23: 3,
              5: 5, 15: 5, 25: 5, 8: 8, 18: 8, 28: 8}


def _parse_shp(buf: bytes):
    """Yield (rec_id, shape_type, parts, points) per record."""
    (file_len,) = struct.unpack_from(">i", buf, 24)  # 16-bit words
    end = file_len * 2
    off = 100
    while off < end:
        rec_id, content_len = struct.unpack_from(">ii", buf, off)
        off += 8
        rec_end = off + content_len * 2
        (stype,) = struct.unpack_from("<i", buf, off)
        base = _BASE_TYPE.get(stype, 0)
        if base == 1:  # Point
            x, y = struct.unpack_from("<dd", buf, off + 4)
            yield rec_id, base, [0], np.array([[x, y]])
        elif base == 8:  # MultiPoint
            (npts,) = struct.unpack_from("<i", buf, off + 36)
            pts = np.frombuffer(buf, dtype="<f8", count=npts * 2,
                                offset=off + 40).reshape(-1, 2)
            yield rec_id, base, [0], pts.copy()
        elif base in (3, 5):  # PolyLine / Polygon
            nparts, npts = struct.unpack_from("<ii", buf, off + 36)
            parts = list(struct.unpack_from(f"<{nparts}i", buf, off + 44))
            pts = np.frombuffer(buf, dtype="<f8", count=npts * 2,
                                offset=off + 44 + 4 * nparts).reshape(-1, 2)
            yield rec_id, base, parts, pts.copy()
        # null / unsupported types are skipped
        off = rec_end


def _parse_dbf(buf: bytes) -> pd.DataFrame:
    nrec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows = {f[0]: [] for f in fields}
    off = hdr_size
    for _ in range(nrec):
        deleted = buf[off:off + 1] == b"*"
        p = off + 1
        for name, ftype, flen, fdec in fields:
            raw = buf[p:p + flen]
            p += flen
            if deleted:
                continue
            s = raw.decode("latin-1").strip()
            if ftype in ("N", "F"):
                if s in ("", "*" * len(s)):
                    v = None
                elif fdec == 0 and ftype == "N":
                    try:
                        v = int(s)
                    except ValueError:
                        v = float(s)
                else:
                    v = float(s)
            elif ftype == "L":
                v = s.upper() in ("T", "Y")
            elif ftype == "D":
                v = _dt.date(int(s[:4]), int(s[4:6]), int(s[6:8])) if len(s) == 8 else None
            else:
                v = s
            rows[name].append(v)
        off += rec_size
    return pd.DataFrame(rows)


def read_shapefile(shp_path: str) -> pd.DataFrame:
    """Read .shp/.dbf into a feature DataFrame (driver-side; for small
    broadcast layers — large layers go through read_shapefile_ds)."""
    with open(shp_path, "rb") as f:
        shp = f.read()
    feats = {"rec_id": [], "shape_type": [], "geometry": [], "x": [], "y": []}
    for rec_id, base, parts, pts in _parse_shp(shp):
        feats["rec_id"].append(rec_id)
        feats["shape_type"].append(base)
        if base == 1:
            feats["geometry"].append(wkb_point(pts[0, 0], pts[0, 1]))
            feats["x"].append(pts[0, 0])
            feats["y"].append(pts[0, 1])
        else:
            bounds = parts[1:] + [len(pts)]
            rings = [pts[s:e] for s, e in zip(parts, bounds)]
            feats["geometry"].append(wkb_polygon(Polygon(rings)) if base == 5
                                     else wkb_polygon(Polygon(rings)))
            feats["x"].append(float(pts[:, 0].mean()))
            feats["y"].append(float(pts[:, 1].mean()))
    gdf = pd.DataFrame(feats)
    dbf_path = shp_path[:-4] + ".dbf"
    try:
        with open(dbf_path, "rb") as f:
            attrs = _parse_dbf(f.read())
        attrs.index = np.arange(1, len(attrs) + 1)
        gdf = gdf.join(attrs, on="rec_id")
    except FileNotFoundError:
        pass
    return gdf


def read_shapefile_ds(shp_path: str):
    """Shapefile → Ray Dataset (decode inside a Ray task)."""
    import ray.data as rd
    files = rd.read_binary_files(shp_path)

    def decode(batch: pd.DataFrame) -> pd.DataFrame:
        import io
        frames = []
        for data in batch["bytes"]:
            feats = {"rec_id": [], "shape_type": [], "geometry": []}
            for rec_id, base, parts, pts in _parse_shp(bytes(data)):
                feats["rec_id"].append(rec_id)
                feats["shape_type"].append(base)
                if base == 1:
                    feats["geometry"].append(wkb_point(pts[0, 0], pts[0, 1]))
                else:
                    bounds = parts[1:] + [len(pts)]
                    rings = [pts[s:e] for s, e in zip(parts, bounds)]
                    feats["geometry"].append(wkb_polygon(Polygon(rings)))
            frames.append(pd.DataFrame(feats))
        return pd.concat(frames, ignore_index=True)

    return files.map_batches(decode, batch_format="pandas")


# ---------------------------------------------------------------------------
# Shapefile WRITER (ShapeFile.java:454 write(), ShapeFileRecord 1-based
# record numbers; DBFWriter.java field descriptors) — completes r/w
# parity. Driver-side sink: vector layers that reach a .shp are
# broadcast-sized; large layers persist as Parquet (the canonical store).
# ---------------------------------------------------------------------------

def write_shapefile(shp_path: str, features: list[dict],
                    attrs: "pd.DataFrame | None" = None) -> None:
    """features: [{shape_type: 1|3|5, rings: [np.ndarray(n,2), ...]}]
    (points pass one single-vertex ring). Writes .shp, .shx and (when
    ``attrs`` given) a DBF with N(18,6)/C(64) fields by dtype."""
    recs = []
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for i, f in enumerate(features):
        st = int(f["shape_type"])
        rings = [np.asarray(r, dtype=np.float64) for r in f["rings"]]
        pts = np.vstack(rings)
        minx = min(minx, pts[:, 0].min()); maxx = max(maxx, pts[:, 0].max())
        miny = min(miny, pts[:, 1].min()); maxy = max(maxy, pts[:, 1].max())
        if st == 1:
            content = struct.pack("<i", 1) + struct.pack(
                "<dd", pts[0, 0], pts[0, 1])
        else:
            parts = np.cumsum([0] + [len(r) for r in rings[:-1]])
            content = struct.pack("<i", st)
            content += struct.pack("<dddd", pts[:, 0].min(), pts[:, 1].min(),
                                   pts[:, 0].max(), pts[:, 1].max())
            content += struct.pack("<ii", len(rings), len(pts))
            content += struct.pack(f"<{len(parts)}i", *parts)
            content += pts.astype("<f8").tobytes()
        recs.append((i + 1, content))

    shp = bytearray()
    shx = bytearray()
    body = bytearray()
    offset_words = 50  # header = 100 bytes
    for rec_id, content in recs:
        clen_words = len(content) // 2
        shx += struct.pack(">ii", offset_words, clen_words)
        body += struct.pack(">ii", rec_id, clen_words) + content
        offset_words += 4 + clen_words

    def header(total_bytes: int) -> bytes:
        h = struct.pack(">i", 9994) + b"\0" * 20
        h += struct.pack(">i", total_bytes // 2)
        h += struct.pack("<ii", 1000,
                         int(features[0]["shape_type"]) if features else 0)
        h += struct.pack("<dddd", minx if features else 0.0,
                         miny if features else 0.0,
                         maxx if features else 0.0,
                         maxy if features else 0.0)
        h += struct.pack("<dddd", 0.0, 0.0, 0.0, 0.0)
        return h

    with open(shp_path, "wb") as f:
        f.write(header(100 + len(body)))
        f.write(bytes(body))
    with open(shp_path[:-4] + ".shx", "wb") as f:
        f.write(header(100 + len(shx)))
        f.write(bytes(shx))

    if attrs is not None:
        _write_dbf(shp_path[:-4] + ".dbf", attrs)


def _write_dbf(path: str, df: "pd.DataFrame") -> None:
    fields = []
    for name in df.columns:
        if np.issubdtype(df[name].dtype, np.number):
            fields.append((name[:10], "N", 18, 6))
        else:
            fields.append((name[:10], "C", 64, 0))
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    with open(path, "wb") as f:
        f.write(struct.pack("<BBBBIHH", 3, 26, 1, 1, len(df),
                            hdr_size, rec_size))
        f.write(b"\0" * 20)
        for name, t, ln, dec in fields:
            fd = bytearray(32)
            fd[:11] = name.encode("ascii", "replace")[:11].ljust(11, b"\0")
            fd[11] = ord(t)
            fd[16] = ln
            fd[17] = dec
            f.write(bytes(fd))
        f.write(b"\x0d")
        for _, row in df.iterrows():
            f.write(b" ")
            for (name, t, ln, dec), col in zip(fields, df.columns):
                v = row[col]
                if t == "N":
                    s = f"{float(v):.6f}".rjust(ln)[:ln]
                else:
                    s = str(v).ljust(ln)[:ln]
                f.write(s.encode("latin-1", "replace"))
        f.write(b"\x1a")
