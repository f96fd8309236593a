"""Deterministic feature derivation from the test tables.

The sandbox's input tables (TESTDATA.md) have no coordinates, so — as in
the north rule's "web pages geocoded into point features" — we derive
point features deterministically:

- ``documents`` rows → points: ``rec_id = doc_id``,
  ``(x, y) = geocode_xy(doc_id)`` (exact int64+float64 rule shared with
  the SQL oracle, see core.rng), ``z = n_chars``.
- ``nation`` rows → small broadcast zone layers (rectangles, triangles):
  geometry computed once on the driver from nation keys and inlined as
  float literals into the oracle SQL (repr round-trips doubles exactly).
- complex seeded polygons (holes, a "mega" skew polygon) for the
  non-SQL-expressible PIP paths, per FIXTURES.md §2.

Everything here is driver-side and tiny; the big table never leaves Ray.
"""

from __future__ import annotations

import numpy as np

from . import rng
from .geom import Polygon
from .rng import EAST, NORTH, SOUTH, WEST, geocode_sql, geocode_xy, uniform01

# SQL fragment: point features derived from the documents table.
_XSQL, _YSQL = geocode_sql("doc_id")
POINTS_CTE = (
    "pts AS (SELECT doc_id AS rec_id, "
    f"{_XSQL} AS x, {_YSQL} AS y, "
    "CAST(n_chars AS DOUBLE) AS z, lang FROM documents)"
)


def doc_points(batch):
    """Vectorized numpy geocode for a documents batch (dict of ndarrays).

    Mirrors POINTS_CTE exactly.
    """
    ids = np.asarray(batch["doc_id"], dtype=np.int64)
    x, y = geocode_xy(ids)
    out = {"rec_id": ids, "x": x, "y": y,
           "z": np.asarray(batch["n_chars"], dtype=np.float64)}
    if "lang" in batch:
        out["lang"] = batch["lang"]
    return out


# ---------------------------------------------------------------------------
# Zone layers (broadcast side of spatial joins)
# ---------------------------------------------------------------------------

def rect_zones(n: int = 25) -> list[dict]:
    """Deterministic rectangles keyed like nation rows (zone_id = 0..n-1)."""
    ids = np.arange(n, dtype=np.int64) * 1000003 + 7
    cx, cy = geocode_xy(ids)
    hw = 200.0 + uniform01(ids, mult=2246822519, add=17) * 800.0
    hh = 200.0 + uniform01(ids, mult=2654435761, add=29) * 800.0
    return [{"zone_id": int(i),
             "xmin": float(cx[i] - hw[i]), "xmax": float(cx[i] + hw[i]),
             "ymin": float(cy[i] - hh[i]), "ymax": float(cy[i] + hh[i])}
            for i in range(n)]


def rect_zones_sql_values(zones: list[dict], alias: str = "z") -> str:
    """VALUES literal table for the rectangles (exact double literals)."""
    rows = ", ".join(
        f"({z['zone_id']}, {z['xmin']!r}, {z['xmax']!r}, {z['ymin']!r}, {z['ymax']!r})"
        for z in zones)
    return f"(VALUES {rows}) AS {alias}(zone_id, xmin, xmax, ymin, ymax)"


def triangle_zones(n: int = 12) -> list[dict]:
    """Deterministic triangles; PIP is SQL-expressible via sign tests."""
    out = []
    for i in range(n):
        ids = np.asarray([i * 97 + 11, i * 97 + 41, i * 97 + 73], dtype=np.int64)
        vx, vy = geocode_xy(ids * 524287 + 3)
        out.append({"zone_id": i,
                    "ax": float(vx[0]), "ay": float(vy[0]),
                    "bx": float(vx[1]), "by": float(vy[1]),
                    "cx": float(vx[2]), "cy": float(vy[2])})
    return out


def seeded_polygons(n: int = 24, seed: int = 42) -> list[dict]:
    """Complex star-shaped polygons per FIXTURES.md §2: includes one
    polygon with a hole and one "mega" polygon (~30% of extent, the skew
    case). Returns [{'zone_id', 'polygon': Polygon}].

    Not SQL-expressible — verified by the pytest single-process oracle.
    """
    g = np.random.default_rng(seed)
    out = []
    w, h = EAST - WEST, NORTH - SOUTH
    for i in range(n):
        if i == 0:  # mega polygon: big star centred mid-extent
            cx, cy, rmin, rmax, k = WEST + 0.5 * w, SOUTH + 0.5 * h, 0.42 * w, 0.62 * w, 24
        else:
            cx = WEST + g.uniform(0.05, 0.95) * w
            cy = SOUTH + g.uniform(0.05, 0.95) * h
            rmax = g.uniform(0.04, 0.18) * w
            rmin = rmax * g.uniform(0.35, 0.8)
            k = int(g.integers(5, 13))
        ang = np.sort(g.uniform(0, 2 * np.pi, k))
        rad = g.uniform(rmin, rmax, k)
        ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        # reference shells are clockwise (Topology.java:33-136)
        ring = ring[::-1]
        rings = [ring]
        if i == 1:  # one polygon with a hole (CCW ring)
            hole = np.column_stack([cx + 0.4 * rmin * np.cos(ang), cy + 0.4 * rmin * np.sin(ang)])
            rings.append(hole)
        out.append({"zone_id": i, "polygon": Polygon(rings)})
    return out


def site_points(n: int = 25) -> list[dict]:
    """Deterministic 'site' points (within-distance / kNN query side)."""
    ids = np.arange(n, dtype=np.int64) * 777773 + 101
    x, y = geocode_xy(ids)
    return [{"site_id": int(i), "sx": float(x[i]), "sy": float(y[i])} for i in range(n)]


def site_points_sql_values(sites: list[dict], alias: str = "s") -> str:
    rows = ", ".join(f"({s['site_id']}, {s['sx']!r}, {s['sy']!r})" for s in sites)
    return f"(VALUES {rows}) AS {alias}(site_id, sx, sy)"


def cell_centers(width: float = 250.0) -> list[dict]:
    """Raster cell centers over the world extent (16×16 at width=250),
    cell-centre registration per WhiteboxRasterBase coordinate transforms
    (InterpolationIDW.java:544-545)."""
    ncols = int(round((EAST - WEST) / width))
    nrows = int(round((NORTH - SOUTH) / width))
    out = []
    half = width / 2.0
    for row in range(nrows):
        for col in range(ncols):
            out.append({"cell_id": row * ncols + col,
                        "cx": WEST + col * width + half,
                        "cy": NORTH - half - row * width})
    return out


def cell_centers_sql_values(cells: list[dict], alias: str = "c") -> str:
    rows = ", ".join(f"({c['cell_id']}, {c['cx']!r}, {c['cy']!r})" for c in cells)
    return f"(VALUES {rows}) AS {alias}(cell_id, cx, cy)"
