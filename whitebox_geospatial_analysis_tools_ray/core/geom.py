"""Pure-numpy planar geometry (no shapely in this environment).

Implements exactly the primitives the reference relies on:

- even-odd (crossing-parity) point-in-polygon — the rule used by the
  reference's scanline rasterizer (``VectorPolygonsToRaster.java:370-446``)
  and implied by its PIP predicates; holes are just additional rings
  (even-odd handles them with no special casing).
- bounding-box predicates (``whitebox/structures/BoundingBox.java``).
- ring orientation (clockwise shell / counter-clockwise hole,
  ``whitebox/utilities/Topology.java:33-136``).
- shoelace area / perimeter / centroid (``GISTools`` shape metrics).
- Andrew monotone-chain convex hull (``MinimumConvexHull.java``).
- Douglas–Peucker simplification (``SimplifyLineOrPolygon.java`` via JTS).
- Sutherland–Hodgman clipping against a CONVEX clip polygon (the general
  JTS overlay is out of scope for round 1; rectangles/convex clips cover
  the Clip pipeline tests).
- minimal WKB codec (Point / Polygon / MultiPolygon, little-endian).

All functions are vectorized over points; polygons are small (the
broadcast side of spatial joins), so per-polygon Python loops are fine.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------------------
# Polygon model
# ---------------------------------------------------------------------------

@dataclass
class Polygon:
    """A polygon: list of rings, each an (n, 2) float64 array (not closed).

    Ring 0 convention follows the reference shapefile model: any ring
    counts toward even-odd parity, so shells/holes need no flags here.
    """

    rings: list  # list[np.ndarray (n,2)]
    bbox: tuple = field(default=None)  # (minx, miny, maxx, maxy)

    def __post_init__(self):
        self.rings = [np.asarray(r, dtype=np.float64) for r in self.rings]
        if self.bbox is None:
            allpts = np.vstack(self.rings)
            self.bbox = (float(allpts[:, 0].min()), float(allpts[:, 1].min()),
                         float(allpts[:, 0].max()), float(allpts[:, 1].max()))


# ---------------------------------------------------------------------------
# Point-in-polygon (even-odd crossing parity)
# ---------------------------------------------------------------------------

def points_in_ring(x: np.ndarray, y: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing parity of points vs one ring. Vectorized P×V.

    Mirrors the scanline parity fill of VectorPolygonsToRaster.java:401-441:
    an upward/downward edge crossing strictly left of the point toggles
    parity. Points exactly on an edge follow the half-open convention
    (consistent, deterministic).
    """
    x = np.asarray(x, dtype=np.float64)[:, None]
    y = np.asarray(y, dtype=np.float64)[:, None]
    x0 = ring[None, :, 0]
    y0 = ring[None, :, 1]
    x1 = np.roll(ring[:, 0], -1)[None, :]
    y1 = np.roll(ring[:, 1], -1)[None, :]
    # Edge straddles the horizontal line through y (half-open in y).
    straddle = (y0 <= y) != (y1 <= y)
    # X coordinate where the edge crosses that horizontal line.
    with np.errstate(divide="ignore", invalid="ignore"):
        xcross = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    cross = straddle & (xcross > x)
    return (cross.sum(axis=1) % 2).astype(bool)


def points_in_polygon(x: np.ndarray, y: np.ndarray, poly: Polygon,
                      bbox_prefilter: bool = True) -> np.ndarray:
    """Even-odd PIP vs a multi-ring polygon (holes = rings toggling parity)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.zeros(x.shape, dtype=bool)
    if bbox_prefilter:
        minx, miny, maxx, maxy = poly.bbox
        cand = (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
    else:
        cand = np.ones(x.shape, dtype=bool)
    if not cand.any():
        return out
    xi, yi = x[cand], y[cand]
    parity = np.zeros(xi.shape, dtype=np.int64)
    for ring in poly.rings:
        parity += points_in_ring(xi, yi, ring).astype(np.int64)
    out[cand] = (parity % 2).astype(bool)
    return out


def points_in_triangle(x, y, ax, ay, bx, by, cx, cy):
    """Sign-test PIP for a triangle — kept separate because it is exactly
    expressible in the SQL oracle (three cross-product sign predicates)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    d1 = (x - bx) * (ay - by) - (ax - bx) * (y - by)
    d2 = (x - cx) * (by - cy) - (bx - cx) * (y - cy)
    d3 = (x - ax) * (cy - ay) - (cx - ax) * (y - ay)
    has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
    has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
    return ~(has_neg & has_pos)


def triangle_pip_sql(x: str, y: str, ax, ay, bx, by, cx, cy) -> str:
    """SQL predicate identical to :func:`points_in_triangle`."""
    d1 = f"((({x})-{bx!r})*({ay!r}-{by!r}) - ({ax!r}-{bx!r})*(({y})-{by!r}))"
    d2 = f"((({x})-{cx!r})*({by!r}-{cy!r}) - ({bx!r}-{cx!r})*(({y})-{cy!r}))"
    d3 = f"((({x})-{ax!r})*({cy!r}-{ay!r}) - ({cx!r}-{ax!r})*(({y})-{ay!r}))"
    has_neg = f"({d1} < 0 OR {d2} < 0 OR {d3} < 0)"
    has_pos = f"({d1} > 0 OR {d2} > 0 OR {d3} > 0)"
    return f"(NOT ({has_neg} AND {has_pos}))"


# ---------------------------------------------------------------------------
# Ring metrics
# ---------------------------------------------------------------------------

def signed_area(ring: np.ndarray) -> float:
    """Shoelace; NEGATIVE for clockwise rings (reference shells are CW,
    Topology.java:33-136 ``isClockwisePolygon``)."""
    x, y = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    return float(0.5 * np.sum(x * y1 - x1 * y))


def is_clockwise(ring: np.ndarray) -> bool:
    return signed_area(ring) < 0


def polygon_area(poly: Polygon) -> float:
    """Total area under the reference orientation convention (CW shell,
    CCW holes): Σ −signed_area(ring) = shell area − hole areas."""
    return float(sum(-signed_area(r) for r in poly.rings))


def perimeter(poly: Polygon) -> float:
    tot = 0.0
    for r in poly.rings:
        d = np.diff(np.vstack([r, r[:1]]), axis=0)
        tot += float(np.sqrt((d ** 2).sum(axis=1)).sum())
    return tot


def centroid(ring: np.ndarray) -> tuple[float, float]:
    x, y = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y1 - x1 * y
    a = cross.sum() / 2.0
    if a == 0:
        return float(x.mean()), float(y.mean())
    cx = float(((x + x1) * cross).sum() / (6.0 * a))
    cy = float(((y + y1) * cross).sum() / (6.0 * a))
    return cx, cy


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices CCW, (h, 2)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def douglas_peucker(pts: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas–Peucker line simplification."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        L = np.hypot(*seg)
        mid = pts[i + 1:j]
        if L == 0:
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            d = np.abs(seg[0] * (pts[i, 1] - mid[:, 1]) - seg[1] * (pts[i, 0] - mid[:, 0])) / L
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.extend([(i, i + 1 + k), (i + 1 + k, j)])
    return pts[keep]


def clip_convex(ring: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `ring` by a CONVEX CCW clip polygon.

    Covers rectangular/convex clip cases of VectorTools Clip
    (Clip.java:455 ``clipGeom.intersection``); the general concave
    overlay is documented out of scope for round 1.
    """
    out = [tuple(p) for p in np.asarray(ring, dtype=np.float64)]
    cr = np.asarray(clip_ring, dtype=np.float64)
    for i in range(len(cr)):
        a, b = cr[i], cr[(i + 1) % len(cr)]
        if not out:
            break
        inp, out = out, []
        prev = inp[-1]

        def inside(p):
            return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

        def intersect(p, q):
            dpx, dpy = q[0] - p[0], q[1] - p[1]
            dcx, dcy = b[0] - a[0], b[1] - a[1]
            denom = dpx * dcy - dpy * dcx
            t = ((a[0] - p[0]) * dcy - (a[1] - p[1]) * dcx) / denom
            return (p[0] + t * dpx, p[1] + t * dpy)

        for cur in inp:
            if inside(cur):
                if not inside(prev):
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif inside(prev):
                out.append(intersect(prev, cur))
            prev = cur
    return np.array(out) if out else np.empty((0, 2))


# ---------------------------------------------------------------------------
# WKB codec (little-endian; Point=1, Polygon=3, MultiPolygon=6)
# ---------------------------------------------------------------------------

def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def wkb_polygon(poly: Polygon) -> bytes:
    parts = [struct.pack("<BII", 1, 3, len(poly.rings))]
    for r in poly.rings:
        closed = np.vstack([r, r[:1]])
        parts.append(struct.pack("<I", len(closed)))
        parts.append(closed.astype("<f8").tobytes())
    return b"".join(parts)


def parse_wkb(buf: bytes):
    """Decode Point / Polygon / MultiPolygon WKB → ('point',(x,y)) or
    ('polygon', Polygon) or ('multipolygon', list[Polygon])."""
    def read_poly(mv, off):
        (nrings,) = struct.unpack_from("<I", mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", mv, off)
            off += 4
            arr = np.frombuffer(mv, dtype="<f8", count=npts * 2, offset=off).reshape(-1, 2)
            off += npts * 16
            rings.append(arr[:-1].copy() if npts > 1 and (arr[0] == arr[-1]).all() else arr.copy())
        return Polygon(rings), off

    order, gtype = struct.unpack_from("<BI", buf, 0)
    assert order == 1, "big-endian WKB not supported"
    if gtype == 1:
        x, y = struct.unpack_from("<dd", buf, 5)
        return "point", (x, y)
    if gtype == 3:
        poly, _ = read_poly(buf, 5)
        return "polygon", poly
    if gtype == 6:
        (n,) = struct.unpack_from("<I", buf, 5)
        off = 9
        polys = []
        for _ in range(n):
            off += 5  # inner byte-order + type
            poly, off = read_poly(buf, off)
            polys.append(poly)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def min_enclosing_circle(pts: np.ndarray) -> tuple[float, float, float]:
    """Smallest enclosing circle (cx, cy, r) — deterministic Welzl
    (no shuffle; fine for per-feature vertex counts). The reference
    delegates to JTS MinimumBoundingCircle
    (GISTools/src/plugins/RelatedCircumscribingCircle.java:425-458)."""
    pts = [tuple(map(float, p)) for p in np.asarray(pts, dtype=np.float64)]

    def circle2(a, b):
        cx, cy = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
        r = ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2) ** 0.5 / 2.0
        return cx, cy, r

    def circle3(a, b, c):
        d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                   + c[0] * (a[1] - b[1]))
        if d == 0:
            return None
        a2 = a[0] * a[0] + a[1] * a[1]
        b2 = b[0] * b[0] + b[1] * b[1]
        c2 = c[0] * c[0] + c[1] * c[1]
        ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
        uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
        return ux, uy, ((ux - a[0]) ** 2 + (uy - a[1]) ** 2) ** 0.5

    def inside(c, p, eps=1e-9):
        return ((p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2) ** 0.5 \
            <= c[2] + eps

    def welzl(P, R):
        if not P or len(R) == 3:
            if len(R) == 0:
                return (0.0, 0.0, 0.0)
            if len(R) == 1:
                return (R[0][0], R[0][1], 0.0)
            if len(R) == 2:
                return circle2(R[0], R[1])
            c = circle3(*R)
            return c if c else circle2(R[0], R[1])
        p = P[-1]
        c = welzl(P[:-1], R)
        if inside(c, p):
            return c
        return welzl(P[:-1], R + [p])

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10 * len(pts) + 100))
    try:
        return welzl(pts, [])
    finally:
        sys.setrecursionlimit(old)


def azimuth_between_points(x1, y1, x2, y2):
    """azimuthBetweenPoints (WhiteboxGIS/resources/plugins/Scripts/
    azimuthBetweenPoints.py:7-14): bearing from north in [0, 360)°,
    θ = −atan2(Δy, Δx) + π/2 (+2π if negative). Vectorized."""
    import numpy as np
    theta = -np.arctan2(np.asarray(y2) - np.asarray(y1),
                        np.asarray(x2) - np.asarray(x1)) + np.pi / 2.0
    theta = np.where(theta < 0, theta + 2.0 * np.pi, theta)
    return np.degrees(theta)
