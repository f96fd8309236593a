"""From-scratch Delaunay triangulation (Bowyer–Watson) + Voronoi duals.

The reference delegates to JTS: ConstructTIN.groovy:251-253
(``DelaunayTriangulationBuilder``), VectorTools/src/plugins/
VoronoiDiagram.java:24 (``VoronoiDiagramBuilder``), RasterizeTIN.groovy
(z interpolation per cell). No JTS/scipy here, so the engine owns the
triangulator.

Bowyer–Watson incremental insertion with a super-triangle; the
in-circumcircle test runs vectorized over cached circumcenters in
extended precision (``np.longdouble``). For point sets with no 4
cocircular sites (our geocoded doubles; degeneracy is measure-zero)
the Delaunay triangulation is UNIQUE, so the triangle set is
independent of insertion order — which is what makes the per-tile
ghost-point construction in stages/tin.py deterministic and
tiling-invariant.

Voronoi: a site's Voronoi cell is the intersection of the half-planes
toward its Delaunay neighbours (classic duality), so a clipped cell =
extent rectangle ∩ those half-planes via convex/half-plane clipping.
"""

from __future__ import annotations

import numpy as np


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Triangle index triples (each sorted, list sorted) of the Delaunay
    triangulation of ``points`` (n×2). O(n) circumcircle scans per
    insertion → O(n²) worst case, vectorized; fine for per-tile sets."""
    pts = np.asarray(points, dtype=np.longdouble)
    n = len(pts)
    if n < 3:
        return []
    minx, miny = pts[:, 0].min(), pts[:, 1].min()
    maxx, maxy = pts[:, 0].max(), pts[:, 1].max()
    span = max(float(maxx - minx), float(maxy - miny), 1.0)
    midx, midy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    sup = np.array([[midx - 20.0 * span, midy - 10.0 * span],
                    [midx + 20.0 * span, midy - 10.0 * span],
                    [midx, midy + 20.0 * span]], dtype=np.longdouble)
    allp = np.vstack([pts, sup])

    cap = max(32, 8 * n)
    verts = np.zeros((cap, 3), dtype=np.int64)
    ccx = np.zeros(cap, dtype=np.longdouble)
    ccy = np.zeros(cap, dtype=np.longdouble)
    cr2 = np.full(cap, -1.0, dtype=np.longdouble)
    alive = np.zeros(cap, dtype=bool)
    m = 0  # high-water mark

    def _add(a: int, b: int, c: int):
        nonlocal m, cap, verts, ccx, ccy, cr2, alive
        if m == cap:
            cap *= 2
            verts = np.resize(verts, (cap, 3))
            ccx, ccy = np.resize(ccx, cap), np.resize(ccy, cap)
            cr2, alive = np.resize(cr2, cap), np.resize(alive, cap)
        ax, ay = allp[a]
        bx, by = allp[b]
        cx, cy = allp[c]
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0:  # collinear sliver: never contains anything
            ccx[m], ccy[m], cr2[m] = 0.0, 0.0, -1.0
        else:
            a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
            ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
            uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
            ccx[m], ccy[m], cr2[m] = ux, uy, (ux - ax) ** 2 + (uy - ay) ** 2
        verts[m] = (a, b, c)
        alive[m] = True
        m += 1

    _add(n, n + 1, n + 2)

    for p in range(n):
        px, py = allp[p]
        dx = ccx[:m] - px
        dy = ccy[:m] - py
        bad = np.flatnonzero(alive[:m] & (dx * dx + dy * dy < cr2[:m]))
        if len(bad) == 0:  # numerical corner; super-triangle covers all
            continue
        edges: dict[tuple[int, int], int] = {}
        for bi in bad:
            a, b, c = verts[bi]
            for u, v in ((a, b), (b, c), (c, a)):
                k = (u, v) if u < v else (v, u)
                edges[k] = edges.get(k, 0) + 1
        alive[bad] = False
        for (u, v), cnt in edges.items():
            if cnt == 1:
                _add(int(u), int(v), p)
        if m > 4 * max(1, int(alive[:m].sum())) and m > 1024:
            keep = np.flatnonzero(alive[:m])
            k = len(keep)
            verts[:k] = verts[keep]
            ccx[:k], ccy[:k] = ccx[keep], ccy[keep]
            cr2[:k], alive[:k] = cr2[keep], True
            alive[k:m] = False
            m = k

    live = verts[np.flatnonzero(alive[:m])]
    out = [tuple(sorted(int(v) for v in t)) for t in live
           if not (t >= n).any()]
    return sorted(out)


def delaunay_neighbors(tris: list[tuple[int, int, int]],
                       n: int) -> list[set[int]]:
    nbr: list[set[int]] = [set() for _ in range(n)]
    for a, b, c in tris:
        nbr[a].update((b, c))
        nbr[b].update((a, c))
        nbr[c].update((a, b))
    return nbr


def halfplane_clip(poly: np.ndarray, sx: float, sy: float,
                   nx_: float, ny_: float) -> np.ndarray:
    """Clip convex ``poly`` to the half-plane of points closer to
    s=(sx,sy) than to m=(nx_,ny_): dot(q − mid, s − m) ≥ 0."""
    mx, my = (sx + nx_) / 2.0, (sy + ny_) / 2.0
    dx, dy = sx - nx_, sy - ny_
    out = []
    k = len(poly)
    d = (poly[:, 0] - mx) * dx + (poly[:, 1] - my) * dy
    for i in range(k):
        j = (i + 1) % k
        if d[i] >= 0:
            out.append(poly[i])
        if (d[i] > 0 > d[j]) or (d[i] < 0 < d[j]):
            t = d[i] / (d[i] - d[j])
            out.append(poly[i] + t * (poly[j] - poly[i]))
    return np.asarray(out) if out else np.empty((0, 2))


def voronoi_cell(site_xy, nbr_xy: np.ndarray,
                 extent: tuple[float, float, float, float]) -> np.ndarray:
    """Voronoi cell of a site clipped to the extent rectangle."""
    x0, y0, x1, y1 = extent
    poly = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)
    sx, sy = float(site_xy[0]), float(site_xy[1])
    for nx_, ny_ in np.asarray(nbr_xy, dtype=float):
        if len(poly) == 0:
            break
        poly = halfplane_clip(poly, sx, sy, nx_, ny_)
    return poly
