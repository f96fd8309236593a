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
    # float64 shadows of the circumcenter cache: the in-circle scan runs
    # in float64 with a symmetric error margin, and only the candidate
    # band is re-tested exactly in longdouble — identical decisions to
    # the pure-longdouble scan (the margin over-approximates the float64
    # rounding of values already representable near these magnitudes)
    fcx = np.zeros(cap, dtype=np.float64)
    fcy = np.zeros(cap, dtype=np.float64)
    fr2 = np.full(cap, -1.0, dtype=np.float64)
    ftol = np.zeros(cap, dtype=np.float64)   # 1e-12·(|cc|² + |r²| + 1)
    alive = np.zeros(cap, dtype=bool)
    m = 0  # high-water mark

    def _add_batch(us: np.ndarray, vs: np.ndarray, p: int):
        """Append triangles (u, v, p) with vectorized longdouble
        circumcenters — same elementwise formula the scalar version
        computed; one numpy pass instead of one Python call per
        triangle (collinear-heavy inputs like densified polygon
        boundaries re-add ~18 triangles per insertion)."""
        nonlocal m, cap, verts, ccx, ccy, cr2, fcx, fcy, fr2, ftol, alive
        k = len(us)
        while m + k > cap:
            cap *= 2
            verts = np.resize(verts, (cap, 3))
            ccx, ccy = np.resize(ccx, cap), np.resize(ccy, cap)
            cr2, alive = np.resize(cr2, cap), np.resize(alive, cap)
            fcx, fcy = np.resize(fcx, cap), np.resize(fcy, cap)
            fr2, ftol = np.resize(fr2, cap), np.resize(ftol, cap)
        ax, ay = allp[us, 0], allp[us, 1]
        bx, by = allp[vs, 0], allp[vs, 1]
        cx, cy = allp[p]
        t1, t2, t3 = by - cy, cy - ay, ay - by
        d = 2.0 * (ax * t1 + bx * t2 + cx * t3)
        safe = d != 0            # collinear sliver: never contains anything
        ds_ = np.where(safe, d, 1.0)
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * t1 + b2 * t2 + c2 * t3) / ds_
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / ds_
        ccx[m:m + k] = np.where(safe, ux, 0.0)
        ccy[m:m + k] = np.where(safe, uy, 0.0)
        cr2[m:m + k] = np.where(safe, (ux - ax) ** 2 + (uy - ay) ** 2, -1.0)
        fx = ccx[m:m + k].astype(np.float64)
        fy = ccy[m:m + k].astype(np.float64)
        fr = cr2[m:m + k].astype(np.float64)
        fcx[m:m + k] = fx
        fcy[m:m + k] = fy
        fr2[m:m + k] = fr
        ftol[m:m + k] = 1e-12 * (fx * fx + fy * fy + np.abs(fr) + 1.0)
        verts[m:m + k, 0] = us
        verts[m:m + k, 1] = vs
        verts[m:m + k, 2] = p
        alive[m:m + k] = True
        m += k

    _add_batch(np.array([n], dtype=np.int64),
               np.array([n + 1], dtype=np.int64), n + 2)

    for p in range(n):
        px, py = allp[p]
        pxf, pyf = float(px), float(py)
        # float64 prescan with a symmetric margin: the absolute error of
        # dx²+dy² vs its longdouble value is ≤ ~8·eps64·M² with M the
        # largest participating magnitude, so a 1e-12·M² margin yields a
        # strict superset of the true in-circle set; candidates are then
        # re-tested EXACTLY in longdouble — decisions identical to the
        # pure-longdouble scan (pytest-pinned against it)
        dxf = fcx[:m] - pxf
        dyf = fcy[:m] - pyf
        lhs = dxf * dxf + dyf * dyf
        cand = np.flatnonzero(alive[:m] & (lhs < fr2[:m] + ftol[:m]
                                           + 1e-12 * (pxf * pxf
                                                      + pyf * pyf)))
        if len(cand):
            dxl = ccx[cand] - px
            dyl = ccy[cand] - py
            bad = cand[dxl * dxl + dyl * dyl < cr2[cand]]
        else:
            bad = cand
        if len(bad) == 0:  # numerical corner; super-triangle covers all
            continue
        edges: dict[tuple[int, int], int] = {}
        for bi in bad:
            a, b, c = verts[bi]
            for u, v in ((a, b), (b, c), (c, a)):
                k = (u, v) if u < v else (v, u)
                edges[k] = edges.get(k, 0) + 1
        alive[bad] = False
        hole = [(u, v) for (u, v), cnt in edges.items() if cnt == 1]
        if hole:
            he = np.asarray(hole, dtype=np.int64)
            _add_batch(he[:, 0], he[:, 1], p)
        if m > 256 and m > 2 * max(1, int(alive[:m].sum())):
            keep = np.flatnonzero(alive[:m])
            k = len(keep)
            verts[:k] = verts[keep]
            ccx[:k], ccy[:k] = ccx[keep], ccy[keep]
            fcx[:k], fcy[:k] = fcx[keep], fcy[keep]
            fr2[:k], ftol[:k] = fr2[keep], ftol[keep]
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


def delaunay_many(pts_list) -> list[list[tuple[int, int, int]]]:
    """LOCKSTEP Bowyer–Watson over many independent point sets — each
    set's insertion order, circumcenter arithmetic and in-circle
    decisions are elementwise IDENTICAL to ``delaunay(pts)`` (equality
    is pytest-pinned per feature), but the per-insertion float64
    prescan runs as ONE numpy dispatch over the concatenated triangle
    slots of every feature, amortizing the numpy-call overhead that
    dominates small per-feature triangulations (densified polygon
    boundaries: ~250 points each). Per-feature Python work (hole-edge
    dict, candidate recheck grouping) is unchanged.

    Returns one sorted triangle list per input, [] for sets with < 3
    points."""
    F = len(pts_list)
    results: list[list[tuple[int, int, int]]] = [[] for _ in range(F)]
    feats = [f for f in range(F) if len(pts_list[f]) >= 3]
    if not feats:
        return results
    nf = len(feats)

    # global point table: per feature its points + supertriangle
    allps = []
    ns = np.empty(nf, dtype=np.int64)
    for i, f in enumerate(feats):
        pts = np.asarray(pts_list[f], dtype=np.longdouble)
        ns[i] = len(pts)
        minx, miny = pts[:, 0].min(), pts[:, 1].min()
        maxx, maxy = pts[:, 0].max(), pts[:, 1].max()
        span = max(float(maxx - minx), float(maxy - miny), 1.0)
        midx, midy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
        sup = np.array([[midx - 20.0 * span, midy - 10.0 * span],
                        [midx + 20.0 * span, midy - 10.0 * span],
                        [midx, midy + 20.0 * span]], dtype=np.longdouble)
        allps.append(np.vstack([pts, sup]))
    sizes = ns + 3
    pbase = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    G = np.vstack(allps)
    GX, GY = G[:, 0], G[:, 1]
    GX64 = GX.astype(np.float64)
    GY64 = GY.astype(np.float64)

    cap = int(max(64, 8 * ns.sum()))
    verts = np.zeros((cap, 3), dtype=np.int64)   # GLOBAL point ids
    fid = np.zeros(cap, dtype=np.int64)
    ccx = np.zeros(cap, dtype=np.longdouble)
    ccy = np.zeros(cap, dtype=np.longdouble)
    cr2 = np.full(cap, -1.0, dtype=np.longdouble)
    fcx = np.zeros(cap, dtype=np.float64)
    fcy = np.zeros(cap, dtype=np.float64)
    fr2 = np.full(cap, -1.0, dtype=np.float64)
    ftol = np.zeros(cap, dtype=np.float64)
    alive = np.zeros(cap, dtype=bool)
    m = 0

    def _add_slots(us, vs, pg, fids):
        nonlocal m, cap, verts, fid, ccx, ccy, cr2, fcx, fcy, fr2, \
            ftol, alive
        k = len(us)
        while m + k > cap:
            cap *= 2
            verts = np.resize(verts, (cap, 3))
            fid = np.resize(fid, cap)
            ccx, ccy = np.resize(ccx, cap), np.resize(ccy, cap)
            cr2, alive = np.resize(cr2, cap), np.resize(alive, cap)
            fcx, fcy = np.resize(fcx, cap), np.resize(fcy, cap)
            fr2, ftol = np.resize(fr2, cap), np.resize(ftol, cap)
        ax, ay = GX[us], GY[us]
        bx, by = GX[vs], GY[vs]
        cx, cy = GX[pg], GY[pg]
        t1, t2, t3 = by - cy, cy - ay, ay - by
        d = 2.0 * (ax * t1 + bx * t2 + cx * t3)
        safe = d != 0
        ds_ = np.where(safe, d, 1.0)
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * t1 + b2 * t2 + c2 * t3) / ds_
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / ds_
        ccx[m:m + k] = np.where(safe, ux, 0.0)
        ccy[m:m + k] = np.where(safe, uy, 0.0)
        cr2[m:m + k] = np.where(safe, (ux - ax) ** 2 + (uy - ay) ** 2, -1.0)
        fx = ccx[m:m + k].astype(np.float64)
        fy = ccy[m:m + k].astype(np.float64)
        fr = cr2[m:m + k].astype(np.float64)
        fcx[m:m + k] = fx
        fcy[m:m + k] = fy
        fr2[m:m + k] = fr
        ftol[m:m + k] = 1e-12 * (fx * fx + fy * fy + np.abs(fr) + 1.0)
        verts[m:m + k, 0] = us
        verts[m:m + k, 1] = vs
        verts[m:m + k, 2] = pg
        fid[m:m + k] = fids
        alive[m:m + k] = True
        m += k

    # supertriangle per feature (same order as the scalar init)
    _add_slots(pbase + ns, pbase + ns + 1, pbase + ns + 2,
               np.arange(nf, dtype=np.int64))

    nmax = int(ns.max())
    for step in range(nmax):
        act = ns > step
        pidx = pbase + np.minimum(step, ns - 1)   # valid where act
        px = GX64[pidx]
        py = GY64[pidx]
        pp = 1e-12 * (px * px + py * py)
        # one float64 prescan over ALL features' slots
        dxf = fcx[:m] - px[fid[:m]]
        dyf = fcy[:m] - py[fid[:m]]
        lhs = dxf * dxf + dyf * dyf
        cand = np.flatnonzero(alive[:m] & act[fid[:m]]
                              & (lhs < fr2[:m] + ftol[:m] + pp[fid[:m]]))
        if len(cand):
            # exact longdouble recheck (identical expression per slot)
            pgc = pidx[fid[cand]]
            dxl = ccx[cand] - GX[pgc]
            dyl = ccy[cand] - GY[pgc]
            bad = cand[dxl * dxl + dyl * dyl < cr2[cand]]
        else:
            bad = cand
        if len(bad) == 0:
            continue
        # vectorized cavity boundary across ALL features in the round:
        # edges travel as normalized global-id pairs — per-feature point
        # id ranges are disjoint, so (u, v) alone keys an edge to its
        # feature, and a count-1 edge is a hole-boundary edge. The edge
        # EMISSION order differs from the scalar dict walk, but the
        # triangle SET per insertion is order-independent (the in-circle
        # predicate is exact), which is what the scalar-equality tests
        # pin. key fits int64 for any batch < 2^31 points (asserted).
        nb = len(bad)
        tv = verts[bad]
        u3 = np.concatenate([tv[:, 0], tv[:, 1], tv[:, 2]])
        v3 = np.concatenate([tv[:, 1], tv[:, 2], tv[:, 0]])
        eu = np.minimum(u3, v3)
        ev = np.maximum(u3, v3)
        gtot = np.int64(len(G))
        assert gtot < (1 << 31), "delaunay_many: batch too large for int64 edge keys"
        _, idx_first, cnt = np.unique(eu * gtot + ev, return_index=True,
                                      return_counts=True)
        alive[bad] = False
        sel = idx_first[cnt == 1]
        if len(sel):
            ef = fid[bad[sel % nb]]     # edge's feature = its triangle's
            _add_slots(eu[sel], ev[sel], pidx[ef], ef)
        if m > 1024 and m > 2 * max(1, int(alive[:m].sum())):
            keep = np.flatnonzero(alive[:m])
            k = len(keep)
            verts[:k] = verts[keep]
            fid[:k] = fid[keep]
            ccx[:k], ccy[:k] = ccx[keep], ccy[keep]
            fcx[:k], fcy[:k] = fcx[keep], fcy[keep]
            fr2[:k], ftol[:k] = fr2[keep], ftol[keep]
            cr2[:k], alive[:k] = cr2[keep], True
            alive[k:m] = False
            m = k

    live = np.flatnonzero(alive[:m])
    lv = verts[live] - pbase[fid[live], None]    # feature-local ids
    lf = fid[live]
    for i, f in enumerate(feats):
        mine = lv[lf == i]
        keep = (mine < ns[i]).all(axis=1)
        results[f] = sorted(tuple(sorted(int(v) for v in t))
                            for t in mine[keep])
    return results
