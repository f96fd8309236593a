"""Distributed TIN / Voronoi / rasterize-TIN == single-process mirrors.

The distributed construction's ghost-margin assumption (every
circumradius < margin) is VALIDATED here: any violation changes the
triangle set and fails the set-equality assertions.
"""

import numpy as np
import pandas as pd
import pytest

from whitebox_geospatial_analysis_tools_ray.core.delaunay import (
    delaunay, delaunay_neighbors, voronoi_cell)
from whitebox_geospatial_analysis_tools_ray.stages import tin

SF = "/root/testdata/sf0.001"


def _mirror_core_sets():
    """Global triangulation → triangles as rec_id triples, grouped by
    circumcenter tile, data-only."""
    rid, xy, z, tris = tin.tin_mirror(SF)
    per_tile = {}
    for t in tris:
        a, b, c = xy[t[0]], xy[t[1]], xy[t[2]]
        den = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                     + c[0] * (a[1] - b[1]))
        if den == 0:
            continue
        a2, b2, c2 = a @ a, b @ b, c @ c
        ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / den
        uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / den
        tx = int(np.floor((ux - tin.WEST) / tin.TILE))
        ty = int(np.floor((uy - tin.SOUTH) / tin.TILE))
        if not (0 <= tx < tin.NX and 0 <= ty < tin.NY):
            continue
        ids = tuple(sorted(int(rid[v]) for v in t))
        per_tile.setdefault(ty * tin.NX + tx, set()).add(ids)
    return rid, xy, z, per_tile


def test_construct_tin_matches_mirror(ray_session):
    rid, xy, z, per_tile = _mirror_core_sets()
    got = tin.construct_tin(SF).to_pandas()
    id2i = {int(r): i for i, r in enumerate(rid)}
    for row in got.itertuples():
        tris = {t for t in per_tile.get(int(row.tile), set())
                if all(i >= 0 for i in t)}
        assert row.n_triangles == len(tris)
        area = 0.0
        for t in tris:
            a, b, c = (xy[id2i[t[0]]], xy[id2i[t[1]]], xy[id2i[t[2]]])
            area += abs((b[0] - a[0]) * (c[1] - a[1])
                        - (c[0] - a[0]) * (b[1] - a[1])) / 2.0
        assert row.area_sum == pytest.approx(area, abs=1e-5)
    assert got["n_triangles"].sum() > 100


def test_voronoi_matches_mirror_and_is_exhaustive(ray_session):
    rid, xy, z, _ = _mirror_core_sets()
    _, _, _, tris = tin.tin_mirror(SF)
    nbr = delaunay_neighbors(tris, len(xy))
    got = tin.voronoi_areas(SF).to_pandas()
    extent = (tin.WEST, tin.SOUTH, tin.EAST, tin.NORTH)
    want = {}
    for i in range(len(xy)):
        if rid[i] < 0:
            continue
        cell = voronoi_cell(xy[i], xy[sorted(nbr[i])], extent)
        if len(cell) < 3:
            a = 0.0
        else:
            cx, cy = cell[:, 0], cell[:, 1]
            a = 0.5 * abs(np.dot(cx, np.roll(cy, -1))
                          - np.dot(cy, np.roll(cx, -1)))
        want[int(rid[i])] = round(float(a), 6)
    assert len(got) == len(want)
    for row in got.itertuples():
        assert row.cell_area == pytest.approx(want[int(row.rec_id)],
                                              abs=1e-4), row.rec_id


def test_voronoi_areas_tile_extent(ray_session):
    """Data + frame cells partition the extent; data-site areas must sum
    to extent area minus the frame intrusions — bounded sanity check."""
    got = tin.voronoi_areas(SF).to_pandas()
    total = got["cell_area"].sum()
    extent_area = (tin.EAST - tin.WEST) * (tin.NORTH - tin.SOUTH)
    assert 0.5 * extent_area < total <= extent_area + 0.01


def test_rasterize_tin_matches_mirror(ray_session):
    grid = 60
    got = tin.rasterize_tin(SF, grid=grid).to_pandas()
    assert len(got) == grid * grid
    rid, xy, z, tris = tin.tin_mirror(SF)
    res_x = (tin.EAST - tin.WEST) / grid
    res_y = (tin.NORTH - tin.SOUTH) / grid
    cells = got["cell"].to_numpy()
    px = tin.WEST + (cells % grid + 0.5) * res_x
    py = tin.SOUTH + (cells // grid + 0.5) * res_y
    want = np.full(len(cells), -32768.0)
    done = np.zeros(len(cells), dtype=bool)
    for a, b, c in tris:
        (ax, ay), (bx, by), (cx, cy) = xy[a], xy[b], xy[c]
        den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if den == 0:
            continue
        w1 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / den
        w2 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / den
        w3 = 1.0 - w1 - w2
        m = (~done) & (w1 >= 0) & (w2 >= 0) & (w3 >= 0)
        if m.any():
            want[m] = w1[m] * z[a] + w2[m] * z[b] + w3[m] * z[c]
            done |= m
    np.testing.assert_allclose(got["z"].to_numpy(), want, atol=1e-5)
    covered = (got["z"] != -32768.0).sum()
    assert covered > 0.9 * len(got)  # frame ring keeps extent covered
    # determinism
    again = tin.rasterize_tin(SF, grid=grid).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_delaunay_prescan_matches_pure_longdouble_scan():
    """The float64 in-circle prescan + longdouble recheck must make
    decisions IDENTICAL to a pure-longdouble Bowyer-Watson — pinned
    with a literal scalar mirror, including collinear grids and
    cocircular rings where the tie-breaking is the frozen semantics."""
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.core.delaunay import delaunay

    def bw_mirror(points):
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
        tris = []   # [a, b, c, ux, uy, r2] rows, scalar longdouble math

        def add(a, b, c):
            ax, ay = allp[a]
            bx, by = allp[b]
            cx, cy = allp[c]
            d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
            if d == 0:
                tris.append([a, b, c, np.longdouble(0), np.longdouble(0),
                             np.longdouble(-1)])
            else:
                a2 = ax * ax + ay * ay
                b2 = bx * bx + by * by
                c2 = cx * cx + cy * cy
                ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
                uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
                tris.append([a, b, c, ux, uy,
                             (ux - ax) ** 2 + (uy - ay) ** 2])

        add(n, n + 1, n + 2)
        for p in range(n):
            px, py = allp[p]
            bad = [i for i, t in enumerate(tris)
                   if (t[3] - px) ** 2 + (t[4] - py) ** 2 < t[5]]
            if not bad:
                continue
            edges = {}
            for bi in bad:
                a, b, c = tris[bi][0], tris[bi][1], tris[bi][2]
                for u, v in ((a, b), (b, c), (c, a)):
                    k = (u, v) if u < v else (v, u)
                    edges[k] = edges.get(k, 0) + 1
            for bi in sorted(bad, reverse=True):
                tris.pop(bi)
            for (u, v), cnt in edges.items():
                if cnt == 1:
                    add(u, v, p)
        out = [tuple(sorted((t[0], t[1], t[2]))) for t in tris
               if max(t[0], t[1], t[2]) < n]
        return sorted(out)

    rng = np.random.default_rng(31)
    grid = np.stack(np.meshgrid(np.arange(6.0), np.arange(6.0)),
                    -1).reshape(-1, 2)
    th = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    ring = np.column_stack([np.cos(th) * 50 + 100, np.sin(th) * 50 + 100])
    cases = [rng.uniform(0, 1000, (40, 2)), grid, ring,
             np.column_stack([np.linspace(0, 9, 10), np.zeros(10)]),
             rng.uniform(1e6, 1e6 + 100, (30, 2))]
    for pts in cases:
        assert delaunay(pts) == bw_mirror(pts)


def test_delaunay_many_matches_scalar():
    """The lockstep batched Bowyer-Watson must produce EXACTLY the
    scalar delaunay() output per feature — random sets, collinear
    grids, cocircular rings, degenerate (<3, 0) sets, densified
    L-boundaries (the find_polygon_midline shape), big-offset coords."""
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.core.delaunay import (
        delaunay, delaunay_many)
    from whitebox_geospatial_analysis_tools_ray.stages.vector_overlay import (
        _l_ring)

    def densify(xa, ya, h, w2, d=8.0):
        ring = _l_ring(xa, ya, h, w2)
        segs = []
        for k in range(len(ring)):
            p0 = ring[k]
            p1 = ring[(k + 1) % len(ring)]
            steps = max(1, int(np.hypot(*(p1 - p0)) // d))
            ts = np.arange(steps) / steps
            segs.append(p0 + (p1 - p0)[None, :] * ts[:, None])
        return np.concatenate(segs)

    rng = np.random.default_rng(9)
    cases = [rng.uniform(0, 1000, (int(rng.integers(3, 200)), 2))
             for _ in range(10)]
    cases += [densify(float(rng.uniform(0, 1000)),
                      float(rng.uniform(0, 1000)),
                      float(rng.uniform(10, 209)),
                      float(rng.uniform(20, 116))) for _ in range(10)]
    grid = np.stack(np.meshgrid(np.arange(6.0), np.arange(6.0)),
                    -1).reshape(-1, 2)
    th = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    cases += [grid,
              np.column_stack([np.cos(th) * 50 + 100,
                               np.sin(th) * 50 + 100]),
              rng.uniform(1e6, 1e6 + 100, (30, 2)),
              np.zeros((1, 2)), np.zeros((0, 2)),
              np.column_stack([np.linspace(0, 9, 10), np.zeros(10)])]
    assert delaunay_many(cases) == [delaunay(p) for p in cases]
