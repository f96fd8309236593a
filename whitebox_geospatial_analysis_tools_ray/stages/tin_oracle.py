"""Exact DuckDB mirrors for the TIN family (round-4: construct_tin and
voronoi_areas were rows-only).

Both rest on stages/tin.py's documented partitioning assumption: every
Delaunay circumradius of the (data + frame-ring) point set is < MARGIN.
Hence a true Delaunay triangle has all sides < 2·MARGIN and an EMPTY
circumcircle of radius < MARGIN — the SQL enumerates side-bounded
candidate triples, computes circumcenters with the impl's exact
determinant expressions, and keeps the triples whose circumcircle
contains no other point (a MARGIN-grid-bucketed anti-join, so the
containment scan only touches the 9 buckets around each center). The
conformance tests pin the distributed per-tile build to exactly this
global triangle set, so the oracle needs no Bowyer–Watson replay.

``voronoi_areas``: the impl clips the extent rectangle by one
half-plane per Delaunay neighbour in ascending rec_id order
(core/delaunay.voronoi_cell). The SQL replays that as a recursive
Sutherland–Hodgman pass — polygon vertices as (site, step, pos) rows,
one neighbour clip per recursion step, the identical keep/intersect
expressions (d >= 0 keeps, strict sign change interpolates
t = d/(d−dq)) — and the shoelace over the final rows. NOTE: the base
polygon is CAST to DOUBLE explicitly; DuckDB types literals like
4000.0 as DECIMAL(5,1), which would silently quantize every
interpolated vertex to one decimal through the recursive CTE.
"""

from __future__ import annotations

from ..core.features import POINTS_CTE
from ..core.rng import EAST, NORTH, SOUTH, WEST
from .tin import MARGIN, NX, TILE, frame_points


def _tin_tri_ctes() -> str:
    fr = frame_points()
    frame_vals = ", ".join(f"({-(i + 1)}, {x!r}, {y!r})"
                           for i, (x, y) in enumerate(fr))
    m2 = repr(2 * MARGIN)
    m2sq = repr((2 * MARGIN) ** 2)
    mg = repr(MARGIN)
    return f"""{POINTS_CTE},
allp AS MATERIALIZED (
  SELECT rec_id, x, y FROM pts
  UNION ALL
  SELECT * FROM (VALUES {frame_vals}) f(rec_id, x, y)),
pb AS MATERIALIZED (
  SELECT rec_id, x, y,
         CAST(floor(x / {mg}) AS BIGINT) AS gx,
         CAST(floor(y / {mg}) AS BIGINT) AS gy
  FROM allp),
pairs AS MATERIALIZED (
  SELECT a.rec_id AS ia, b.rec_id AS ib
  FROM allp a JOIN allp b
    ON b.rec_id > a.rec_id
   AND abs(a.x - b.x) < {m2} AND abs(a.y - b.y) < {m2}
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) < {m2sq}),
tris0 AS MATERIALIZED (
  SELECT p1.ia AS i, p1.ib AS j, p2.ib AS k
  FROM pairs p1 JOIN pairs p2 ON p2.ia = p1.ib
  JOIN pairs p3 ON p3.ia = p1.ia AND p3.ib = p2.ib),
tric AS MATERIALIZED (
  SELECT t.i, t.j, t.k, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by,
         c.x AS cx, c.y AS cy,
         2.0 * (a.x * (b.y - c.y) + b.x * (c.y - a.y)
                + c.x * (a.y - b.y)) AS den
  FROM tris0 t
  JOIN allp a ON a.rec_id = t.i
  JOIN allp b ON b.rec_id = t.j
  JOIN allp c ON c.rec_id = t.k),
circ AS MATERIALIZED (
  SELECT i, j, k, ax, ay, bx, by, cx, cy,
    ((ax*ax + ay*ay) * (by - cy) + (bx*bx + by*by) * (cy - ay)
     + (cx*cx + cy*cy) * (ay - by)) / den AS ux,
    ((ax*ax + ay*ay) * (cx - bx) + (bx*bx + by*by) * (ax - cx)
     + (cx*cx + cy*cy) * (bx - ax)) / den AS uy
  FROM tric WHERE den <> 0),
cand AS MATERIALIZED (
  SELECT *,
         CAST(floor(ux / {mg}) AS BIGINT) AS gx,
         CAST(floor(uy / {mg}) AS BIGINT) AS gy
  FROM circ
  WHERE (ux - ax) * (ux - ax) + (uy - ay) * (uy - ay) < {mg} * {mg}),
del_tris AS MATERIALIZED (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM pb p
    WHERE p.gx BETWEEN c.gx - 1 AND c.gx + 1
      AND p.gy BETWEEN c.gy - 1 AND c.gy + 1
      AND p.rec_id NOT IN (c.i, c.j, c.k)
      AND (p.x - c.ux) * (p.x - c.ux) + (p.y - c.uy) * (p.y - c.uy)
          < (c.ux - c.ax) * (c.ux - c.ax)
            + (c.uy - c.ay) * (c.uy - c.ay)))"""


def construct_tin_sql(round_to: int = 6) -> str:
    """Mirror of stages/tin.construct_tin: data-only Delaunay triangles
    grouped by the tile containing their circumcenter."""
    from .tin import NY
    return f"""
WITH {_tin_tri_ctes()},
per_tile AS (
  SELECT CAST(CAST(floor(uy / {TILE!r}) AS BIGINT) * {NX}
              + CAST(floor(ux / {TILE!r}) AS BIGINT) AS BIGINT) AS tile,
         CAST(count(*) AS BIGINT) AS n_triangles,
         round(sum(abs((bx - ax) * (cy - ay)
                       - (cx - ax) * (by - ay)) / 2.0), {round_to})
           AS area_sum
  FROM del_tris
  WHERE i >= 0 AND j >= 0 AND k >= 0
    AND ux >= {WEST!r} AND ux < {EAST!r}
    AND uy >= {SOUTH!r} AND uy < {NORTH!r}
  GROUP BY 1)
-- tile scaffold: the impl emits every grid tile (0 triangles on an
-- empty/degenerate group), so the oracle must too
SELECT s.tile, COALESCE(p.n_triangles, 0::BIGINT) AS n_triangles,
       COALESCE(p.area_sum, 0.0) AS area_sum
FROM (SELECT CAST(range AS BIGINT) AS tile
      FROM range(0, {NX * NY})) s
LEFT JOIN per_tile p ON p.tile = s.tile
ORDER BY s.tile
"""


def voronoi_areas_sql(round_to: int = 6, max_nbrs: int = 40) -> str:
    """Mirror of stages/tin.voronoi_areas (see module docstring)."""
    return f"""
WITH RECURSIVE {_tin_tri_ctes()},
edges AS MATERIALIZED (
  SELECT i AS s, j AS t FROM del_tris UNION
  SELECT j, i FROM del_tris UNION
  SELECT i, k FROM del_tris UNION SELECT k, i FROM del_tris UNION
  SELECT j, k FROM del_tris UNION SELECT k, j FROM del_tris),
nbr AS MATERIALIZED (
  SELECT e.s AS rec_id, e.t AS nb, p.x AS nx, p.y AS ny,
         row_number() OVER (PARTITION BY e.s ORDER BY e.t) AS k
  FROM edges e JOIN allp p ON p.rec_id = e.t
  WHERE e.s >= 0),
sites AS MATERIALIZED (
  SELECT rec_id, x, y FROM allp WHERE rec_id >= 0),
clip(step, rec_id, pos, px, py) AS (
  SELECT 0, rec_id, pos, CAST(px AS DOUBLE), CAST(py AS DOUBLE)
  FROM sites CROSS JOIN (VALUES
    (0, {WEST!r}, {SOUTH!r}), (1, {EAST!r}, {SOUTH!r}),
    (2, {EAST!r}, {NORTH!r}), (3, {WEST!r}, {NORTH!r})) v(pos, px, py)
  UNION ALL
  (WITH cur AS (SELECT * FROM clip WHERE step < {max_nbrs}),
   st AS (SELECT max(step) AS s FROM cur),
   act AS (
     SELECT c.rec_id, c.pos, c.px, c.py,
            (s.x + n.nx) / 2.0 AS mx, (s.y + n.ny) / 2.0 AS my,
            s.x - n.nx AS dx, s.y - n.ny AS dy
     FROM cur c
     JOIN st ON TRUE
     JOIN sites s ON s.rec_id = c.rec_id
     JOIN nbr n ON n.rec_id = c.rec_id AND n.k = st.s + 1),
   dd AS (
     SELECT *, (px - mx) * dx + (py - my) * dy AS d,
            lead(px) OVER w AS qx, lead(py) OVER w AS qy,
            lead((px - mx) * dx + (py - my) * dy) OVER w AS dq,
            first_value(px) OVER w AS fx, first_value(py) OVER w AS fy,
            first_value((px - mx) * dx + (py - my) * dy) OVER w AS df
     FROM act
     WINDOW w AS (PARTITION BY rec_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING)),
   cyc AS (SELECT rec_id, pos, px, py, d,
                  COALESCE(qx, fx) AS qx, COALESCE(qy, fy) AS qy,
                  COALESCE(dq, df) AS dq
           FROM dd),
   outv AS (
     SELECT rec_id, pos * 2 AS opos, px, py FROM cyc WHERE d >= 0
     UNION ALL
     SELECT rec_id, pos * 2 + 1,
            px + (d / (d - dq)) * (qx - px),
            py + (d / (d - dq)) * (qy - py)
     FROM cyc WHERE (d > 0 AND dq < 0) OR (d < 0 AND dq > 0))
   SELECT st.s + 1, rec_id,
          row_number() OVER (PARTITION BY rec_id ORDER BY opos) - 1,
          px, py
   FROM outv CROSS JOIN st)
),
fin AS (
  SELECT rec_id, step, pos, px, py FROM
    (SELECT *, max(step) OVER (PARTITION BY rec_id) AS ms FROM clip)
  WHERE step = ms),
nk AS (SELECT rec_id, max(k) AS n_nbrs FROM nbr GROUP BY rec_id),
sh AS (SELECT rec_id, step, pos, px, py,
              COALESCE(lead(px) OVER w, first_value(px) OVER w) AS qx,
              COALESCE(lead(py) OVER w, first_value(py) OVER w) AS qy
       FROM fin
       WINDOW w AS (PARTITION BY rec_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING)),
ar AS (
  SELECT rec_id, max(step) AS st2, count(*) AS nverts,
         0.5 * abs(sum(px * qy - py * qx)) AS area
  FROM sh GROUP BY rec_id)
SELECT s.rec_id,
       round(CASE WHEN ar.rec_id IS NULL OR ar.nverts < 3
                    OR ar.st2 < COALESCE(nk.n_nbrs, 0) THEN 0.0
                  ELSE ar.area END, {round_to}) AS cell_area
FROM sites s
LEFT JOIN ar ON ar.rec_id = s.rec_id
LEFT JOIN nk ON nk.rec_id = s.rec_id
ORDER BY s.rec_id
"""

def rasterize_tin_sql(grid: int = 120, round_to: int = 6) -> str:
    """Mirror of stages/tin.rasterize_tin: per cell center, barycentric
    z from the FIRST containing facet in sorted-triple order (local
    sorted triples map monotonically to global (i, j, k) rec_id
    order), NoData −32768 outside every facet; identical barycentric
    expressions, bbox-pruned containment join."""
    res_x = (EAST - WEST) / grid
    res_y = (NORTH - SOUTH) / grid
    return f"""
WITH {_tin_tri_ctes()},
zs AS MATERIALIZED (
  SELECT rec_id, z FROM pts
  UNION ALL
  SELECT rec_id, 0.0 FROM allp WHERE rec_id < 0),
trz AS MATERIALIZED (
  SELECT t.*, za.z AS zi, zb.z AS zj, zc.z AS zk,
         (t.by - t.cy) * (t.ax - t.cx)
         + (t.cx - t.bx) * (t.ay - t.cy) AS bden
  FROM del_tris t
  JOIN zs za ON za.rec_id = t.i
  JOIN zs zb ON zb.rec_id = t.j
  JOIN zs zc ON zc.rec_id = t.k),
cells AS MATERIALIZED (
  SELECT i AS cell,
         {WEST!r} + ((i % {grid}) + 0.5) * {res_x!r} AS gx,
         {SOUTH!r} + ((i // {grid}) + 0.5) * {res_y!r} AS gy
  FROM range(0, {grid * grid}) t(i)),
cont AS (
  SELECT c.cell,
         ((t.by - t.cy) * (c.gx - t.cx)
          + (t.cx - t.bx) * (c.gy - t.cy)) / t.bden AS w1,
         ((t.cy - t.ay) * (c.gx - t.cx)
          + (t.ax - t.cx) * (c.gy - t.cy)) / t.bden AS w2,
         t.zi, t.zj, t.zk, t.i, t.j, t.k
  FROM cells c JOIN trz t
    ON t.bden <> 0
   AND c.gx >= least(t.ax, t.bx, t.cx)
   AND c.gx <= greatest(t.ax, t.bx, t.cx)
   AND c.gy >= least(t.ay, t.by, t.cy)
   AND c.gy <= greatest(t.ay, t.by, t.cy)),
hit AS (
  SELECT cell, w1 * zi + w2 * zj + (1.0 - w1 - w2) * zk AS zv,
         row_number() OVER (PARTITION BY cell
                            ORDER BY i, j, k) AS rn
  FROM cont
  WHERE w1 >= 0 AND w2 >= 0 AND (1.0 - w1 - w2) >= 0)
-- zero DATA points: no surface (the frame-only scaffold is
-- cocircular-degenerate; the impl emits NoData — shared rule)
SELECT c.cell,
       CASE WHEN (SELECT count(*) FROM pts) = 0 THEN -32768.0
            ELSE round(COALESCE(h.zv, -32768.0), {round_to}) END AS z
FROM cells c LEFT JOIN hit h ON h.cell = c.cell AND h.rn = 1
ORDER BY c.cell
"""
