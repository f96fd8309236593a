"""Exact DuckDB replay oracle for raster_to_vector_lines (round-4
verdict item 5: it was one of six rows-only queries).

RasterToVectorLines.java's loops 2 (in-place row-major thinning) and 4
(the mutating line trace) are sequential state machines: every step
reads and writes a shared cell grid, and trace N's consumed cells
decide where trace N+1 may start. The replay carries that grid as a
SPLICED DIGIT STRING over the (sparse) keep-cell universe inside two
recursive CTEs — the bounded-table trick that cracked the BPE and JPEG
oracles:

- ``kidx`` densely indexes the keep cells (loop 1 is vectorized SQL
  over the synth rule) in row-major order; ``nbr`` precomputes each
  cell's 8 neighbour indexes (0 = outside the universe, reads as '0').
- ``loop2`` replays the thinning pass one cell per iteration: the
  current cell's 8 neighbour chars are matched against the 8 erosion
  masks (a literal VALUES table) and the cell is spliced to '0' on the
  first match — neighbour reads see all earlier writes, exactly like
  the Java in-place scan.
- ``trace`` replays loop 4 as a one-row state machine (mode scan/walk)
  over the neighbour-count digit string: scan finds the next
  ``temp == 1`` cell with strpos, walk consumes cells via splices,
  chooses ``min(dir)`` among >0 neighbours (the Java first-hit order),
  follows the value==2 / value>=0 / dead-end branches literally, and
  emits one tagged row per flushed polyline. Point-sum accumulation
  order equals the Java emission order, so the float64 sums are
  bit-identical before the final round().

Cost: O(steps × universe) character work — ~30k iterations × ~25 KB
strings at the 256² default, a few hundred MB of string copies inside
DuckDB. Sequential by nature; the parallel impl is the Ray one, this
is its independent oracle.
"""

from __future__ import annotations

from .thinning import THIN_ELEMENTS, THIN_VALS

# trace/thinning direction order (RasterToVectorLines.java)
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _dirs_values() -> str:
    return ", ".join(f"({i}, {_DX[i]}, {_DY[i]})" for i in range(8))


def _masks_values() -> str:
    rows = []
    for mid, (el, vl) in enumerate(zip(THIN_ELEMENTS, THIN_VALS)):
        for e, v in zip(el, vl):
            rows.append(f"({mid}, {e}, '{v}')")
    return ", ".join(rows)


def raster_to_vector_lines_sql(rows: int = 256, cols: int = 256,
                               fg_threshold: float = 650.0,
                               min_line_length: int = 2,
                               round_to: int = 4,
                               max_steps: int = 400_000) -> str:
    R, C = rows, cols
    return f"""
WITH RECURSIVE
dirs(dir, dx, dy) AS (VALUES {_dirs_values()}),
masks(mask_id, pos, val) AS (VALUES {_masks_values()}),
cells AS (
  SELECT t.i AS cell, CAST(t.i // {C} AS INTEGER) AS r,
         CAST(t.i % {C} AS INTEGER) AS c,
         CASE WHEN (t.i*2246822519+1013904223)%4294967296%17=0
              THEN -32768.0
              ELSE ((t.i*2654435761)%4294967296)/4294967296.0*1000.0
         END AS z
  FROM (SELECT unnest(range({R * C})) AS i) t),
fgt AS (
  SELECT r, c,
         CASE WHEN z <> -32768.0 AND z > {fg_threshold} THEN 1 ELSE 0
         END AS v
  FROM cells),
nsum AS (
  SELECT a.r, a.c, a.v, coalesce(sum(b.v), 0) AS ns
  FROM fgt a
  CROSS JOIN dirs d
  LEFT JOIN fgt b ON b.r = a.r + d.dy AND b.c = a.c + d.dx
  GROUP BY a.r, a.c, a.v),
kidx AS (
  SELECT r, c,
         CAST(row_number() OVER (ORDER BY r, c) AS INTEGER) AS idx
  FROM nsum WHERE v = 1 AND ns > 0 AND ns < 8),
nk AS (SELECT CAST(count(*) AS INTEGER) AS n FROM kidx),
nbr AS (
  SELECT a.idx, d.dir, coalesce(b.idx, 0) AS nidx
  FROM kidx a
  CROSS JOIN dirs d
  LEFT JOIN kidx b ON b.r = a.r + d.dy AND b.c = a.c + d.dx),
-- loop 2: one row-major in-place thinning pass, one cell per step.
-- every keep cell starts '1' and only the processed cell mutates, so
-- step i processes exactly cell i and neighbour reads see all earlier
-- zeroings.
loop2(i, s) AS (
  SELECT 0, repeat('1', (SELECT n FROM nk))
  UNION ALL
  SELECT l.i + 1,
         CASE WHEN EXISTS (
             SELECT 1
             FROM masks m JOIN nbr nb
               ON nb.idx = l.i + 1 AND nb.dir = m.pos
             GROUP BY m.mask_id
             HAVING bool_and(
               (CASE WHEN nb.nidx = 0 THEN '0'
                     ELSE substr(l.s, nb.nidx, 1) END) = m.val))
         THEN substr(l.s, 1, l.i) || '0' || substr(l.s, l.i + 2)
         ELSE l.s END
  FROM loop2 l WHERE l.i < (SELECT n FROM nk)),
thinned AS (SELECT s FROM loop2 WHERE i = (SELECT n FROM nk)),
-- loop 3: neighbour-count digits over the thinned grid
t0 AS (
  SELECT coalesce(string_agg(CAST(cnt AS VARCHAR), '' ORDER BY idx),
                  '') AS s
  FROM (
    SELECT a.idx,
           CASE WHEN substr(th.s, a.idx, 1) = '1' THEN
             (SELECT count(*) FROM nbr nb
              WHERE nb.idx = a.idx AND nb.nidx > 0
                AND substr(th.s, nb.nidx, 1) = '1')
           ELSE 0 END AS cnt
    FROM kidx a, thinned th)),
-- loop 4: the mutating trace as a one-row state machine.
-- mode 0 = scanning (p = row-major scan pointer), 1 = walking.
trace(step, mode, p, cur, pd, td, fid, npts, sx, sy, s,
      emit, out_np, out_sx, out_sy) AS (
  SELECT 0, 0, 1, 0, 0, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         0.0, 0.0, (SELECT s FROM t0),
         FALSE, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
         CAST(NULL AS DOUBLE)
  UNION ALL
  SELECT t.step + 1,
         CASE WHEN t.mode = 0 THEN 1
              WHEN w.vch = '2' THEN 1
              ELSE 0 END AS mode,
         CASE WHEN t.mode = 0 THEN f.start + 1 ELSE t.p END AS p,
         CASE WHEN t.mode = 0 THEN f.start
              WHEN w.d IS NULL THEN t.cur
              ELSE w.nx END AS cur,
         CASE WHEN t.mode = 0 THEN -1 ELSE t.td END AS pd,
         CASE WHEN t.mode = 0 THEN 0
              WHEN w.d IS NULL THEN -1
              ELSE w.d END AS td,
         t.fid + (CASE WHEN t.mode = 1 AND (w.d IS NULL OR w.vch <> '2')
                        AND w.npts2 >= {min_line_length}
                  THEN 1 ELSE 0 END) AS fid,
         CASE WHEN t.mode = 0 THEN CAST(0 AS BIGINT)
              ELSE w.npts2 END AS npts,
         CASE WHEN t.mode = 0 THEN 0.0 ELSE w.sx2 END AS sx,
         CASE WHEN t.mode = 0 THEN 0.0 ELSE w.sy2 END AS sy,
         CASE WHEN t.mode = 0 THEN t.s ELSE w.s2 END AS s,
         (t.mode = 1 AND (w.d IS NULL OR w.vch <> '2')
          AND w.npts2 >= {min_line_length}) AS emit,
         w.npts2 AS out_np, w.sx2 AS out_sx, w.sy2 AS out_sy
  FROM trace t
  -- scan: next start cell = first temp=='1' at/after p (0 if none)
  LEFT JOIN LATERAL (
    SELECT CASE WHEN t.mode <> 0 THEN 0
                WHEN strpos(substr(t.s, t.p), '1') = 0 THEN 0
                ELSE t.p + strpos(substr(t.s, t.p), '1') - 1
           END AS start) f ON TRUE
  -- walk: one while-iteration (point add, consume, choose, move/end)
  LEFT JOIN LATERAL (
    SELECT *,
           -- end-branch consumption of the NEW cell
           CASE WHEN w0.d IS NULL OR w0.vch = '2' THEN w0.s1
                ELSE substr(w0.s1, 1, w0.nx - 1)
                     || (CASE WHEN w0.vch = '1' THEN '0'
                         ELSE chr(ascii(w0.vch) - 1) END)
                     || substr(w0.s1, w0.nx + 1) END AS s2,
           -- the value>=0 end branch appends the NEW cell's point
           -- when this iteration did not already add one
           w0.npts1 + (CASE WHEN w0.d IS NOT NULL AND w0.vch <> '2'
                             AND NOT w0.added THEN 1 ELSE 0 END)
             AS npts2,
           w0.sx1 + (CASE WHEN w0.d IS NOT NULL AND w0.vch <> '2'
                           AND NOT w0.added THEN w0.xn ELSE 0.0 END)
             AS sx2,
           w0.sy1 + (CASE WHEN w0.d IS NOT NULL AND w0.vch <> '2'
                           AND NOT w0.added THEN w0.yn ELSE 0.0 END)
             AS sy2
    FROM (
      SELECT w1.*,
             CASE WHEN w1.d IS NULL THEN NULL
                  ELSE substr(w1.s1, w1.nx, 1) END AS vch,
             CASE WHEN w1.d IS NULL THEN 0.0
                  ELSE 0.5 + (w1.nc / CAST({C} AS DOUBLE))
                       * CAST({C - 1} AS DOUBLE) END AS xn,
             CASE WHEN w1.d IS NULL THEN 0.0
                  ELSE (CAST({R} AS DOUBLE) - 0.5)
                       - (w1.nr / CAST({R} AS DOUBLE))
                       * CAST({R - 1} AS DOUBLE) END AS yn
      FROM (
        SELECT w2.*, ch.d, ch.nx, ch.nr, ch.nc
        FROM (
          SELECT (t.td <> t.pd) AS added,
                 t.npts + (CASE WHEN t.td <> t.pd THEN 1 ELSE 0 END)
                   AS npts1,
                 t.sx + (CASE WHEN t.td <> t.pd THEN
                   0.5 + (k.c / CAST({C} AS DOUBLE))
                       * CAST({C - 1} AS DOUBLE) ELSE 0.0 END) AS sx1,
                 t.sy + (CASE WHEN t.td <> t.pd THEN
                   (CAST({R} AS DOUBLE) - 0.5)
                   - (k.r / CAST({R} AS DOUBLE))
                       * CAST({R - 1} AS DOUBLE) ELSE 0.0 END) AS sy1,
                 substr(t.s, 1, t.cur - 1) || '0'
                   || substr(t.s, t.cur + 1) AS s1
          FROM kidx k WHERE t.mode = 1 AND k.idx = t.cur) w2
        LEFT JOIN LATERAL (
          SELECT nb.dir AS d, nb.nidx AS nx, kb.r AS nr, kb.c AS nc
          FROM nbr nb JOIN kidx kb ON kb.idx = nb.nidx
          WHERE nb.idx = t.cur AND nb.nidx > 0
            AND substr(w2.s1, nb.nidx, 1) > '0'
          ORDER BY nb.dir LIMIT 1) ch ON TRUE) w1) w0) w ON TRUE
  WHERE t.step < {max_steps}
    AND NOT (t.mode = 0 AND f.start = 0))
SELECT fid, out_np AS n_points,
       round(out_sx, {round_to}) AS sum_x,
       round(out_sy, {round_to}) AS sum_y
FROM trace WHERE emit ORDER BY fid
"""
