"""Exact DuckDB replay oracle for raster_to_vector_lines (round-4
verdict item 5: it was one of six rows-only queries).

RasterToVectorLines.java's loops 2 (in-place row-major thinning) and 4
(the mutating line trace) are sequential state machines: every step
reads and writes a shared cell grid, and trace N's consumed cells
decide where trace N+1 may start. The replay carries that grid as a
SPLICED DIGIT STRING over the (sparse) keep-cell universe inside two
recursive CTEs — the bounded-table trick that cracked the BPE and JPEG
oracles:

- ``kidx2`` densely indexes the keep cells (loop 1 is vectorized SQL
  over the synth rule) in row-major order and PIVOTS each cell's 8
  neighbour indexes into columns n0..n7 (0 = outside the universe,
  reads as '0') plus the cell's emitted x/y, with a SENTINEL idx=0
  row so the recursive terms can use plain inner equi-joins
  (correlated LEFT JOINs / aggregate laterals are unsupported or
  ~2 ms/iteration in DuckDB's recursive machinery; flat joins +
  scalar CASEs are the fast path).
- ``loop2`` replays the thinning pass BATCHED BY REMOVALS: between
  two zeroings the scan mutates nothing, so the single row-major pass
  is equivalent to repeatedly finding the FIRST mask-matching cell at
  or after the scan pointer (a set-based min over the universe),
  zeroing it, and resuming after it — iterations = number of removed
  cells, not number of cells.
- ``trace`` replays loop 4 as a one-row state machine (mode
  scan/walk) over the neighbour-count digit string, one FLAT
  projection per step: neighbour chars c0..c7 read straight off the
  carried string (the current cell never neighbours itself, so the
  pre-splice reads equal the Java post-consume reads), first >0
  neighbour in dir order 0..7 via a CASE cascade (the Java
  first-hit), the value==2 / value>=0 / dead-end branches literally,
  and a single one- or two-point splice builds the next string. At
  most one point joins the sums per step, so the float64 accumulation
  order equals the Java emission order — bit-identical before the
  final round().

Cost: O(steps × universe) character work — the state string re-emits
per iteration. Sequential by nature; the parallel impl is the Ray
one, this is its independent oracle.
"""

from __future__ import annotations

from .thinning import THIN_ELEMENTS, THIN_VALS

# trace/thinning direction order (RasterToVectorLines.java)
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _dirs_values() -> str:
    return ", ".join(f"({i}, {_DX[i]}, {_DY[i]})" for i in range(8))


def _mask_expr(ci) -> str:
    """OR-of-ANDs over the 8 erosion masks; ``ci(i)`` renders the
    neighbour-char expression (loop-2 values are only '0'/'1')."""
    terms = []
    for el, vl in zip(THIN_ELEMENTS, THIN_VALS):
        conj = " AND ".join(f"{ci(e)} = '{v}'" for e, v in zip(el, vl))
        terms.append(f"({conj})")
    return "(" + " OR ".join(terms) + ")"


def raster_to_vector_lines_sql(rows: int = 256, cols: int = 256,
                               fg_threshold: float = 650.0,
                               min_line_length: int = 2,
                               round_to: int = 4,
                               max_steps: int = 400_000) -> str:
    R, C = rows, cols
    npiv = ",\n         ".join(
        f"(SELECT coalesce(max(b.idx), 0) FROM kidx b "
        f"WHERE b.r = a.r + ({_DY[i]}) AND b.c = a.c + ({_DX[i]})) "
        f"AS n{i}" for i in range(8))
    cnt_expr = " + ".join(
        f"(CASE WHEN k.n{i} > 0 AND substr(th.s, k.n{i}, 1) = '1' "
        f"THEN 1 ELSE 0 END)" for i in range(8))

    # ---- loop2: neighbour chars of candidate cell k under string l.s
    def ci2(i: int) -> str:
        return (f"(CASE WHEN k.n{i} = 0 THEN '0' "
                f"ELSE substr(l.s, k.n{i}, 1) END)")

    match2 = _mask_expr(ci2)

    # ---- trace: neighbour chars of the CURRENT cell under t.s.
    # Identical to the Java read after temp[cur]=0 because a cell never
    # neighbours itself.
    def ci4(i: int) -> str:
        return (f"(CASE WHEN k.n{i} = 0 THEN '0' "
                f"ELSE substr(t.s, k.n{i}, 1) END)")

    nbsel = ",\n           ".join(f"{ci4(i)} AS c{i}"
                                   for i in range(8))
    anyfound = "(" + " OR ".join(f"nb.c{i} > '0'"
                                 for i in range(8)) + ")"

    def _cascade(val_of) -> str:
        arms = " ".join(f"WHEN nb.c{i} > '0' THEN {val_of(i)}"
                        for i in range(8))
        return f"(CASE {arms} END)"

    nx_expr = _cascade(lambda i: f"k.n{i}")          # chosen neighbour
    vch_expr = _cascade(lambda i: f"nb.c{i}")         # its temp char
    dir_pick = _cascade(lambda i: str(i))
    # walk-step scalar fragments (mutually exclusive single point-add
    # keeps the float sum order identical to the Java loop); every
    # cascade is computed ONCE in the ch lateral
    added = "(t.td <> t.pd)"
    endbr = "(ch.fnd AND ch.vch <> '2')"
    npts2 = (f"t.npts + (CASE WHEN {added} THEN 1 ELSE 0 END)"
             f" + (CASE WHEN {endbr} AND NOT {added} THEN 1 ELSE 0 END)")
    sx2 = (f"t.sx + (CASE WHEN {added} THEN k.x "
           f"WHEN {endbr} THEN bx.x ELSE 0.0 END)")
    sy2 = (f"t.sy + (CASE WHEN {added} THEN k.y "
           f"WHEN {endbr} THEN bx.y ELSE 0.0 END)")
    endchar = ("(CASE WHEN ch.vch = '1' THEN '0' "
               "ELSE chr(ascii(ch.vch) - 1) END)")
    cha = f"(CASE WHEN ch.lo = t.cur THEN '0' ELSE {endchar} END)"
    chb = f"(CASE WHEN ch.hi = t.cur THEN '0' ELSE {endchar} END)"
    s2 = (f"CASE WHEN {endbr} THEN "
          f"substr(t.s, 1, ch.lo - 1) || {cha} "
          f"|| substr(t.s, ch.lo + 1, ch.hi - ch.lo - 1) || {chb} "
          f"|| substr(t.s, ch.hi + 1) "
          f"ELSE substr(t.s, 1, t.cur - 1) || '0' "
          f"|| substr(t.s, t.cur + 1) END")
    lineend = "(NOT ch.fnd OR ch.vch <> '2')"
    emit = (f"(t.mode = 1 AND {lineend} "
            f"AND {npts2} >= {min_line_length})")
    start = (f"(CASE WHEN strpos(substr(t.s, t.p), '1') = 0 THEN 0 "
             f"ELSE t.p + strpos(substr(t.s, t.p), '1') - 1 END)")
    return f"""
WITH RECURSIVE
dirs(dir, dx, dy) AS (VALUES {_dirs_values()}),
cells AS MATERIALIZED (
  SELECT t.i AS cell, CAST(t.i // {C} AS INTEGER) AS r,
         CAST(t.i % {C} AS INTEGER) AS c,
         CASE WHEN (t.i*2246822519+1013904223)%4294967296%17=0
              THEN -32768.0
              ELSE ((t.i*2654435761)%4294967296)/4294967296.0*1000.0
         END AS z
  FROM (SELECT unnest(range({R * C})) AS i) t),
fgt AS MATERIALIZED (
  SELECT r, c,
         CASE WHEN z <> -32768.0 AND z > {fg_threshold} THEN 1 ELSE 0
         END AS v
  FROM cells),
nsum AS MATERIALIZED (
  SELECT a.r, a.c, a.v, coalesce(sum(b.v), 0) AS ns
  FROM fgt a
  CROSS JOIN dirs d
  LEFT JOIN fgt b ON b.r = a.r + d.dy AND b.c = a.c + d.dx
  GROUP BY a.r, a.c, a.v),
kidx AS MATERIALIZED (
  SELECT r, c,
         CAST(row_number() OVER (ORDER BY r, c) AS INTEGER) AS idx
  FROM nsum WHERE v = 1 AND ns > 0 AND ns < 8),
nk AS MATERIALIZED (SELECT CAST(count(*) AS INTEGER) AS n FROM kidx),
-- pivoted per-cell neighbour index columns + the cell's emitted x/y;
-- sentinel idx=0 row enables inner joins in the recursive terms
kidx2 AS MATERIALIZED (
  SELECT a.idx, a.r, a.c,
         0.5 + (a.c / CAST({C} AS DOUBLE)) * CAST({C - 1} AS DOUBLE)
           AS x,
         (CAST({R} AS DOUBLE) - 0.5)
           - (a.r / CAST({R} AS DOUBLE)) * CAST({R - 1} AS DOUBLE)
           AS y,
         {npiv}
  FROM kidx a
  UNION ALL
  SELECT 0, 0, 0, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         0, 0, 0, 0, 0, 0, 0, 0),
-- loop 2 batched by removals: between zeroings the row-major pass
-- mutates nothing, so each iteration finds the FIRST mask-matching
-- still-'1' cell at/after the scan pointer, zeroes it and resumes
-- after it; done when no cell matches.
loop2(j, p, s, done) AS (
  SELECT 0, 1, repeat('1', (SELECT n FROM nk)), FALSE
  UNION ALL
  SELECT l.j + 1,
         coalesce(h.hit + 1, l.p),
         CASE WHEN h.hit IS NULL THEN l.s
              ELSE substr(l.s, 1, h.hit - 1) || '0'
                   || substr(l.s, h.hit + 1) END,
         h.hit IS NULL
  FROM loop2 l
  CROSS JOIN LATERAL (
    -- predicate INSIDE the aggregate: a correlated lateral whose
    -- WHERE matches nothing yields ZERO rows (not one NULL row) and
    -- would silently end the recursion
    SELECT min(CASE WHEN k.idx >= l.p AND k.idx > 0
                     AND substr(l.s, k.idx, 1) = '1'
                     AND {match2} THEN k.idx END) AS hit
    FROM kidx2 k) h
  WHERE NOT l.done AND l.j < {max_steps}),
thinned AS MATERIALIZED (SELECT s FROM loop2 WHERE done),
-- loop 3: neighbour-count digits over the thinned grid
t0 AS MATERIALIZED (
  SELECT coalesce(string_agg(CAST(cnt AS VARCHAR), '' ORDER BY idx),
                  '') AS s
  FROM (
    SELECT k.idx,
           CASE WHEN substr(th.s, k.idx, 1) = '1'
                THEN {cnt_expr}
                ELSE 0 END AS cnt
    FROM kidx2 k, thinned th WHERE k.idx > 0)),
-- loop 4: the mutating trace as a one-row state machine, one FLAT
-- projection per step. mode 0 = scanning, 1 = walking.
trace(step, mode, p, cur, pd, td, fid, npts, sx, sy, s,
      emit, out_np, out_sx, out_sy) AS (
  SELECT 0, 0, 1, 0, 0, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), (SELECT s FROM t0),
         FALSE, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
         CAST(NULL AS DOUBLE)
  UNION ALL
  SELECT t.step + 1,
         CASE WHEN t.mode = 0 THEN 1
              WHEN ch.fnd AND ch.vch = '2' THEN 1
              ELSE 0 END,
         CASE WHEN t.mode = 0 THEN {start} + 1 ELSE t.p END,
         CASE WHEN t.mode = 0 THEN {start}
              WHEN NOT ch.fnd THEN t.cur
              ELSE ch.nx END,
         CASE WHEN t.mode = 0 THEN -1 ELSE t.td END,
         CASE WHEN t.mode = 0 THEN 0
              WHEN NOT ch.fnd THEN -1
              ELSE ch.d END,
         t.fid + (CASE WHEN {emit} THEN 1 ELSE 0 END),
         CASE WHEN t.mode = 0 THEN CAST(0 AS BIGINT) ELSE {npts2} END,
         CASE WHEN t.mode = 0 THEN CAST(0.0 AS DOUBLE) ELSE {sx2} END,
         CASE WHEN t.mode = 0 THEN CAST(0.0 AS DOUBLE) ELSE {sy2} END,
         CASE WHEN t.mode = 0 THEN t.s ELSE {s2} END,
         {emit},
         CASE WHEN t.mode = 1 THEN {npts2} END,
         CASE WHEN t.mode = 1 THEN {sx2} END,
         CASE WHEN t.mode = 1 THEN {sy2} END
  FROM trace t
  JOIN kidx2 k
    ON k.idx = (CASE WHEN t.mode = 1 THEN t.cur ELSE 0 END)
  CROSS JOIN LATERAL (
    SELECT {nbsel}) nb
  CROSS JOIN LATERAL (
    SELECT {anyfound} AS fnd, {dir_pick} AS d, {nx_expr} AS nx,
           {vch_expr} AS vch,
           least(t.cur, {nx_expr}) AS lo,
           greatest(t.cur, {nx_expr}) AS hi) ch
  JOIN kidx2 bx
    ON bx.idx = coalesce(
         (CASE WHEN t.mode = 1 THEN ch.nx END), 0)
  WHERE t.step < {max_steps}
    AND NOT (t.mode = 0 AND {start} = 0))
SELECT fid, out_np AS n_points,
       round(out_sx, {round_to}) AS sum_x,
       round(out_sy, {round_to}) AS sum_y
FROM trace WHERE emit ORDER BY fid
"""
