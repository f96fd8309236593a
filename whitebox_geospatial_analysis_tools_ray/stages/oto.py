"""RemoveOffTerrainObjects (LidarTools/src/plugins/RemoveOffTerrainObjects.java).

Removes buildings/vegetation (off-terrain objects) from a LiDAR DEM:

- PER OVERLAPPING TILE (corners from −1 stepping OTOMaxSize/2, :420-460):
  ``cleavePeaks2D`` (:597-879) runs a HIGHEST-FIRST priority flood inward
  from NoData-adjacent seed cells (every tile-pad-adjacent cell seeds),
  clamping each newly reached cell to its parent's ceiling
  (``z_n >= z → z_n = z``) — peaks not connected to the tile edge by high
  ground are cleaved to their saddle. Cells lowered by ≥ minOTOHeight
  (tan(minEdgeSlope)·resolution, :279) are OTO candidates (flag 1); cells
  lowered less are flag 2, and an in-place four-direction fall-through
  scan loop (:702-804 — the ``switch`` has NO break: case d runs cases
  d..3) relabels 1→2 across < minOTOHeight steps ("add back the
  shallow-sloped hills"). Remaining 1-cells are re-interpolated by
  1/d²-weighted 6-NN IDW from the adjacent unmodified ring (:841-870).
- WRITE-BACK is a running MIN against the output grid (:519-535) —
  commutative, so overlapping tiles combine order-independently; only
  the CHANGE COUNTERS (numCellsChanged / cumulativeChange, which drive
  the literal convergence test :569-570) depend on the reference's
  sequential tile order.
- ROUND 1 first trims edge-intersecting peaks with ``cleavePeaks1D``
  windows along the four borders (:300-416; sequential in-place along
  each border line), and the round-1 tile pass reads the UNtrimmed
  input while min-combining into the trimmed output — reproduced
  literally.

Ray mapping: each round is one ``map_batches`` over the ACTIVE tiles;
a tile task fetches only the row bands its window overlaps (targeted
``ray.get`` of per-band objects) and emits a SPARSE candidate list
(cells where the cleaved value undercuts the round-start grid). The
driver replays candidates in the reference's tile order against the
evolving grid — O(changed cells), exact counters — then broadcasts the
next round's bands. The border trim is an O(perimeter) driver pass.
The per-tile kernel is shared verbatim with the single-process mirror;
the 6-NN tie order is lexicographic (d², row, col) in both (the
reference's KdTree tie order is storage-dependent).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .raster import RasterSpec, synth_value

_NEG_INF = float("-inf")
# neighbour order per the tool (Dy={-1,0,1,1,1,0,-1,-1}, Dx={1,1,1,0,-1,-1,-1,0})
_DY8 = (-1, 0, 1, 1, 1, 0, -1, -1)
_DX8 = (1, 1, 1, 0, -1, -1, -1, 0)


def cleave_peaks_2d(sub: np.ndarray, nodata: float, size: int,
                    min_oto_height: float) -> None:
    """Literal cleavePeaks2D over a (size+2)² NoData-padded subgrid
    (mutated in place at flag-1 cells only)."""
    out = np.full((size, size), _NEG_INF)
    heap = []
    for row in range(size):
        for col in range(size):
            z = sub[row + 1, col + 1]
            if z != nodata:
                edge = False
                for i in range(8):
                    if sub[row + _DY8[i] + 1, col + _DX8[i] + 1] == nodata:
                        edge = True
                if edge:
                    heapq.heappush(heap, (-z, row, col))
                    out[row, col] = z
            else:
                out[row, col] = nodata
    something = False
    while heap:
        nz, row, col = heapq.heappop(heap)
        z = -nz
        for i in range(8):
            rn, cn = row + _DY8[i], col + _DX8[i]
            if not (0 <= rn < size and 0 <= cn < size):
                continue
            zn = sub[rn + 1, cn + 1]
            if zn != nodata and out[rn, cn] == _NEG_INF:
                if zn >= z:
                    zn = z
                    something = True
                out[rn, cn] = zn
                heapq.heappush(heap, (-zn, rn, cn))
    if not something:
        return
    core = sub[1:-1, 1:-1]
    lowered = out < core
    modified = np.zeros((size, size), dtype=np.int8)
    modified[lowered & ((core - out) < min_oto_height)] = 2
    modified[lowered & ((core - out) >= min_oto_height)] = 1

    min_h_sqr = min_oto_height * min_oto_height

    def scan(case: int) -> bool:
        rows_it = range(size) if case in (0, 3) else range(size - 1, -1, -1)
        cols_it = range(size) if case in (0, 2) else range(size - 1, -1, -1)
        changed = False
        for row in rows_it:
            for col in cols_it:
                if modified[row, col] == 2:
                    for i in range(8):
                        rn, cn = row + _DY8[i], col + _DX8[i]
                        if 0 <= rn < size and 0 <= cn < size \
                                and modified[rn, cn] == 1:
                            dz = sub[rn + 1, cn + 1] - sub[row + 1, col + 1]
                            if dz * dz < min_h_sqr:
                                modified[rn, cn] = 2
                                changed = True
        return changed

    d = 0
    while True:
        flag = False
        if d > 3:
            d = 0
        for case in range(d, 4):  # literal switch fall-through
            if scan(case):
                flag = True
        d += 1
        if not flag:
            break

    ones = np.argwhere(modified == 1)
    if not len(ones):
        return
    for row, col in ones:
        sub[row + 1, col + 1] = _NEG_INF
    # edge cells: any non-1 cell with a 1 neighbour (the 2D version has
    # no validity check, but seeds make 1-cells interior — never
    # NoData-adjacent)
    edges = []
    for row in range(size):
        for col in range(size):
            if modified[row, col] != 1:
                for i in range(8):
                    rn, cn = row + _DY8[i], col + _DX8[i]
                    if 0 <= rn < size and 0 <= cn < size \
                            and modified[rn, cn] == 1:
                        modified[row, col] = 3
                        break
    epos = np.argwhere(modified == 3)
    if len(epos):
        evals = sub[epos[:, 0] + 1, epos[:, 1] + 1]
    for row, col in ones:
        if not len(epos):
            sub[row + 1, col + 1] = 0.0
            continue
        d2 = ((epos[:, 0] - row) ** 2 + (epos[:, 1] - col) ** 2).astype(
            np.float64)
        order = np.lexsort((epos[:, 1], epos[:, 0], d2))[:6]
        w = 1.0 / d2[order]
        sub[row + 1, col + 1] = float((w / w.sum() * evals[order]).sum())


def cleave_peaks_1d(data: np.ndarray, nodata: float, size: int,
                    min_oto_height: float) -> None:
    """Literal cleavePeaks1D over a (size+2) NoData-padded line."""
    out = np.full(size, _NEG_INF)
    heap = []
    for row in range(size):
        z = data[row + 1]
        if z != nodata:
            if data[row + 2] == nodata or data[row] == nodata:
                heapq.heappush(heap, (-z, row))
                out[row] = z
        else:
            out[row] = nodata
    something = False
    while heap:
        nz, row = heapq.heappop(heap)
        z = -nz
        for dr in (1, -1):
            rn = row + dr
            if not (0 <= rn < size):
                continue
            zn = data[rn + 1]
            if zn != nodata and out[rn] == _NEG_INF:
                if zn >= z:
                    zn = z
                    something = True
                out[rn] = zn
                heapq.heappush(heap, (-zn, rn))
    if not something:
        return
    core = data[1:-1]
    lowered = out < core
    modified = np.zeros(size, dtype=np.int8)
    modified[lowered & ((core - out) < min_oto_height)] = 2
    modified[lowered & ((core - out) >= min_oto_height)] = 1

    min_h_sqr = min_oto_height * min_oto_height

    def scan(case: int) -> bool:
        rows_it = range(size) if case == 0 else range(size - 1, -1, -1)
        changed = False
        for row in rows_it:
            if modified[row] == 2:
                for dr in (1, -1):
                    rn = row + dr
                    if 0 <= rn < size and modified[rn] == 1:
                        dz = data[rn + 1] - data[row + 1]
                        if dz * dz < min_h_sqr:
                            modified[rn] = 2
                            changed = True
        return changed

    d = 0
    while True:
        flag = False
        if d > 1:
            d = 0
        for case in range(d, 2):  # literal fall-through
            if scan(case):
                flag = True
        d += 1
        if not flag:
            break

    ones = np.flatnonzero(modified == 1)
    if not len(ones):
        return
    # 1D edge detect HAS the validity check (:1030)
    for row in range(size):
        if modified[row] != 1 and data[row + 1] != nodata:
            for dr in (1, -1):
                rn = row + dr
                if 0 <= rn < size and modified[rn] == 1:
                    modified[row] = 3
                    break
    epos = np.flatnonzero(modified == 3)
    evals = data[epos + 1] if len(epos) else None
    for row in ones:
        if not len(epos):
            data[row + 1] = 0.0
            continue
        d2 = ((epos - row) ** 2).astype(np.float64)
        order = np.lexsort((epos, d2))[:2]
        w = 1.0 / d2[order]
        data[row + 1] = float((w / w.sum() * evals[order]).sum())


def _trim_borders(grid: np.ndarray, nodata: float, size: int,
                  min_h: float) -> None:
    """Round-1 border trim: overlapping 1D windows along the four
    borders, applied sequentially in place (:300-416)."""
    rows, cols = grid.shape
    half = size // 2

    def line_window(vec_get, vec_set, n, off):
        data = np.full(size + 2, nodata)
        for a in range(size):
            idx = off + a
            data[a + 1] = vec_get(idx) if 0 <= idx < n else nodata
        valid = int((data[1:-1] != nodata).sum())
        if valid > 2:
            cleave_peaks_1d(data, nodata, size, min_h)
        for a in range(size):
            idx = off + a
            if 0 <= idx < n and data[a + 1] < vec_get(idx):
                vec_set(idx, data[a + 1])

    off = 0
    while True:
        line_window(lambda c: grid[0, c],
                    lambda c, v: grid.__setitem__((0, c), v), cols, off)
        line_window(lambda c: grid[rows - 1, c],
                    lambda c, v: grid.__setitem__((rows - 1, c), v),
                    cols, off)
        off += half
        if off > cols - 1:
            break
    off = 0
    while True:
        line_window(lambda r: grid[r, 0],
                    lambda r, v: grid.__setitem__((r, 0), v), rows, off)
        line_window(lambda r: grid[r, cols - 1],
                    lambda r, v: grid.__setitem__((r, cols - 1), v),
                    rows, off)
        off += half
        if off > rows - 1:
            break


def _tile_corners(rows: int, cols: int, size: int) -> list[tuple[int, int]]:
    half = size // 2
    return [(c, r) for r in range(-1, rows, half)
            for c in range(-1, cols, half)]


def _tile_candidates(window: np.ndarray, col_off: int, row_off: int,
                     nodata: float, size: int, min_h: float):
    """Cleave one tile; return (rows, cols, z2) candidate arrays in the
    reference's row-major write-back order."""
    sub = np.full((size + 2, size + 2), nodata)
    sub[1:-1, 1:-1] = window
    valid = int((window != nodata).sum())
    if valid > 3:
        cleave_peaks_2d(sub, nodata, size, min_h)
    core = sub[1:-1, 1:-1]
    # sparse: only cells the cleave lowered vs the round input can ever
    # win the min-combine (w ≤ round input throughout)
    rr, cc = np.nonzero(core < window)
    return (row_off + rr, col_off + cc, core[rr, cc])


def _window_of(grid: np.ndarray, col_off: int, row_off: int, size: int,
               nodata: float) -> np.ndarray:
    rows, cols = grid.shape
    w = np.full((size, size), nodata)
    r0, r1 = max(row_off, 0), min(row_off + size, rows)
    c0, c1 = max(col_off, 0), min(col_off + size, cols)
    if r1 > r0 and c1 > c0:
        w[r0 - row_off:r1 - row_off, c0 - col_off:c1 - col_off] = \
            grid[r0:r1, c0:c1]
    return w


def remove_off_terrain_objects(spec: RasterSpec | None = None,
                               oto_max_size: int = 21,
                               min_edge_slope: float = 15.0,
                               iterate: bool = True,
                               round_to: int = 6) -> pd.DataFrame:
    """Distributed RemoveOffTerrainObjects → (row_id, n_valid, row_sum)."""
    spec = spec or RasterSpec()
    size = max(oto_max_size, 5)
    rows, cols = spec.rows, spec.cols
    nodata = spec.nodata
    resolution = 1.0
    min_h = max(math.tan(min_edge_slope * math.pi / 180.0) * resolution, 0.0)
    corners = _tile_corners(rows, cols, size)
    active = [True] * len(corners)

    grid = synth_value(np.arange(rows * cols,
                                 dtype=np.int64)).reshape(rows, cols)
    band_rows = spec.tile_rows
    n_bands = spec.n_tiles

    def bands_of(g: np.ndarray) -> dict[int, "ray.ObjectRef"]:
        return {b: ray.put(g[b * band_rows:min((b + 1) * band_rows, rows)])
                for b in range(n_bands)}

    loop_num = 0
    num_changed = 0
    prev_changed = 0
    dem = grid  # round input (the reference's temp copy)
    w = None
    while True:
        loop_num += 1
        prev_changed = num_changed
        num_changed = 0
        cum_change = 0.0
        if loop_num == 1:
            w = dem.copy()
            _trim_borders(w, nodata, size, min_h)
        band_refs = bands_of(dem)

        def solve(batch, refs=band_refs) -> pd.DataFrame:
            cache: dict[int, np.ndarray] = {}

            def band(b: int) -> np.ndarray:
                if b not in cache:
                    cache[b] = ray.get(refs[b])
                return cache[b]

            out = []
            for t in batch["id"]:
                col_off, row_off = corners[int(t)]
                win = np.full((size, size), nodata)
                r0, r1 = max(row_off, 0), min(row_off + size, rows)
                c0, c1 = max(col_off, 0), min(col_off + size, cols)
                if r1 > r0 and c1 > c0:
                    b0, b1 = r0 // band_rows, (r1 - 1) // band_rows
                    rows_block = np.concatenate(
                        [band(b) for b in range(b0, b1 + 1)], axis=0)
                    g0 = b0 * band_rows
                    win[r0 - row_off:r1 - row_off,
                        c0 - col_off:c1 - col_off] = \
                        rows_block[r0 - g0:r1 - g0, c0:c1]
                rr, cc, z2 = _tile_candidates(win, col_off, row_off,
                                              nodata, size, min_h)
                inb = (rr >= 0) & (rr < rows) & (cc >= 0) & (cc < cols)
                out.append({"tile": int(t), "r": rr[inb].tobytes(),
                            "c": cc[inb].tobytes(),
                            "z": np.ascontiguousarray(z2[inb]).tobytes()})
            return pd.DataFrame(out)

        act = [i for i, a in enumerate(active) if a]
        res = (rd.from_items([{"id": i} for i in act])
               .map_batches(solve, batch_format="numpy").to_pandas()
               .set_index("tile"))
        # replay in the reference's sequential tile order (exact counters)
        for t in act:
            r = res.loc[t]
            rr = np.frombuffer(r["r"], dtype=np.int64)
            cc = np.frombuffer(r["c"], dtype=np.int64)
            z2 = np.frombuffer(r["z"])
            did = False
            for k in range(len(rr)):
                w1 = w[rr[k], cc[k]]
                if z2[k] < w1:
                    w[rr[k], cc[k]] = z2[k]
                    cum_change += (w1 - z2[k]) * (w1 - z2[k])
                    did = True
                    num_changed += 1
            if not did:
                active[t] = False
        dem = w.copy()
        if not (num_changed > 0 and num_changed != prev_changed
                and loop_num < 501 and cum_change > 0.5 and iterate):
            break

    valid = w != nodata
    return pd.DataFrame({
        "row_id": np.arange(rows),
        "n_valid": valid.sum(axis=1).astype(np.int64),
        "row_sum": np.round(np.where(valid, w, 0.0).sum(axis=1), round_to)})


def remove_off_terrain_objects_naive(spec: RasterSpec,
                                     oto_max_size: int = 21,
                                     min_edge_slope: float = 15.0,
                                     iterate: bool = True,
                                     round_to: int = 6) -> pd.DataFrame:
    """Single-process literal mirror (same kernels, whole-grid arrays,
    sequential tile loop)."""
    size = max(oto_max_size, 5)
    rows, cols = spec.rows, spec.cols
    nodata = spec.nodata
    min_h = max(math.tan(min_edge_slope * math.pi / 180.0), 0.0)
    corners = _tile_corners(rows, cols, size)
    active = [True] * len(corners)
    grid = synth_value(np.arange(rows * cols,
                                 dtype=np.int64)).reshape(rows, cols)
    loop_num = 0
    num_changed = 0
    dem = grid
    w = None
    while True:
        loop_num += 1
        prev_changed = num_changed
        num_changed = 0
        cum_change = 0.0
        if loop_num == 1:
            w = dem.copy()
            _trim_borders(w, nodata, size, min_h)
        for t, (col_off, row_off) in enumerate(corners):
            if not active[t]:
                continue
            win = _window_of(dem, col_off, row_off, size, nodata)
            rr, cc, z2 = _tile_candidates(win, col_off, row_off,
                                          nodata, size, min_h)
            did = False
            for k in range(len(rr)):
                r_, c_ = rr[k], cc[k]
                if 0 <= r_ < rows and 0 <= c_ < cols:
                    w1 = w[r_, c_]
                    if z2[k] < w1:
                        w[r_, c_] = z2[k]
                        cum_change += (w1 - z2[k]) * (w1 - z2[k])
                        did = True
                        num_changed += 1
            if not did:
                active[t] = False
        dem = w.copy()
        if not (num_changed > 0 and num_changed != prev_changed
                and loop_num < 501 and cum_change > 0.5 and iterate):
            break
    valid = w != nodata
    return pd.DataFrame({
        "row_id": np.arange(rows),
        "n_valid": valid.sum(axis=1).astype(np.int64),
        "row_sum": np.round(np.where(valid, w, 0.0).sum(axis=1), round_to)})
