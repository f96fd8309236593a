"""Viewshed (TerrainAnalysisTools/src/plugins/Viewshed.java, 727 LoC).

Reference algorithm (XDraw / Wang-et-al triangular-facet sweep, studied
for behavior only):

- view angle va = (z − stationZ)/dist × 1000 per cell (:350-372);
- the 3×3 ring around the station is initialised to va (:376-381);
- N/S/E/W axis rays carry a running max of va (:383-416);
- 8 triangular facets propagate an interpolated max-angle outward, each
  row/column reading only the ring one step NEARER the station:
  tva = t2 + h/v·(t1−t2), cell = max(va, tva) (:419-664);
- output: +1 visible where maxVA ≤ va and va ≠ NoData (:669-686).

Distributed shape: the recurrence is a pure WAVEFRONT — a row (facets
1-4) depends only on the previous row, a column (facets 5-8) only on
the previous column, and facets 5-8 are EXACTLY facets 1-4 on the
transposed grid. So the whole tool is two banded pipelines:

- pass A (row bands): chained Ray tasks marching away from the station
  band (up and down concurrently), each task handing its far edge row
  of maxVA — one O(cols) message — to the next band; rows vectorize
  across columns.
- pass B: the same kernel on the transposed problem (column bands),
  counting only the strict |Δrow| < |Δcol| octants so every cell is
  counted exactly once across the two passes (the shared diagonals
  compute identical values in both, by the identical recurrence).

At scale each chain moves O(cols) bytes per band and the per-band work
is numpy row ops — wall time is the band pipeline depth, the same
bound as the reference's sequential scan but with all four chains and
all per-row arithmetic parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .raster import RasterSpec, synth_value

STATION_HEIGHT = 2.0


def _station(spec: RasterSpec) -> tuple[int, int]:
    return spec.rows // 2 + 3, spec.cols // 2 - 5


def _synth_band(r0: int, r1: int, n_cols: int, transposed: bool,
                n_cols_orig: int):
    """z rows [r0, r1) of the (possibly transposed) grid."""
    if not transposed:
        cell = np.arange(r0 * n_cols, r1 * n_cols, dtype=np.int64)
        return synth_value(cell).reshape(r1 - r0, n_cols)
    # transposed: row' = original col, col' = original row
    rp = np.arange(r0, r1, dtype=np.int64)[:, None]
    cp = np.arange(n_cols, dtype=np.int64)[None, :]
    return synth_value(cp * np.int64(n_cols_orig) + rp)


def _view_angle(z: np.ndarray, r0: int, sr: int, sc: int, sz: float,
                nodata: float) -> np.ndarray:
    h, w = z.shape
    rr = np.arange(r0, r0 + h, dtype=np.float64)[:, None]
    cc = np.arange(w, dtype=np.float64)[None, :]
    dist = np.sqrt((cc - sc) ** 2 + (rr - sr) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        va = (z - sz) / dist * 1000.0
    va = np.where(dist == 0.0, 0.0, va)  # station cell: never written → 0
    return np.where(z == nodata, nodata, va)


def _sweep_rows(va: np.ndarray, r0: int, sr: int, sc: int,
                boundary: np.ndarray | None, step: int):
    """Facet-1..4 sweep over one band in global-row order away from the
    station (step=-1 up, +1 down). ``boundary`` is the maxVA row one
    step nearer the station (None only for the station band). Returns
    (maxva_band, far_edge_row)."""
    h, w = va.shape
    maxva = np.full_like(va, -np.inf)
    rows_iter = range(h) if step > 0 else range(h - 1, -1, -1)
    prev = boundary
    cols = np.arange(w)
    for i in rows_iter:
        r = r0 + i
        if (step < 0 and r > sr) or (step > 0 and r <= sr):
            continue  # wrong side of the station for this direction
        v = abs(r - sr)
        if r == sr:
            row = np.full(w, -np.inf)
            row[sc] = va[i, sc]
            maxva[i] = row
            prev = row
            continue
        if v == 1:  # ring + axis seed row
            row = np.full(w, -np.inf)
            lo, hi = max(sc - 1, 0), min(sc + 1, w - 1)
            row[lo:hi + 1] = va[i, lo:hi + 1]
            maxva[i] = row
            prev = row
            continue
        row = np.full(w, -np.inf)
        # axis (running max along the station column)
        row[sc] = max(prev[sc], va[i, sc])
        # east side: h_off = col − sc in 1..v
        e_hi = min(sc + v, w - 1)
        if e_hi >= sc + 1:
            cc = cols[sc + 1:e_hi + 1]
            h_off = (cc - sc).astype(np.float64)
            t1 = prev[cc - 1]
            t2 = prev[cc]
            tva = np.where(h_off == v, t1, t2 + h_off / v * (t1 - t2))
            row[cc] = np.maximum(va[i, cc], tva)
        # west side: h_off = sc − col in 1..v
        w_lo = max(sc - v, 0)
        if w_lo <= sc - 1:
            cc = cols[w_lo:sc]
            h_off = (sc - cc).astype(np.float64)
            t1 = prev[cc + 1]
            t2 = prev[cc]
            tva = np.where(h_off == v, t1, t2 + h_off / v * (t1 - t2))
            row[cc] = np.maximum(va[i, cc], tva)
        maxva[i] = row
        prev = row
    return maxva, prev


def _band_counts(va: np.ndarray, maxva: np.ndarray, r0: int, sr: int,
                 sc: int, nodata: float, strict: bool, step: int):
    """Visible mask for this band, restricted to the pass's octants
    (|Δcol| ≤ |Δrow|; strictly < for the transposed pass) and to the
    chain's side of the station (rows ≤ station for step<0, > for
    step>0 — the station band runs once per direction)."""
    h, w = va.shape
    rr = np.arange(r0, r0 + h)[:, None]
    cc = np.arange(w)[None, :]
    dr = np.abs(rr - sr)
    dc = np.abs(cc - sc)
    region = (dc < dr) if strict else (dc <= dr)
    region &= (rr <= sr) if step < 0 else (rr > sr)
    return region & (va != nodata) & (maxva <= va)


@ray.remote
def _viewshed_band(spec_rows: int, spec_cols: int, band: tuple[int, int],
                   sr: int, sc: int, sz: float, nodata: float,
                   boundary, step: int, transposed: bool,
                   n_cols_orig: int):
    r0, r1 = band
    z = _synth_band(r0, r1, spec_cols, transposed, n_cols_orig)
    va = _view_angle(z, r0, sr, sc, sz, nodata)
    maxva, edge = _sweep_rows(va, r0, sr, sc, boundary, step)
    vis = _band_counts(va, maxva, r0, sr, sc, nodata,
                       strict=transposed, step=step)
    if transposed:  # aggregate by ORIGINAL row = transposed column
        return vis.sum(axis=0).astype(np.int64), edge
    return vis.sum(axis=1).astype(np.int64), edge


def viewshed(spec: RasterSpec | None = None,
             station_height: float = STATION_HEIGHT,
             station: tuple[int, int] | None = None) -> pd.DataFrame:
    """Per-row visible-cell counts: (row_id, n_visible)."""
    spec = spec or RasterSpec()
    sr, sc = station if station is not None else _station(spec)
    sz = float(synth_value(np.asarray([sr * spec.cols + sc]))[0]) \
        + station_height
    nodata = spec.nodata

    def chain(n_rows: int, n_cols: int, s_r: int, s_c: int,
              transposed: bool):
        """Two pipelined chains (away from the station) over row bands
        of an (n_rows × n_cols) grid; returns [(band, future), ...].
        The station band runs in BOTH chains; each direction counts
        only its own side (rows ≤ station up, > station down)."""
        tr = spec.tile_rows
        bands = [(i, min(i + tr, n_rows)) for i in range(0, n_rows, tr)]
        sb = next(i for i, (a, b) in enumerate(bands) if a <= s_r < b)
        out = []
        boundary = None
        for i in range(sb, -1, -1):  # upward chain (station band first)
            fut = _viewshed_band.remote(
                n_rows, n_cols, bands[i], s_r, s_c, sz, nodata,
                boundary, -1, transposed, spec.cols)
            out.append((bands[i], fut))
            boundary = _edge.remote(fut)
        boundary = None  # downward chain self-seeds at the ring row
        for i in range(sb, len(bands)):
            fut = _viewshed_band.remote(
                n_rows, n_cols, bands[i], s_r, s_c, sz, nodata,
                boundary, +1, transposed, spec.cols)
            out.append((bands[i], fut))
            boundary = _edge.remote(fut)
        return out

    pass_a = chain(spec.rows, spec.cols, sr, sc, False)
    pass_b = chain(spec.cols, spec.rows, sc, sr, True)

    n_vis = np.zeros(spec.rows, dtype=np.int64)
    for (r0, r1), fut in pass_a:
        counts, _ = ray.get(fut)
        n_vis[r0:r1] += counts
    for _, fut in pass_b:
        counts, _ = ray.get(fut)
        n_vis += counts
    return pd.DataFrame({"row_id": np.arange(spec.rows),
                         "n_visible": n_vis})


@ray.remote
def _edge(band_result):
    return band_result[1]


# ---------------------------------------------------------------------------
# Single-process literal mirror of the reference loops (for tests)
# ---------------------------------------------------------------------------

def viewshed_naive(spec: RasterSpec,
                   station_height: float = STATION_HEIGHT,
                   station: tuple[int, int] | None = None) -> pd.DataFrame:
    rows, cols = spec.rows, spec.cols
    nodata = spec.nodata
    sr, sc = station if station is not None else _station(spec)
    cell = np.arange(rows * cols, dtype=np.int64)
    z = synth_value(cell).reshape(rows, cols)
    sz = z[sr, sc] + station_height
    va = _view_angle(z, 0, sr, sc, sz, nodata)
    maxva = np.zeros_like(va)

    for r in range(sr - 1, sr + 2):
        for c in range(sc - 1, sc + 2):
            maxva[r, c] = va[r, c]
    m = va[sr - 1, sc]
    for r in range(sr - 2, -1, -1):
        m = max(m, va[r, sc])
        maxva[r, sc] = m
    m = va[sr + 1, sc]
    for r in range(sr + 2, rows):
        m = max(m, va[r, sc])
        maxva[r, sc] = m
    m = va[sr, sc + 1]
    for c in range(sc + 2, cols):
        m = max(m, va[sr, c])
        maxva[sr, c] = m
    m = va[sr, sc - 1]
    for c in range(sc - 3, -1, -1) if False else range(sc - 2, -1, -1):
        m = max(m, va[sr, c])
        maxva[sr, c] = m

    def facet(row_range, col_range_fn, t_fn):
        v = 1
        for r in row_range:
            v += 1
            h = 0
            for c in col_range_fn(v):
                if not (0 <= c < cols and 0 <= r < rows):
                    break
                h += 1
                t1, t2 = t_fn(r, c)
                tva = t1 if h == v else t2 + h / v * (t1 - t2)
                maxva[r, c] = max(va[r, c], tva)

    facet(range(sr - 2, -1, -1), lambda v: range(sc + 1, sc + v + 1),
          lambda r, c: (maxva[r + 1, c - 1], maxva[r + 1, c]))
    facet(range(sr - 2, -1, -1), lambda v: range(sc - 1, sc - v - 1, -1),
          lambda r, c: (maxva[r + 1, c + 1], maxva[r + 1, c]))
    facet(range(sr + 2, rows), lambda v: range(sc - 1, sc - v - 1, -1),
          lambda r, c: (maxva[r - 1, c + 1], maxva[r - 1, c]))
    facet(range(sr + 2, rows), lambda v: range(sc + 1, sc + v + 1),
          lambda r, c: (maxva[r - 1, c - 1], maxva[r - 1, c]))

    def facet_cols(col_range, row_range_fn, t_fn):
        v = 1
        for c in col_range:
            v += 1
            h = 0
            for r in row_range_fn(v):
                if not (0 <= r < rows and 0 <= c < cols):
                    break
                h += 1
                t1, t2 = t_fn(r, c)
                tva = t1 if h == v else t2 + h / v * (t1 - t2)
                maxva[r, c] = max(va[r, c], tva)

    facet_cols(range(sc + 2, cols), lambda v: range(sr - 1, sr - v - 1, -1),
               lambda r, c: (maxva[r + 1, c - 1], maxva[r, c - 1]))
    facet_cols(range(sc + 2, cols), lambda v: range(sr + 1, sr + v + 1),
               lambda r, c: (maxva[r - 1, c - 1], maxva[r, c - 1]))
    facet_cols(range(sc - 2, -1, -1), lambda v: range(sr + 1, sr + v + 1),
               lambda r, c: (maxva[r - 1, c + 1], maxva[r, c + 1]))
    facet_cols(range(sc - 2, -1, -1), lambda v: range(sr - 1, sr - v - 1, -1),
               lambda r, c: (maxva[r + 1, c + 1], maxva[r, c + 1]))

    visible = (maxva <= va) & (va != nodata)
    return pd.DataFrame({"row_id": np.arange(rows),
                         "n_visible": visible.sum(axis=1).astype(np.int64)})


def visibility_index(spec: RasterSpec | None = None,
                     station_height: float = STATION_HEIGHT,
                     n_stations: int = 4) -> pd.DataFrame:
    """VisibilityIndex (TerrainAnalysisTools — viewshed proportion over
    a set of station placements): per raster row,
    Σ_stations n_visible(row) / n_stations. Each station's viewshed is
    the proven banded-wavefront XDraw sweep; the stations' sweeps are
    independent Ray pipelines whose tiny per-row outputs combine on the
    driver. Deterministic station lattice over the grid interior."""
    spec = spec or RasterSpec()
    stations = _station_lattice(spec, n_stations)
    total = None
    for st in stations:
        df = viewshed(spec, station_height, station=st) \
            .sort_values("row_id").reset_index(drop=True)
        total = df["n_visible"].to_numpy(dtype=np.float64) if total is None \
            else total + df["n_visible"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "row_id": np.arange(spec.rows, dtype=np.int64),
        "index_sum": total / float(len(stations))})


def _station_lattice(spec: RasterSpec, n: int) -> list[tuple[int, int]]:
    pts = []
    for k in range(n):
        pts.append((spec.rows // 4 + (k % 2) * (spec.rows // 2) + 3,
                    spec.cols // 4 + (k // 2 % 2) * (spec.cols // 2) - 2))
    return pts


def visibility_index_naive(spec: RasterSpec,
                           station_height: float = STATION_HEIGHT,
                           n_stations: int = 4) -> pd.DataFrame:
    stations = _station_lattice(spec, n_stations)
    total = None
    for st in stations:
        df = viewshed_naive(spec, station_height, station=st) \
            .sort_values("row_id").reset_index(drop=True)
        total = df["n_visible"].to_numpy(dtype=np.float64) if total is None \
            else total + df["n_visible"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "row_id": np.arange(spec.rows, dtype=np.int64),
        "index_sum": total / float(len(stations))})
