"""Isobasin: literal single-process mirror + tiling invariance."""

import numpy as np
import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)
_INFLOW = (16.0, 32.0, 64.0, 128.0, 1.0, 2.0, 4.0, 8.0)

SPEC = RasterSpec(rows=96, cols=96, tile_rows=32)
THR = 15.0


def _full_grids(spec):
    from whitebox_geospatial_analysis_tools_ray.stages.hydro import (
        _accumulate_tile)
    from whitebox_geospatial_analysis_tools_ray.stages.raster import (
        synth_value)
    from whitebox_geospatial_analysis_tools_ray.stages.terrain import (
        d8_kernel)
    cols = spec.cols
    cell = np.arange(spec.rows * cols, dtype=np.int64)
    z = synth_value(cell).reshape(spec.rows, cols)
    pad = np.full((spec.rows + 2, cols + 2), spec.nodata)
    pad[1:-1, 1:-1] = z
    ptr = d8_kernel(pad, spec.nodata)[1:-1, 1:-1]
    acc, _, _ = _accumulate_tile(z, ptr, np.zeros_like(z), spec.nodata)
    return z, ptr, acc


def _literal_isobasin(spec, thr):
    """Straight transcription of Isobasin.java:245-377 (incl. the
    transposed head-test read at :253)."""
    R, C = spec.rows, spec.cols
    nod = spec.nodata
    z, ptr, acc = _full_grids(spec)
    ca = acc.copy()
    out = np.full((R, C), -999.0)

    def pget(r, c):
        if 0 <= r < R and 0 <= c < C:
            return ptr[r, c]
        return nod

    def caget(r, c):
        if 0 <= r < R and 0 <= c < C:
            return ca[r, c]
        return nod

    def decrement(row, col, val):
        x, y = col, row
        while True:
            if 0 <= y < R and 0 <= x < C:
                ca[y, x] = ca[y, x] - val
            fd = pget(y, x)
            if fd > 0:
                i = int(round(np.log(fd) / np.log(2.0)))
                x += _DX[i]
                y += _DY[i]
            else:
                break

    outlet_id = 1
    for row in range(R):
        for col in range(C):
            if ptr[row, col] == nod:
                out[row, col] = nod
                continue
            flag = False
            for i in range(8):
                # literal swapped arguments: getValue(col+dX, row+dY)
                if pget(col + _DX[i], row + _DY[i]) == _INFLOW[i]:
                    flag = True
            if flag:
                continue
            # head: walk
            flag = False
            x, y = col, row
            while not flag:
                fd = pget(y, x)
                if fd > 0:
                    i = int(round(np.log(fd) / np.log(2.0)))
                    x += _DX[i]
                    y += _DY[i]
                else:
                    flag = True
                sca = caget(y, x)
                if sca >= thr:
                    max_sca = -99999.0
                    icl = None
                    for i in range(8):
                        b, c2 = x + _DX[i], y + _DY[i]
                        if pget(c2, b) == _INFLOW[i]:
                            zv = caget(c2, b)
                            if zv > max_sca:
                                max_sca = zv
                                icl = i
                    assert icl is not None
                    b, c2 = x + _DX[icl], y + _DY[icl]
                    if caget(c2, b) > thr:
                        flag = True
                    else:
                        d1 = abs(caget(c2, b) - thr)
                        d2 = abs(caget(y, x) - thr)
                        if d1 < d2:
                            out[c2, b] = outlet_id
                            decrement(c2, b, caget(c2, b))
                        else:
                            out[y, x] = outlet_id
                            decrement(y, x, caget(y, x))
                        outlet_id += 1

    # phase 2
    for row in range(R):
        for col in range(C):
            if out[row, col] == -999.0 and ptr[row, col] != nod:
                x, y = col, row
                oid = None
                while True:
                    fd = pget(y, x)
                    if fd > 0:
                        i = int(round(np.log(fd) / np.log(2.0)))
                        x += _DX[i]
                        y += _DY[i]
                        zz = out[y, x] if (0 <= y < R and 0 <= x < C) \
                            else nod
                        if zz != -999.0:
                            oid = zz
                            break
                    else:
                        oid = nod
                        break
                x, y = col, row
                out[y, x] = oid
                while True:
                    fd = pget(y, x)
                    if fd > 0:
                        i = int(round(np.log(fd) / np.log(2.0)))
                        x += _DX[i]
                        y += _DY[i]
                        if not (0 <= y < R and 0 <= x < C):
                            break
                        stop = out[y, x] != -999.0
                        out[y, x] = oid if not stop else out[y, x]
                        if stop:
                            break
                    else:
                        break
    return out, outlet_id - 1


def test_isobasin_matches_literal_mirror():
    from whitebox_geospatial_analysis_tools_ray.stages.isobasin import (
        isobasin)
    got = isobasin(SPEC, threshold=THR)
    out, n_outlets = _literal_isobasin(SPEC, THR)
    z, ptr, acc = _full_grids(SPEC)
    valid = ptr != SPEC.nodata
    lab_ok = (out > 0)  # positive outlet ids
    assert got.attrs["n_outlets"] == n_outlets
    assert np.array_equal(got["n_labelled"].to_numpy(),
                          lab_ok.sum(axis=1))
    assert np.array_equal(got["sum_label"].to_numpy(),
                          np.where(lab_ok, out, 0).sum(axis=1).astype(int))
    assert np.array_equal(got["n_valid"].to_numpy(), valid.sum(axis=1))


def test_isobasin_tiling_invariant():
    from whitebox_geospatial_analysis_tools_ray.stages.isobasin import (
        isobasin)
    a = isobasin(RasterSpec(rows=96, cols=96, tile_rows=32), threshold=THR)
    b = isobasin(RasterSpec(rows=96, cols=96, tile_rows=48), threshold=THR)
    pd.testing.assert_frame_equal(a, b)
