"""D-infinity pointer + fractional accumulation == whole-grid mirror."""

import numpy as np
import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import dinf
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec


def test_dinf_pointer_basic_properties():
    # plane tilted toward east: flow points east (90°)
    z = np.add.outer(np.zeros(8), np.arange(8.0)[::-1])  # decreasing east
    pad = np.full((10, 10), -32768.0)
    pad[1:-1, 1:-1] = z
    fd = dinf.dinf_pointer_kernel(pad, -32768.0)[1:-1, 1:-1]
    inner = fd[1:-1, 1:-1]
    assert np.allclose(inner, 90.0)
    # flat plane: no positive slope → -1
    pad[1:-1, 1:-1] = 5.0
    fd = dinf.dinf_pointer_kernel(pad, -32768.0)[1:-1, 1:-1]
    assert (fd[2:-2, 2:-2] == -1.0).all()


def test_dinf_accum_matches_naive(ray_session):
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = dinf.flow_accumulation_dinf(spec)
    want = dinf.flow_accumulation_dinf_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    assert got["sum_acc"].sum() > 0


def test_dinf_accum_tiling_invariant(ray_session):
    a = dinf.flow_accumulation_dinf(RasterSpec(rows=96, cols=64, tile_rows=16))
    b = dinf.flow_accumulation_dinf(RasterSpec(rows=96, cols=64, tile_rows=48))
    pd.testing.assert_frame_equal(a, b)


def test_dinf_mass_conservation(ray_session):
    """Interior flow is conservative: total accumulation equals total
    path-length-weighted mass; weak check — every valid cell ≥ 1."""
    spec = RasterSpec(rows=64, cols=64, tile_rows=64)
    df = dinf.flow_accumulation_dinf_naive(spec)
    assert (df["sum_acc"] >= df["n_valid"] - 1e-6).all()


def test_mass_flux_dinf_matches_naive_and_tiling(ray_session):
    import pandas as pd

    from whitebox_geospatial_analysis_tools_ray.stages.dinf import (
        mass_flux_dinf, mass_flux_dinf_naive)
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    want = mass_flux_dinf_naive(spec)
    got = mass_flux_dinf(spec)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    alt = mass_flux_dinf(RasterSpec(rows=96, cols=96, tile_rows=16))
    pd.testing.assert_frame_equal(alt, want, check_dtype=False)


def test_mdinf_accum_matches_literal_walk(ray_session):
    """The banded Kahn fixed point equals the reference's literal
    row-major + DFS schedule (drop semantics included) — valid because
    the kernel asserts every portion edge is strictly downhill."""
    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = dinf.flow_accumulation_mdinf(spec)
    want = dinf.flow_accumulation_mdinf_literal(spec)
    pd.testing.assert_frame_equal(got, want)
    assert got["sum_acc"].sum() > 0


def test_mdinf_accum_tiling_invariant(ray_session):
    a = dinf.flow_accumulation_mdinf(RasterSpec(rows=96, cols=64,
                                                tile_rows=16))
    b = dinf.flow_accumulation_mdinf(RasterSpec(rows=96, cols=64,
                                                tile_rows=48))
    pd.testing.assert_frame_equal(a, b)


def test_mdinf_portions_sum_to_one_or_zero():
    spec = RasterSpec(rows=64, cols=64)
    cell = np.arange(spec.rows * spec.cols, dtype=np.int64)
    from whitebox_geospatial_analysis_tools_ray.stages.raster import (
        synth_value)
    z = synth_value(cell).reshape(spec.rows, spec.cols)
    pad = np.full((spec.rows + 2, spec.cols + 2), spec.nodata)
    pad[1:-1, 1:-1] = z
    por = dinf.mdinf_portions_kernel(pad, spec.nodata)
    s = por.sum(axis=0)
    live = s > 0
    assert np.allclose(s[live], 1.0)
    # one-hot h_exp >= 10 also sums to 1 on live cells
    por10 = dinf.mdinf_portions_kernel(pad, spec.nodata, h_exp=10.0)
    s10 = por10.sum(axis=0)
    assert np.allclose(s10[s10 > 0], 1.0)


def test_dinf_decidegree_truncation_regression():
    """r1-ADVICE regression (fixed at dinf.py:~97): the reference's
    Math.round(flowDir*10)/10 is LONG round-half-up followed by Java
    INTEGER division — the result truncates to WHOLE degrees. A
    0.1-degree-precision reading (round(x*10)/10.0 in float) keeps the
    fractional degree and diverges on any angle whose decidegrees are
    not a multiple of 10."""
    import numpy as np

    cases = (
        (44.36, 44.0),   # 443.6 -> 444 -> //10 = 44 (0.1-form: 44.4)
        (44.96, 45.0),   # 449.6 -> 450 -> 45
        (0.96, 1.0),     # 9.6 -> 10 -> 1
        (0.94, 0.0),     # 9.4 -> 9 -> 0
        (123.45, 123.0),  # 1234.5 half-up 1235 -> 123
    )
    for deg_true, want in cases:
        flow = np.array([np.deg2rad(deg_true)])
        got = np.floor(flow * (180.0 / np.pi) * 10.0 + 0.5) // 10.0
        assert got[0] == want, (deg_true, got[0], want)
    # the 0.1-precision misreading keeps tenths — differs on 44.36
    flow = np.array([np.deg2rad(44.36)])
    tenths = np.round(flow * (180.0 / np.pi) * 10.0) / 10.0
    assert tenths[0] == 44.4 and tenths[0] != 44.0
