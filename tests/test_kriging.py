"""Distributed ordinary kriging == brute-force single-process mirror."""

import numpy as np
import pandas as pd
import pytest

from whitebox_geospatial_analysis_tools_ray.stages import kriging as kg

SF = "/root/testdata/sf0.001"


def test_variogram_matches_brute_force(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.points import read_points
    got = kg.empirical_variogram(read_points(SF))
    pts = read_points(SF).to_pandas()
    x, y, z, r = (pts[c].to_numpy() for c in ("x", "y", "z", "rec_id"))
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    m = (d2 > 0) & (d2 < kg.MAX_DIST ** 2) & (r[:, None] < r[None, :])
    d = np.sqrt(d2[m])
    bins = np.minimum((d / kg.LAG_SIZE).astype(np.int64), kg.N_LAGS - 1)
    hsq = 0.5 * ((z[:, None] - z[None, :]) ** 2)[m]
    for b in got.itertuples():
        sel = bins == b.bin
        assert b.n == sel.sum()
        assert b.gamma == np.testing.assert_allclose(
            b.gamma, hsq[sel].sum() / sel.sum(), rtol=1e-9) or True
        np.testing.assert_allclose(b.mean_dist, d[sel].mean(), rtol=1e-9)
    assert got["n"].sum() == m.sum()


def test_krige_matches_naive(ray_session):
    got = kg.krige_cells(SF).to_pandas().reset_index(drop=True)
    want = kg.krige_cells_naive(SF)
    pd.testing.assert_frame_equal(got, want)
    # predictions exist over most of the extent
    assert (got["kriged_z"] != -32768.0).mean() > 0.9


def test_spherical_model_shape():
    g = kg.spherical(np.array([0.0, 50.0, 100.0, 1e9]), 2.0, 100.0)
    assert g[0] == 0.0
    assert 0 < g[1] < g[2]
    assert g[2] == g[3] == 2.0  # capped at sill beyond range


def test_rbf_matches_naive(ray_session):
    got = kg.rbf_cells(SF).to_pandas().reset_index(drop=True)
    want = kg.rbf_cells_naive(SF)
    pd.testing.assert_frame_equal(got, want)
    assert (got["rbf_z"] != -32768.0).mean() > 0.9


def test_gauss_solve_matches_lapack():
    """The replayable elimination solves the same systems LAPACK does
    (well-conditioned random SPD-ish and the actual OK matrix shape)."""
    rng = np.random.default_rng(7)
    for n in (2, 5, 13):
        A = rng.normal(size=(n, n)) + n * np.eye(n)
        b = rng.normal(size=n)
        x = kg.gauss_solve(A, b)
        assert np.allclose(A @ x, b, atol=1e-9)
        assert np.allclose(x, np.linalg.solve(A, b), atol=1e-9)


def test_sdot_is_left_fold():
    a = np.array([1e16, 1.0, -1e16])
    b = np.array([1.0, 1.0, 1.0])
    # left fold: (1e16 + 1) + -1e16 == 0.0 (the +1 is absorbed)
    assert kg._sdot(a, b) == 0.0


def test_gauss_solve_singular_raises():
    """ADVICE regression: a singular neighbour system (coincident /
    collinear points) must raise LinAlgError loudly, not divide by a
    zero pivot and emit inf/NaN predictions."""
    A = np.array([[1.0, 2.0], [2.0, 4.0]])   # rank 1
    with pytest.raises(np.linalg.LinAlgError):
        kg.gauss_solve(A, np.array([1.0, 2.0]))
    with pytest.raises(np.linalg.LinAlgError):
        kg.gauss_solve(np.zeros((3, 3)), np.ones(3))
