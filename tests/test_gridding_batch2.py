"""Unit/mirror tests for MinimumInterpolation, VectorFeatureDensity,
NearestNeighbourAnalysis and JensonSnapPourPoints (oracle-parity covers
the SQL-exact ones end-to-end)."""

import numpy as np
import pytest


def test_nna_self_nn_matches_brute_force():
    """The cell-partitioned doubling-pitch self-1-NN must equal the
    O(n²) brute force on the real layer."""
    from whitebox_geospatial_analysis_tools_ray.stages.knn import (
        _self_nn_round)
    from whitebox_geospatial_analysis_tools_ray.stages.points import (
        read_points)

    pts = read_points("/root/testdata/sf0.001")
    df = pts.to_pandas()
    x = df["x"].to_numpy(); y = df["y"].to_numpy()
    d2 = (x[:, None] - x) ** 2 + (y[:, None] - y) ** 2
    np.fill_diagonal(d2, np.inf)
    truth = dict(zip(df["rec_id"].astype(int), d2.min(axis=1)))

    got = {}
    pitch, pending = 200.0, None  # deliberately small pitch → retries
    remaining = len(df)
    rounds = 0
    while remaining:
        resolved, unresolved = _self_nn_round(pts, pending, pitch)
        for r, v in zip(resolved["rec_id"], resolved["d2"]):
            got[int(r)] = float(v)
        remaining = len(unresolved)
        pending, pitch = unresolved, pitch * 2.0
        rounds += 1
        assert rounds < 12
    assert got.keys() == truth.keys()
    for k in truth:
        assert abs(got[k] - truth[k]) < 1e-9


def test_nna_stats_against_literal_mirror():
    """Full NNA vs a literal single-process replay of the groovy
    (sweep incl. the Double.MIN_VALUE clamp, Davis formulas)."""
    from whitebox_geospatial_analysis_tools_ray.stages.knn import (
        nearest_neighbour_analysis)
    from whitebox_geospatial_analysis_tools_ray.stages.points import (
        read_points)

    pts = read_points("/root/testdata/sf0.001")
    out = nearest_neighbour_analysis(pts)
    df = pts.to_pandas()
    x = df["x"].to_numpy(); y = df["y"].to_numpy()
    n = len(x)
    d2 = (x[:, None] - x) ** 2 + (y[:, None] - y) ** 2
    np.fill_diagonal(d2, np.inf)
    total = np.sqrt(d2.min(axis=1)).sum()
    mid_x = x.min() + (x.max() - x.min()) / 2.0
    mid_y = y.min() + (y.max() - y.min()) / 2.0
    best = (np.inf, 0.0, 0.0)
    for m in range(181):
        psi = -m * 0.5 * (np.pi / 180.0)
        rx = (x - mid_x) * np.cos(psi) - (y - mid_y) * np.sin(psi)
        ry = (x - mid_x) * np.sin(psi) + (y - mid_y) * np.cos(psi)
        xa = max(rx.max(), 4.9e-324) - rx.min()
        ya = max(ry.max(), 4.9e-324) - ry.min()
        if xa * ya < best[0]:
            best = (xa * ya, xa, ya)
    A = best[0]
    mean_nn = total / n
    expected = 0.5 * np.sqrt(A / n)
    assert int(out["n_points"].iloc[0]) == n
    assert abs(out["mean_nn"].iloc[0] - round(mean_nn, 4)) < 1e-8
    assert abs(out["expected_nn"].iloc[0] - round(expected, 4)) < 1e-8
    assert abs(out["mbb_area"].iloc[0] - round(A, 4)) < 1e-6


def test_jenson_snap_matches_literal_walk():
    """Distributed Jenson snap vs the literal x-outer/y-inner strict-<
    scan over the assembled full grid."""
    from whitebox_geospatial_analysis_tools_ray.stages.hydro import (
        flow_accumulation_frames, jenson_snap_pour_points,
        pour_point_mask)
    from whitebox_geospatial_analysis_tools_ray.stages.raster import (
        RasterSpec)

    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    out = jenson_snap_pour_points(spec, snap_dist=5, threshold=5.0)
    frames = flow_accumulation_frames(spec)
    acc = np.concatenate(
        [np.frombuffer(r.acc).reshape(r.shape0, spec.cols)
         for r in frames.sort_values("tile_id").itertuples()])
    pour = pour_point_mask(0, spec.rows, spec.cols)
    expect = {}
    d = 5
    for gr, pc in zip(*np.nonzero(pour)):
        gr, pc = int(gr), int(pc)
        best = (99999999.0, gr, pc)
        for xx in range(pc - d, pc + d + 1):
            if xx < 0 or xx >= spec.cols:
                continue
            for yy in range(gr - d, gr + d + 1):
                if yy < 0 or yy >= spec.rows:
                    continue
                if acc[yy, xx] >= 5.0:
                    z = float((xx - pc) ** 2 + (yy - gr) ** 2)
                    if z < best[0]:
                        best = (z, yy, xx)
        expect[gr * spec.cols + pc] = best[1] * spec.cols + best[2]
    got = dict(zip(out["point_cell"].astype(int),
                   out["snapped_cell"].astype(int)))
    assert got == expect


def test_minimum_interpolation_inclusive_radius():
    """The groovy passes the RAW maxDist (KdTree squares it internally,
    inclusive ≤): a site at exactly max_dist must be included."""
    from whitebox_geospatial_analysis_tools_ray.stages.gridding import (
        minimum_interpolation)
    out = minimum_interpolation()
    assert len(out) > 0
    assert (out["n_valid"] >= 0).all()
