"""Vector overlay (Sutherland–Hodgman) invariants + distributed EDT."""

import numpy as np
import pandas as pd

from whitebox_geospatial_analysis_tools_ray.core import geom
from whitebox_geospatial_analysis_tools_ray.core.features import seeded_polygons
from whitebox_geospatial_analysis_tools_ray.stages.distance import (
    euclidean_distance, target_mask_for_rows)
from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec
from whitebox_geospatial_analysis_tools_ray.stages.vector_overlay import (
    clip_polygons_convex)

CLIP = np.array([[1000.0, 1000.0], [3000.0, 1000.0],
                 [3000.0, 3000.0], [1000.0, 3000.0]])  # CCW convex


def test_clip_convex_unit_cases():
    # square fully inside → unchanged area
    sq = np.array([[1500.0, 1500.0], [1500.0, 2500.0],
                   [2500.0, 2500.0], [2500.0, 1500.0]])
    out = geom.clip_convex(sq, CLIP)
    assert abs(abs(geom.signed_area(out)) - 1000.0 * 1000.0) < 1e-6
    # square straddling the right edge → half area
    sq2 = np.array([[2500.0, 1500.0], [2500.0, 2500.0],
                    [3500.0, 2500.0], [3500.0, 1500.0]])
    out2 = geom.clip_convex(sq2, CLIP)
    assert abs(abs(geom.signed_area(out2)) - 500.0 * 1000.0) < 1e-6
    # square fully outside → empty
    sq3 = sq2 + 2000.0
    assert len(geom.clip_convex(sq3, CLIP)) == 0


def test_clip_polygons_convex_invariants():
    df = clip_polygons_convex(seeded_polygons(), CLIP)
    assert (df["clip_area"] <= df["area"] + 1e-6).all()
    assert (df["clip_area"] >= -1e-9).all()
    # a clip window covering the whole extent must be a no-op
    big = np.array([[-1e5, -1e5], [1e5, -1e5], [1e5, 1e5], [-1e5, 1e5]])
    df2 = clip_polygons_convex(seeded_polygons(), big)
    np.testing.assert_allclose(df2["clip_area"], df2["area"], atol=1e-5)


def _edt_naive(spec: RasterSpec) -> pd.DataFrame:
    mask = target_mask_for_rows(0, spec.rows, spec.cols)
    tr, tc = np.nonzero(mask)
    rr, cc = np.meshgrid(np.arange(spec.rows), np.arange(spec.cols),
                         indexing="ij")
    d2 = ((rr.ravel()[:, None] - tr[None, :]) ** 2
          + (cc.ravel()[:, None] - tc[None, :]) ** 2).min(axis=1)
    dist = np.sqrt(d2.astype(np.float64)).reshape(spec.rows, spec.cols)
    return pd.DataFrame({
        "row_id": np.arange(spec.rows),
        "n_valid": np.full(spec.rows, spec.cols, dtype=np.int64),
        "row_sum": np.round(dist.sum(axis=1), 6)})


def test_edt_matches_naive_and_tiling_invariant(ray_session):
    for tile_rows in (16, 64):
        spec = RasterSpec(rows=64, cols=48, tile_rows=tile_rows)
        got = (euclidean_distance(spec).to_pandas()
               .sort_values("row_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, _edt_naive(spec))
