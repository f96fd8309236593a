"""SURVEY §5 property checks: results are invariant to the input's
block structure (1 block vs many) and to input row order."""

import pandas as pd
import ray.data as rd


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_pip_join_block_count_invariant(ray_session):
    from whitebox_geospatial_analysis_tools_ray.core.features import rect_zones
    from whitebox_geospatial_analysis_tools_ray.stages.points import read_points
    from whitebox_geospatial_analysis_tools_ray.stages.spatial_join import (
        broadcast_pip_join)
    pts = read_points("/root/testdata/sf0.001")
    one = pts.repartition(1)
    many = pts.repartition(13)
    a = _sorted(broadcast_pip_join(one, rect_zones()).to_pandas())
    b = _sorted(broadcast_pip_join(many, rect_zones()).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_tile_counts_block_count_and_order_invariant(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.tiling import tile_counts
    base = _sorted(tile_counts("/root/testdata/sf0.001")[0].to_pandas())

    # permuted input: shuffle the points before the same partial+combine
    from whitebox_geospatial_analysis_tools_ray.core.tiles import RectGrid
    from whitebox_geospatial_analysis_tools_ray.stages.points import (
        extent_of, read_points)
    pts = read_points("/root/testdata/sf0.001").random_shuffle(seed=7)
    minx, miny, maxx, maxy = extent_of(pts)
    grid = RectGrid.from_extent(minx, miny, maxx, maxy, 0.0, 0.0,
                                250.0, 250.0)
    import numpy as np
    df = pts.to_pandas()
    tile = grid.tile_of(df["x"].to_numpy(), df["y"].to_numpy())
    g = (pd.DataFrame({"tile_id": tile, "z": df["z"].to_numpy()})
         .groupby("tile_id")["z"]
         .agg(n_points="count", sum_z="sum", min_z="min", max_z="max")
         .reset_index())
    g["sum_z"] = g["sum_z"].round(6)
    g["n_points"] = g["n_points"].astype("int64")
    pd.testing.assert_frame_equal(base, _sorted(g))


def test_exact_dedup_block_count_invariant(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.dedup import exact_dedup
    a = _sorted(exact_dedup("/root/testdata/sf0.001").to_pandas())
    b = _sorted(exact_dedup("/root/testdata/sf0.001").to_pandas())
    pd.testing.assert_frame_equal(a, b)
