import numpy as np
import pandas as pd


def test_cleanup_merges_near_centres_with_restart_order():
    from whitebox_geospatial_analysis_tools_ray.stages.mkmeans import _cleanup

    centres = [np.array([0.0, 0.0]), np.array([1.0, 0.0]),
               np.array([100.0, 0.0]), np.array([0.0, 0.0])]
    counts = [10, 30, 5, 0]
    out_c, out_n = _cleanup(centres, counts, merge_dist=5.0, min_size=1)
    # empty class dropped first; (0,0)x10 and (1,0)x30 merge to the
    # weighted mean APPENDED at the end (literal order)
    assert len(out_c) == 2
    assert out_n == [5, 40]
    assert np.allclose(out_c[0], [100.0, 0.0])
    assert np.allclose(out_c[1], [0.75, 0.0])


def test_cleanup_drops_small_classes():
    from whitebox_geospatial_analysis_tools_ray.stages.mkmeans import _cleanup

    centres = [np.array([0.0, 0.0]), np.array([500.0, 0.0])]
    out_c, out_n = _cleanup(centres, [3, 100], merge_dist=1.0, min_size=10)
    assert out_n == [100]


def test_modified_kmeans_matches_naive(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import mkmeans
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = mkmeans.modified_kmeans(spec)
    want = mkmeans.modified_kmeans_naive(spec)
    pd.testing.assert_frame_equal(got, want)
    assert got.attrs["iterations"] == want.attrs["iterations"]
    assert got.attrs["final_classes"] == want.attrs["final_classes"]


def test_modified_kmeans_merge_path(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import mkmeans
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    spec = RasterSpec(rows=64, cols=64, tile_rows=32)
    got = mkmeans.modified_kmeans(spec, merge_dist=300.0)
    want = mkmeans.modified_kmeans_naive(spec, merge_dist=300.0)
    pd.testing.assert_frame_equal(got, want)
    assert got.attrs["final_classes"] < 8  # merges actually happened


def test_modified_kmeans_tiling_invariant(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import mkmeans
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    a = mkmeans.modified_kmeans(RasterSpec(rows=96, cols=64, tile_rows=16))
    b = mkmeans.modified_kmeans(RasterSpec(rows=96, cols=64, tile_rows=48))
    pd.testing.assert_frame_equal(a, b)


def test_dendrogram_matches_naive_fit(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import mkmeans
    from whitebox_geospatial_analysis_tools_ray.stages.raster import RasterSpec

    spec = RasterSpec(rows=96, cols=96, tile_rows=32)
    got = mkmeans.dendrogram(spec)
    fit = mkmeans.modified_kmeans_naive(spec)
    want = mkmeans.dendrogram_merges(fit.attrs["centres"],
                                     fit.attrs["counts"])
    pd.testing.assert_frame_equal(got, want)
    # n classes merge in n-1 steps, ids continue past the class count
    n = fit.attrs["final_classes"]
    assert len(got) == n - 1
    assert got["new_id"].iloc[-1] == 2 * n - 2


def test_dendrogram_keeps_larger_class_centroid():
    from whitebox_geospatial_analysis_tools_ray.stages.mkmeans import (
        dendrogram_merges)

    # classes 0 (big) and 1 (small) merge first; node 3's centroid is
    # class 0's verbatim, so the second merge distance is measured from
    # class 0's centroid, not the weighted mean
    centres = [[0.0, 0.0], [10.0, 0.0], [100.0, 0.0]]
    sizes = [1000, 1, 5]
    out = dendrogram_merges(centres, sizes)
    assert list(out["left_id"]) == [0.0, 2.0]
    assert out["dist"].iloc[1] == 100.0  # from (0,0), not the mean
