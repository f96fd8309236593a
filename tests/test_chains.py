import math

import numpy as np
import pandas as pd
import pytest


def test_known_chain_of_three():
    """Three collinear elongated rectangles link into one chain; a fat
    square between chains stays isolated (elongation gate)."""
    from whitebox_geospatial_analysis_tools_ray.stages import chains

    pts_rows = []
    for rec0, cx in enumerate([0.0, 44.0, 88.0]):  # len 40, gap 4
        verts = chains._member_vertices(cx + 20.0, 0.0, 0.0, 40.0, 8.0)
        res = chains.poly_endpoints(verts)
        assert res is not None
        elong, (x1, y1), (x2, y2) = res
        assert elong > 0.75
        pts_rows.append({"pt": rec0 * 2, "x": x1, "y": y1,
                         "poly": rec0 + 1, "endiness": 1})
        pts_rows.append({"pt": rec0 * 2 + 1, "x": x2, "y": y2,
                         "poly": rec0 + 1, "endiness": 2})
    # fat square: excluded by the elongation threshold
    assert chains.poly_endpoints(
        chains._member_vertices(300.0, 0.0, 0.3, 20.0, 20.0)) is None
    out = chains._match_and_walk(pd.DataFrame(pts_rows), 3)
    assert sorted(out["parent_id"].tolist()) == [1, 2, 3]
    assert set(out["group_id"].tolist()) == {1}


def test_chain_below_min_length_dropped():
    from whitebox_geospatial_analysis_tools_ray.stages import chains

    pts_rows = []
    for rec0, cx in enumerate([0.0, 44.0]):  # chain of 2 < MIN_CHAIN
        verts = chains._member_vertices(cx + 20.0, 0.0, 0.0, 40.0, 8.0)
        _, (x1, y1), (x2, y2) = chains.poly_endpoints(verts)
        pts_rows.append({"pt": rec0 * 2, "x": x1, "y": y1,
                         "poly": rec0 + 1, "endiness": 1})
        pts_rows.append({"pt": rec0 * 2 + 1, "x": x2, "y": y2,
                         "poly": rec0 + 1, "endiness": 2})
    out = chains._match_and_walk(pd.DataFrame(pts_rows), 2)
    assert len(out) == 0


def test_rotating_mbb_endpoints_on_rotated_rect():
    """End points of a rotated rectangle are the short-side midvertex
    corners nearest each major-axis endpoint."""
    from whitebox_geospatial_analysis_tools_ray.stages import chains

    theta = 30.0 * math.pi / 180.0  # multiple of the 0.5° sweep
    verts = chains._member_vertices(10.0, 5.0, theta, 40.0, 8.0)
    elong, e1, e2 = chains.poly_endpoints(verts)
    assert elong == pytest.approx(1.0 - 8.0 / 40.0, abs=1e-9)
    # both end points are actual vertices
    for ex, ey in (e1, e2):
        d = np.min((verts[:, 0] - ex) ** 2 + (verts[:, 1] - ey) ** 2)
        assert d < 1e-18
    # ends lie on opposite extremes of the major axis
    ax = np.array([math.cos(theta), math.sin(theta)])
    s1 = (np.array(e1) - [10.0, 5.0]) @ ax
    s2 = (np.array(e2) - [10.0, 5.0]) @ ax
    assert s1 * s2 < 0 and abs(abs(s1) - 20.0) < 1.0


def test_find_polygon_chains_matches_naive(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages import chains

    got = chains.find_polygon_chains("/root/testdata/sf0.001")
    want = chains.find_polygon_chains_naive("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
    sizes = got.groupby("group_id").size()
    assert (sizes >= chains.MIN_CHAIN).all()


def test_find_polygon_chains_partitioning_invariant(ray_session):
    """The sequential-greedy matching is keyed by point index, not by
    block order: repartitioning phase 1 changes nothing."""
    from whitebox_geospatial_analysis_tools_ray.stages import chains

    base = chains.find_polygon_chains("/root/testdata/sf0.001")
    pts = (chains.chain_members("/root/testdata/sf0.001")
           .repartition(7))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in batch.itertuples():
            verts = chains._member_vertices(r.cx, r.cy, r.theta,
                                            r.length, r.width)
            res = chains.poly_endpoints(verts)
            if res is None:
                continue
            rec = int(r.rec_id)
            _, (x1, y1), (x2, y2) = res
            rows.append({"pt": rec * 2, "x": x1, "y": y1,
                         "poly": rec + 1, "endiness": 1})
            rows.append({"pt": rec * 2 + 1, "x": x2, "y": y2,
                         "poly": rec + 1, "endiness": 2})
        return pd.DataFrame(rows, columns=["pt", "x", "y", "poly",
                                           "endiness"])

    tab = (pts.map_batches(fn, batch_format="pandas").to_pandas()
           .sort_values("pt").reset_index(drop=True))
    alt = chains._match_and_walk(tab, int(tab["poly"].max()))
    pd.testing.assert_frame_equal(alt, base)


def test_neck_detection_on_dumbbell():
    """The two corridor walls of a dumbbell polygon are detected as neck
    polylines; an isolated square has none."""
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.stages.vector_ops import (
        _dumbbell_ring, _neck_segments_of)

    ring = _dumbbell_ring(0.0, 0.0, 10)
    segs = _neck_segments_of(ring, 3.0, 30.0)
    assert len(segs) == 2 and all(s >= 10 for s in segs)
    # a plain square ring: all neighbourhoods are index-contiguous
    pts = []
    for i in range(4):
        x0, y0 = [(0, 0), (10, 0), (10, 10), (0, 10)][i]
        x1, y1 = [(10, 0), (10, 10), (0, 10), (0, 0)][i]
        for s in range(10):
            t = s / 10
            pts.append((x0 + (x1 - x0) * t, y0 + (y1 - y0) * t))
    pts.append(pts[0])
    assert _neck_segments_of(np.asarray(pts), 3.0, 30.0) == []


def test_remove_polygon_necks_runs(ray_session):
    from whitebox_geospatial_analysis_tools_ray.stages.vector_ops import (
        remove_polygon_necks)

    df = remove_polygon_necks("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    # every feature detects its two corridor walls
    per = df.groupby("rec_id")["seg_id"].max()
    assert (per == 2).all()
