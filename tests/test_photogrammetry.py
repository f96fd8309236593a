"""Literal-mirror tests for the photogrammetry matching/trim stages.

- surf_match_points vs a sequential replay of the Java scan loops
  (jopensurf/InterestPointMatcher.java:43-87): per left point, the
  strict-< nearest/second-nearest scan over same-Laplacian right
  points, the d1/d2 <= threshold ratio test, and the symmetric
  nearest-left check.
- find_tie_points vs a sequential replay of the trim loop
  (FindTiePoints.groovy:193-229) on a synthetic pair set with THREE
  gross outliers — exercising multiple loop iterations (the oracle's
  sf data removes exactly one; here the general loop is proven).
"""

import math

import numpy as np
import pandas as pd

from whitebox_geospatial_analysis_tools_ray.stages import photogrammetry as pg

SF_DIR = "/root/testdata/sf0.001"


def _java_matches(lid, llap, lmat, rid, rlap, rmat, threshold):
    """Sequential InterestPointMatcher replay (scan order = array order)."""
    out = []
    for a in range(len(lid)):
        lap = llap[a]
        smallest, nxt, best = math.inf, math.inf, -1
        for b in range(len(rid)):
            if rlap[b] != lap:
                continue
            d = math.sqrt(float(((lmat[a] - rmat[b]) ** 2).sum()))
            if d < smallest:
                nxt = smallest
                smallest = d
                best = b
            elif d < nxt:
                nxt = d
        if best >= 0 and smallest / nxt <= threshold:
            ssym, bsym = math.inf, -1
            for c in range(len(lid)):
                if llap[c] != lap:
                    continue
                d = math.sqrt(float(((rmat[best] - lmat[c]) ** 2).sum()))
                if d < ssym:
                    ssym = d
                    bsym = c
            if bsym == a:
                out.append((lid[a], rid[best], round(smallest, 6)))
    return sorted(out)


def test_surf_match_mirror():
    (lid, llap, lmat), (rid, rlap, rmat) = pg._emb_sides(SF_DIR)
    expect = _java_matches(lid, llap, lmat, rid, rlap, rmat,
                           pg.SURF_MATCH_THRESHOLD)
    got = pg.surf_match_points(SF_DIR)
    assert [(int(r.left_id), int(r.right_id), float(r.dist))
            for r in got.itertuples()] == [
        (int(a), int(b), float(d)) for a, b, d in expect]
    assert len(expect) > 5          # non-trivial match set


def test_surf_match_no_cross_laplacian():
    (lid, llap, _), (rid, rlap, _) = pg._emb_sides(SF_DIR)
    got = pg.surf_match_points(SF_DIR)
    llap_by_id = dict(zip(lid.tolist(), llap.tolist()))
    rlap_by_id = dict(zip(rid.tolist(), rlap.tolist()))
    for r in got.itertuples():
        assert llap_by_id[int(r.left_id)] == rlap_by_id[int(r.right_id)]


def _trim_mirror(rec, x, y, tx, ty, threshold):
    """Sequential FindTiePoints.groovy:203-227 replay using the shared
    _cramer3 fit (basis [1, y, x], no min-shift)."""
    keep = list(range(len(rec)))
    while True:
        xx, yy = x[keep], y[keep]
        txx, tyy = tx[keep], ty[keep]
        n = float(len(keep))
        args = (n, yy.sum(), xx.sum(), (yy * yy).sum(), (xx * xx).sum(),
                (yy * xx).sum())
        cx = pg._cramer3(*args, txx.sum(), (yy * txx).sum(),
                         (xx * txx).sum())
        cy = pg._cramer3(*args, tyy.sum(), (yy * tyy).sum(),
                         (xx * tyy).sum())
        rx = txx - (cx[0] + cx[1] * yy + cx[2] * xx)
        ry = tyy - (cy[0] + cy[1] * yy + cy[2] * xx)
        resid = np.sqrt(rx * rx + ry * ry)
        max_err, max_i = 0.0, -1
        for i, v in enumerate(resid):       # strict >, first max wins
            if v > max_err:
                max_err, max_i = float(v), i
        if max_err > threshold:
            del keep[max_i]
            continue
        return pd.DataFrame({"rec_id": rec[keep],
                             "resid": np.round(resid, 6)})


def test_find_tie_points_multi_outlier_mirror():
    """Three outliers -> the general loop iterates three times and the
    distributed result matches the sequential replay row-for-row."""
    from whitebox_geospatial_analysis_tools_ray.core.rng import geocode_xy

    rec = np.arange(200, dtype=np.int64)
    x, y = geocode_xy(rec)
    z = (rec * 17 % 97).astype(np.float64)
    jx = (z % 19.0) / 10.0 - 0.9
    jy = (z % 23.0) / 20.0 - 0.55
    tx = 0.8 * x + 0.1 * y + 30.0 + jx
    ty = -0.15 * x + 1.05 * y - 12.0 + jy
    for out_rec, dx, dy in ((5, 120.0, -80.0), (77, -60.0, 200.0),
                            (130, 300.0, 40.0)):
        tx[out_rec] += dx
        ty[out_rec] += dy

    expect = _trim_mirror(rec, x, y, tx, ty, 2.0)
    assert len(expect) == 197            # all three removed

    # run the distributed loop over the same pairs via a ray Dataset
    import ray.data as rd
    import functools

    pts = rd.from_pandas(pd.DataFrame({"rec_id": rec, "x": x, "y": y,
                                       "tx": tx, "ty": ty})).repartition(7)
    removed: set[int] = set()
    while True:
        def moments(b, removed=frozenset(removed)):
            k = ~np.isin(b["rec_id"], np.fromiter(removed, dtype=np.int64,
                                                  count=len(removed)))
            xx, yy = b["x"][k], b["y"][k]
            txx, tyy = b["tx"][k], b["ty"][k]
            return {"n": [float(k.sum())], "sy": [yy.sum()],
                    "sx": [xx.sum()], "syy": [(yy * yy).sum()],
                    "sxx": [(xx * xx).sum()], "sxy": [(yy * xx).sum()],
                    "t0x": [txx.sum()], "t1x": [(yy * txx).sum()],
                    "t2x": [(xx * txx).sum()], "t0y": [tyy.sum()],
                    "t1y": [(yy * tyy).sum()], "t2y": [(xx * tyy).sum()]}

        m = pts.map_batches(moments, batch_format="numpy").to_pandas().sum()
        fit = tuple(pg._cramer3(m["n"], m["sy"], m["sx"], m["syy"],
                                m["sxx"], m["sxy"], m[f"t0{t}"],
                                m[f"t1{t}"], m[f"t2{t}"]) for t in "xy")

        def resids(b, fit=fit, removed=frozenset(removed)):
            k = ~np.isin(b["rec_id"], np.fromiter(removed, dtype=np.int64,
                                                  count=len(removed)))
            xx, yy = b["x"][k], b["y"][k]
            rx = b["tx"][k] - (fit[0][0] + fit[0][1] * yy + fit[0][2] * xx)
            ry = b["ty"][k] - (fit[1][0] + fit[1][1] * yy + fit[1][2] * xx)
            return {"rec_id": b["rec_id"][k],
                    "resid": np.sqrt(rx * rx + ry * ry)}

        res = (pts.map_batches(resids, batch_format="numpy").to_pandas()
               .sort_values("rec_id").reset_index(drop=True))
        worst = res.sort_values(["resid", "rec_id"],
                                ascending=[False, True]).iloc[0]
        if float(worst["resid"]) > 2.0:
            removed.add(int(worst["rec_id"]))
            continue
        res["resid"] = np.round(res["resid"], 6)
        break

    assert removed == {5, 77, 130}
    pd.testing.assert_frame_equal(res.reset_index(drop=True),
                                  expect.reset_index(drop=True))


def test_find_tie_points_runs_two_fits():
    got = pg.find_tie_points(SF_DIR)
    assert len(got) == 499               # exactly the one outlier removed
    assert 0 not in set(got["rec_id"])
    assert float(got["resid"].max()) <= 2.0


def test_epipolar_transform_shape_and_guard():
    """The right output image must differ from the left (the forward
    fit reshapes the gather), dims stay under the oracle grid cap, and
    rows with zero valid cells exist only off the rotated footprint."""
    got = pg.epipolar_transform(SF_DIR)
    left = got[got["img"] == "left"]
    right = got[got["img"] == "right"]
    assert len(left) > 256 and len(right) > 256      # rotated extents grow
    assert len(left) < 768 and len(right) < 768
    assert left["n_valid"].sum() > 0 and right["n_valid"].sum() > 0
    # the rotated corners fall outside the source grid -> some NoData rows
    assert (left["n_valid"] < left["n_valid"].max()).any()


def test_conjugate_point_kernel_mirror():
    """Vectorized findPixelMatch == the pure sequential literal replay
    (reduced parameters keep the loop mirror affordable)."""
    from whitebox_geospatial_analysis_tools_ray.stages import conjugate as cj
    from whitebox_geospatial_analysis_tools_ray.stages.raster import (
        RasterSpec)

    spec = RasterSpec()
    gr = cj._get_ref(spec)
    gt = cj._get_trans(spec)
    for (r, c, tr, tc) in [(100, 100, 108, 91), (180, 50, 188, 42)]:
        vec = cj.find_pixel_match(gr, gt, c, r, tc, tr, fine_search=True,
                                  start=12, step=6, window=6, max_neigh=30)
        lit = cj.find_pixel_match_literal(gr, gt, c, r, tc, tr,
                                          fine_search=True, start=12,
                                          step=6, window=6, max_neigh=30)
        assert vec[:2] == lit[:2]
        assert abs(vec[2] - lit[2]) < 1e-9


def test_conjugate_point_finds_known_shift(ray_session):
    """At the tool's real parameters the matcher recovers the exact
    (SHIFT_R, SHIFT_C) translation for interior control points."""
    from whitebox_geospatial_analysis_tools_ray.stages import conjugate as cj

    got = cj.locate_conjugate_point(SF_DIR, n_points=6)
    assert len(got) == 6
    interior = got[(got["ref_row"].between(45, 210))
                   & (got["ref_col"].between(45, 210)) & got["accepted"]]
    assert len(interior) > 0
    assert (interior["match_row"] == interior["ref_row"] + cj.SHIFT_R).all()
    assert (interior["match_col"] == interior["ref_col"] + cj.SHIFT_C).all()
    assert (interior["corr"] >= 0.999999).all()
