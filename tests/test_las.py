"""LAS 1.2 reader/writer roundtrip + distributed chunked read."""

import numpy as np

from whitebox_geospatial_analysis_tools_ray.sources import las


def test_las_roundtrip(tmp_path, ray_session):
    g = np.random.default_rng(5)
    n = 1000
    x = g.uniform(0, 4000, n)
    y = g.uniform(0, 4000, n)
    z = g.uniform(0, 900, n)
    inten = g.integers(0, 4096, n)
    cls = g.integers(1, 8, n)
    p = str(tmp_path / "t.las")
    las.write_las(p, x, y, z, inten, cls)

    hdr = las.read_las_header(p)
    assert hdr.version == (1, 2)
    assert hdr.n_points == n
    assert hdr.point_format == 0

    df = las.read_las(p, chunk_points=256).to_pandas()
    assert len(df) == n
    # quantized to scale 1/1024 → within half a quantum, exactly dyadic
    assert np.abs(df["x"].to_numpy() - x).max() <= las.SCALE / 2 + 1e-12
    assert (df["intensity"].to_numpy() == inten).all()
    assert (df["classification"].to_numpy() == cls).all()
    # chunk boundaries must not duplicate or drop records
    df2 = las.read_las(p, chunk_points=1000000).to_pandas()
    assert (df.sort_values(["x", "y"]).reset_index(drop=True)
            == df2.sort_values(["x", "y"]).reset_index(drop=True)).all().all()


def test_las_point_formats_1_2_3(tmp_path, ray_session):
    g = np.random.default_rng(8)
    n = 700
    x = g.uniform(0, 4000, n)
    y = g.uniform(0, 4000, n)
    z = g.uniform(0, 900, n)
    inten = g.integers(0, 4096, n)
    cls = g.integers(1, 8, n)
    gps = g.integers(0, 1 << 30, n) / 1024.0
    rgb = tuple(g.integers(0, 65536, n) for _ in range(3))
    for fmt in (1, 2, 3):
        p = str(tmp_path / f"f{fmt}.las")
        las.write_las(p, x, y, z, inten, cls, point_format=fmt,
                      gps_time=gps, rgb=rgb)
        hdr = las.read_las_header(p)
        assert hdr.point_format == fmt
        assert hdr.record_len == las._pt_dtype(fmt).itemsize
        df = las.read_las(p, chunk_points=123).to_pandas()
        assert len(df) == n
        assert (df["intensity"].to_numpy() == inten).all()
        if fmt in (1, 3):
            assert (df["gps_time"].to_numpy() == gps).all()
        else:
            assert "gps_time" not in df.columns
        if fmt in (2, 3):
            for col, want in zip(("red", "green", "blue"), rgb):
                assert (df[col].to_numpy() == want).all()
        else:
            assert "red" not in df.columns


def test_las_rejects_format_beyond_3(tmp_path):
    import struct
    p = str(tmp_path / "f6.las")
    hdr = bytearray(227)
    hdr[:4] = b"LASF"
    hdr[24], hdr[25] = 1, 4
    struct.pack_into("<I", hdr, 96, 227)
    hdr[104] = 6                      # format 6 (LAS 1.4) — out of scope
    struct.pack_into("<H", hdr, 105, 30)
    struct.pack_into("<I", hdr, 107, 0)
    open(p, "wb").write(bytes(hdr))
    try:
        las.read_las(p)
        assert False
    except NotImplementedError:
        pass


def test_las_rejects_non_las(tmp_path):
    p = str(tmp_path / "x.las")
    open(p, "wb").write(b"NOPE" + b"\0" * 300)
    try:
        las.read_las_header(p)
        assert False
    except ValueError:
        pass


def test_isolate_ground_points_matches_literal_order_walk():
    """Distributed pair-extraction + driver replay vs the literal
    O(n²) index-order walk (incl. the already-marked centre skip and
    the equal-z → neighbour-marked branch)."""
    import math

    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.sources.las import (
        isolate_ground_points, read_las, synth_las_path)

    sf = "/root/testdata/sf0.001"
    got = isolate_ground_points(sf)
    df = read_las(synth_las_path(sf)).to_pandas()
    x = df["x"].to_numpy(); y = df["y"].to_numpy(); z = df["z"].to_numpy()
    n = len(df)
    thr = math.tan(math.radians(30.0))
    off = np.zeros(n, dtype=bool)
    d2 = (x[:, None] - x) ** 2 + (y[:, None] - y) ** 2
    for a in range(n):
        if off[a]:
            continue
        for b in range(n):
            dd = d2[a, b]
            if dd == 0.0 or dd > 600.0 * 600.0:
                continue
            dist = math.sqrt(dd)
            if z[a] > z[b]:
                hi, ediff = a, z[a] - z[b]
            else:
                hi, ediff = b, z[b] - z[a]
            if ediff / dist > thr and ediff > 0.15:
                off[hi] = True
    assert int(got["n_off_terrain"].iloc[0]) == int(off.sum())
    assert int(got["sum_off_index"].iloc[0]) == int(np.flatnonzero(off).sum())


def test_lidar_canopy_model_matches_brute_force_replay():
    """Distributed candidate extraction + replay vs a full O(cells·n)
    brute-force replay with the identical (d², index) enumeration."""
    import math

    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.sources.las import (
        lidar_canopy_model, read_las, synth_las_path)

    sf = "/root/testdata/sf0.001"
    res, min_h, max_s = 250.0, 2.0, 30.0
    got = lidar_canopy_model(sf, res, min_h, max_s)

    df = read_las(synth_las_path(sf)).to_pandas()
    px = df["x"].to_numpy(); py = df["y"].to_numpy(); pz = df["z"].to_numpy()
    west = px.min() - 0.5 * res
    north = py.max() + 0.5 * res
    nrows = int(math.ceil((north - py.min()) / res))
    ncols = int(math.ceil((px.max() - west) / res))
    md2 = (math.sqrt(2.0) * res / 2.0) ** 2
    tan_thr = math.tan(math.radians(max_s))
    nong = np.zeros(len(px), dtype=bool)
    chm = {}
    for r in range(nrows):
        yy = north - res / 2 - r * res
        for c in range(ncols):
            xx = west + res / 2 + c * res
            d2 = (xx - px) ** 2 + (yy - py) ** 2
            idx = np.flatnonzero(d2 <= md2)
            idx = idx[np.lexsort((idx, d2[idx]))]
            if len(idx) <= 1:
                continue
            for i in range(len(idx) - 1):
                a = idx[i]
                if nong[a]:
                    continue
                for j in range(i + 1, len(idx)):
                    b = idx[j]
                    if nong[b]:
                        continue
                    dxx = px[a] - px[b]
                    dyy = py[a] - py[b]
                    dist = math.sqrt(dxx * dxx + dyy * dyy)
                    if pz[a] > pz[b]:
                        hi, dv = a, pz[a] - pz[b]
                    else:
                        hi, dv = b, pz[b] - pz[a]
                    if dist == 0.0:
                        if dv == 0.0:
                            continue
                        nong[hi] = True
                    elif dv / dist > tan_thr:
                        nong[hi] = True
            z = -32768.0
            mind = np.inf
            maxh = -np.inf
            for i, a in enumerate(idx):
                if not nong[a]:
                    if d2[a] < mind:
                        mind = d2[a]
                        z = pz[a]
                else:
                    maxh = max(maxh, pz[a])
            if z != -32768.0 and maxh > -np.inf and maxh - z > min_h:
                chm[r * ncols + c] = maxh - z
    for r in range(nrows):
        vals = [v for cc, v in chm.items() if cc // ncols == r]
        row = got[got["row_id"] == r].iloc[0]
        assert int(row["n_chm"]) == len(vals)
        assert abs(row["row_sum"] - round(float(sum(vals)), 6)) < 1e-9


def test_bare_earth_dem_matches_brute_force_replay(ray_session):
    """Single-process replay (no shuffle: all points per cell by brute
    force, same (d², idx) order) == the distributed query."""
    import math

    import numpy as np
    import pandas as pd

    from whitebox_geospatial_analysis_tools_ray.sources import las

    sf = "/root/testdata/sf0.001"
    got = las.lidar_bare_earth_dem(sf)

    # brute force
    path = las.synth_las_path(sf)
    hdr = las.read_las_header(path)
    pts = las.read_las(path, with_index=True).to_pandas()
    px = pts["x"].to_numpy(); py = pts["y"].to_numpy()
    pz = pts["z"].to_numpy(); psa = pts["scan_angle"].to_numpy()
    resolution, max_dist, weight, max_slope = 250.0, 260.0, 2.0, 30.0
    west = px.min() - 0.5 * resolution
    north = py.max() + 0.5 * resolution
    nrows = int(math.ceil((north - py.min()) / resolution))
    ncols = int(math.ceil((px.max() - west) / resolution))
    md2 = max_dist * max_dist
    half = resolution / 2.0
    tan_thr = math.tan(math.radians(max_slope))
    nonground = np.zeros(hdr.n_points, dtype=bool)
    dem = {}
    for row in range(nrows):
        yy = north - half - row * resolution
        for col in range(ncols):
            xx = west + half + col * resolution
            d2 = (xx - px) ** 2 + (yy - py) ** 2
            sel = np.flatnonzero(d2 <= md2)
            if len(sel) == 0:
                continue
            sel = sel[np.lexsort((sel, d2[sel]))]
            n = len(sel)
            if n == 1:
                dem[row * ncols + col] = float(pz[sel[0]])
                continue
            for ii in range(n - 1):
                a = sel[ii]
                if nonground[a]:
                    continue
                for jj in range(ii + 1, n):
                    b = sel[jj]
                    if nonground[b]:
                        continue
                    dxx = px[a] - px[b]
                    dyy = py[a] - py[b]
                    dist = math.sqrt(dxx * dxx + dyy * dyy)
                    if pz[a] > pz[b]:
                        hi, dv = a, pz[a] - pz[b]
                    else:
                        hi, dv = b, pz[b] - pz[a]
                    if dist == 0.0:
                        if dv == 0.0:
                            continue
                        nonground[hi] = True
                    elif dv / dist > tan_thr:
                        nonground[hi] = True
            weights, vals, sum_w, cnt = [], [], 0.0, 0
            for ii in range(n):
                a = sel[ii]
                if nonground[a]:
                    continue
                if d2[a] > 0:
                    w = 1.0 / math.sqrt(d2[a]) ** weight
                    weights.append(w); sum_w += w
                    vals.append(pz[a]); cnt += 1
                else:
                    weights = [1.0]; sum_w += 1.0
                    vals = [pz[a]]; cnt = 1
                    break
            if cnt > 0:
                zv = 0.0
                for s_ in range(cnt):
                    zv += (weights[s_] * vals[s_]) / sum_w
                dem[row * ncols + col] = zv
    want = pd.DataFrame(
        [{"row_id": r,
          "n_valid": sum(1 for cc in dem if cc // ncols == r),
          "row_sum": round(float(sum(v for cc, v in dem.items()
                                     if cc // ncols == r)), 6)}
         for r in range(nrows)])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_valid"].sum() > 0


def test_tan_form_agrees_with_reference_atan_form():
    """ADVICE r2 regression: the oracle-friendly ``dv/dist > tan(thr)``
    substitution must keep making the SAME marking decision as the
    reference's ``atan(dv/dist) > thr`` (LidarCanopyModel/BareEarthDEM
    pairwise slope test) on every pair the fixture actually compares —
    an independent witness of the original semantics, so the two forms
    can't silently drift apart (they are equivalent for thr ∈ (0, π/2)
    up to ulp-level boundary ties; this asserts no fixture pair sits on
    such a boundary)."""
    import math

    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.sources.las import (
        read_las, synth_las_path)

    df = read_las(synth_las_path("/root/testdata/sf0.001")).to_pandas()
    px = df["x"].to_numpy(); py = df["y"].to_numpy(); pz = df["z"].to_numpy()
    for max_slope in (15.0, 30.0, 45.0):
        thr = math.radians(max_slope)
        tan_thr = math.tan(thr)
        # all pairs within the canopy-model neighbourhood radius
        res = 250.0
        md = math.sqrt(2.0) * res / 2.0
        n = len(px)
        checked = 0
        for i in range(n - 1):
            dx = px[i + 1:] - px[i]
            dy = py[i + 1:] - py[i]
            dist = np.sqrt(dx * dx + dy * dy)
            sel = (dist <= 2 * md) & (dist > 0.0)
            dv = np.abs(pz[i + 1:] - pz[i])[sel]
            d = dist[sel]
            tan_mark = dv / d > tan_thr
            atan_mark = np.arctan(dv / d) > thr
            assert (tan_mark == atan_mark).all()
            checked += int(sel.sum())
        assert checked > 1000  # the fixture actually exercises the test


def test_sum_z_dyadic_tie_regression():
    """r1-ADVICE regression: ``sum_z`` is computed by summing the
    re-quantized INT64 z·1024 and dividing once — a float path that
    rounds each z to decimals first hits banker's-vs-half-away ties on
    dyadic values (x.5 exactly representable in binary). Pin the tie
    case: z = 2.5/1024-style half-integers where np.round (banker's)
    and floor(+0.5) (half-away-up) disagree per element, while the
    integer-sum path is exact regardless."""
    import numpy as np

    # values z·1024 = k + 0.5 exactly (dyadic ties)
    zq_exact = np.array([2, 3, 5, 7], dtype=np.int64)
    z = (zq_exact.astype(np.float64) + 0.0) / 1024.0
    # impl quantization: floor(z*1024 + 0.5) must invert exactly
    assert (np.floor(z * 1024.0 + 0.5).astype(np.int64) == zq_exact).all()
    total = float(int(np.floor(z * 1024.0 + 0.5).astype(np.int64).sum())
                  / 1024.0)
    assert total == float(zq_exact.sum()) / 1024.0
    # the tie itself: per-element 3-decimal rounding of 2.5 vs 3.5
    # (banker's rounds both to even — 2 and 4; half-up gives 3 and 4):
    ties = np.array([2.5, 3.5])
    assert list(np.round(ties)) == [2.0, 4.0]          # banker's
    assert list(np.floor(ties + 0.5)) == [3.0, 4.0]    # reference form
    # so a per-element np.round-based pipeline would shift the sum by 1
    assert np.round(ties).sum() != np.floor(ties + 0.5).sum()
