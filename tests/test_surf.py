"""Literal mirrors for the SURF detector (jopensurf replication).

Each mirror is a pure sequential loop transliteration of the Java and
must agree with the vectorized kernels EXACTLY (same float32/float64
operation order) — plus shift-recovery and determinism checks on the
full distributed pipeline.
"""

import math

import numpy as np

from whitebox_geospatial_analysis_tools_ray.core.rng import NODATA
from whitebox_geospatial_analysis_tools_ray.stages import surf

IMG = surf.blob_image(96, 96)


def _integral_mirror(values, image_min=0.0, image_range=1000.0):
    h, w = values.shape
    out = np.zeros((h, w), dtype=np.float32)
    for y in range(h):
        s = np.float32(0.0)
        for x in range(w):
            v = values[y, x]
            inten = 0.0 if v == NODATA else (v - image_min) / image_range
            s = np.float32(s + np.float32(inten))
            out[y, x] = s if y == 0 else np.float32(s + out[y - 1, x])
    return out


def _box_mirror(ii, row, col, rows, cols):
    h, w = ii.shape
    r1 = min(row, h) - 1
    c1 = min(col, w) - 1
    r2 = min(row + rows, h) - 1
    c2 = min(col + cols, w) - 1
    A = ii[r1, c1] if (r1 >= 0 and c1 >= 0) else np.float32(0)
    B = ii[r1, c2] if (r1 >= 0 and c2 >= 0) else np.float32(0)
    C = ii[r2, c1] if (r2 >= 0 and c1 >= 0) else np.float32(0)
    D = ii[r2, c2] if (r2 >= 0 and c2 >= 0) else np.float32(0)
    return max(np.float32(0), np.float32(np.float32(np.float32(A - B) - C)
                                         + D))


def test_integral_image_mirror():
    got = surf.integral_image(IMG)
    want = _integral_mirror(IMG)
    assert np.array_equal(got, want)


def test_response_layer_mirror():
    ii = surf.integral_image(IMG)
    for spec in [(48, 48, 2, 9), (48, 48, 2, 15)]:
        width, height, step, filt = spec
        resp, lap = surf.build_response_layer(ii, *spec)
        b = (filt - 1) // 2
        lobe = filt // 3
        inv_area = 1.0 / (filt * filt)
        for ar in range(0, height, 7):          # sampled cells
            for ac in range(0, width, 7):
                r = ar * step
                c = ac * step
                Dxx = _box_mirror(ii, r - lobe + 1, c - b,
                                  2 * lobe - 1, filt) \
                    - _box_mirror(ii, r - lobe + 1, c - lobe // 2,
                                  2 * lobe - 1, lobe) * np.float32(3)
                Dyy = _box_mirror(ii, r - b, c - lobe + 1,
                                  filt, 2 * lobe - 1) \
                    - _box_mirror(ii, r - lobe // 2, c - lobe + 1,
                                  lobe, 2 * lobe - 1) * np.float32(3)
                Dxy = np.float32(
                    np.float32(np.float32(
                        _box_mirror(ii, r - lobe, c + 1, lobe, lobe)
                        + _box_mirror(ii, r + 1, c - lobe, lobe, lobe))
                        - _box_mirror(ii, r - lobe, c - lobe, lobe, lobe))
                    - _box_mirror(ii, r + 1, c + 1, lobe, lobe))
                dxx = float(Dxx) * inv_area
                dyy = float(Dyy) * inv_area
                dxy = float(Dxy) * inv_area
                want = dxx * dyy - float(np.float32(0.81)) * dxy * dxy
                assert resp[ar, ac] == want
                assert lap[ar, ac] == (1 if dxx + dyy >= 0 else 0)


def test_detector_mirror_small():
    """Pure-loop NMS + interpolation replay == the vectorized detector
    on the 96×96 image (all octave triples)."""
    ii = surf.integral_image(IMG)
    got = surf.detect_points(ii)

    specs = surf.layer_specs(*ii.shape)
    layers = [surf.build_response_layer(ii, *s) for s in specs]
    fm = surf.filter_map()
    thr = float(np.float32(surf.THRESHOLD))
    want = []
    for o in range(surf.OCTAVES):
        for i in range(2):
            bs, ms, ts = specs[fm[o][i]], specs[fm[o][i + 1]], \
                specs[fm[o][i + 2]]
            br, mr, tr = (layers[fm[o][i]][0], layers[fm[o][i + 1]][0],
                          layers[fm[o][i + 2]][0])
            mlap = layers[fm[o][i + 1]][1]
            tw, th, tstep, tfilt = ts
            msc, bsc = ms[0] // tw, bs[0] // tw
            border = (tfilt + 1) // (2 * tstep)
            for r0 in range(th):
                for c0 in range(tw):
                    if (r0 <= border or r0 >= th - border
                            or c0 <= border or c0 >= tw - border):
                        continue
                    cand = mr[r0 * msc, c0 * msc]
                    if abs(cand) < thr:
                        continue
                    ok = True
                    for rr in (-1, 0, 1):
                        for cc in (-1, 0, 1):
                            tv = tr[r0 + rr, c0 + cc]
                            mv = mr[(r0 + rr) * msc, (c0 + cc) * msc]
                            bv = br[(r0 + rr) * bsc, (c0 + cc) * bsc]
                            if cand > 0:
                                if tv >= cand or ((rr != 0 or cc != 0)
                                                  and mv >= cand) \
                                        or bv >= cand:
                                    ok = False
                            else:
                                if tv <= cand or ((rr != 0 or cc != 0)
                                                  and mv <= cand) \
                                        or bv <= cand:
                                    ok = False
                    if not ok:
                        continue

                    def m_at(r, c):
                        return mr[r * msc, c * msc]

                    def b_at(r, c):
                        return br[r * bsc, c * bsc]

                    v = m_at(r0, c0)
                    d = np.array([
                        (m_at(r0, c0 + 1) - m_at(r0, c0 - 1)) / 2.0,
                        (m_at(r0 + 1, c0) - m_at(r0 - 1, c0)) / 2.0,
                        (tr[r0, c0] - b_at(r0, c0)) / 2.0])
                    H = np.array([
                        [m_at(r0, c0 + 1) + m_at(r0, c0 - 1) - 2 * v,
                         (m_at(r0 + 1, c0 + 1) - m_at(r0 + 1, c0 - 1)
                          - m_at(r0 - 1, c0 + 1)
                          + m_at(r0 - 1, c0 - 1)) / 4.0,
                         (tr[r0, c0 + 1] - tr[r0, c0 - 1]
                          - b_at(r0, c0 + 1) + b_at(r0, c0 - 1)) / 4.0],
                        [0, m_at(r0 + 1, c0) + m_at(r0 - 1, c0) - 2 * v,
                         (tr[r0 + 1, c0] - tr[r0 - 1, c0]
                          - b_at(r0 + 1, c0) + b_at(r0 - 1, c0)) / 4.0],
                        [0, 0, tr[r0, c0] + b_at(r0, c0) - 2 * v]])
                    H[1, 0] = H[0, 1]
                    H[2, 0] = H[0, 2]
                    H[2, 1] = H[1, 2]
                    X = np.linalg.solve(H, d)
                    xc, xr, xi = -X[0], -X[1], -X[2]
                    if abs(xi) < 0.5 and abs(xr) < 0.5 and abs(xc) < 0.5:
                        fstep = ms[3] - bs[3]
                        want.append((
                            float(np.float32((c0 + xc) * tstep)),
                            float(np.float32((r0 + xr) * tstep)),
                            float(np.float32(float(np.float32(0.1333))
                                             * (ms[3] + xi * fstep))),
                            int(mlap[r0 * msc, c0 * msc])))
    assert got == want
    assert len(got) > 3


def test_orientation_descriptor_mirror():
    """Scalar replay of getOrientation/getMDescriptor == the
    vectorized versions for the first detected points."""
    ii = surf.integral_image(IMG)
    pts = surf.detect_points(ii)[:3]
    for (x, y, scale, lap) in pts:
        ori = surf.orientation_of(ii, x, y, scale)
        # literal scalar replay
        s = int(math.floor(scale + 0.5))
        r = int(math.floor(y + 0.5))
        c = int(math.floor(x + 0.5))
        hx, hy, ang = [], [], []
        for i in range(-6, 7):
            for j in range(-6, 7):
                if i * i + j * j < 36:
                    g = surf.GAUSS25[abs(i), abs(j)]
                    xr = g * float(surf._haar_x(
                        ii, np.array([r + j * s]), np.array([c + i * s]),
                        4 * s)[0])
                    yr = g * float(surf._haar_y(
                        ii, np.array([r + j * s]), np.array([c + i * s]),
                        4 * s)[0])
                    hx.append(xr)
                    hy.append(yr)
                    ang.append(float(surf._get_angle(xr, yr)))
        best = np.float32(0.0)
        want_ori = 0.0
        ang1 = np.float32(0.0)
        while float(ang1) < 2 * math.pi:
            a1 = float(ang1)
            a2 = a1 - 5.0 * math.pi / 3.0 \
                if a1 + math.pi / 3.0 > 2 * math.pi \
                else a1 + math.pi / 3.0
            a2 = float(np.float32(a2))
            sx = np.float32(0.0)
            sy = np.float32(0.0)
            for k in range(len(ang)):
                a = float(np.float32(ang[k]))
                take = (a1 < a2 and a1 < a < a2) or \
                    (a2 < a1 and ((0 < a < a2)
                                  or (a1 < a < 2 * math.pi)))
                if take:
                    sx = np.float32(sx + np.float32(hx[k]))
                    sy = np.float32(sy + np.float32(hy[k]))
            mag = np.float32(np.float32(sx * sx) + np.float32(sy * sy))
            if mag > best:
                best = mag
                # Surf.java:243 narrows to float32 before storage
                want_ori = float(np.float32(
                    surf._get_angle(float(sx), float(sy))))
            ang1 = np.float32(ang1 + np.float32(0.15))
        assert ori == want_ori

        desc = surf.descriptor_of(ii, x, y, scale, ori)
        assert desc.shape == (64,)
        n = float((desc.astype(np.float64) ** 2).sum())
        assert abs(n - 1.0) < 1e-5           # unit length (float32 slots)


def test_pipeline_recovers_shift(ray_session):
    m = surf.surf_pixel_matching("/root/testdata/sf0.001")
    assert len(m) > 20
    dx = (m["rx"] - m["lx"]).to_numpy()
    dy = (m["ry"] - m["ly"]).to_numpy()
    good = (np.abs(dx - surf.SHIFT_C) < 0.75) & \
        (np.abs(dy - surf.SHIFT_R) < 0.75)
    assert good.mean() > 0.9                  # border points may mismatch
    # determinism
    m2 = surf.surf_pixel_matching("/root/testdata/sf0.001")
    assert m.equals(m2)


def test_descriptor_exact_scalar_mirror():
    """Scalar loop replay of getMDescriptor:251-345 == the vectorized
    descriptor bit-for-bit (sequential double accumulation order)."""
    ii = surf.integral_image(IMG)
    x, y, scale, lap = surf.detect_points(ii)[0]
    ori = surf.orientation_of(ii, x, y, scale)
    got = surf.descriptor_of(ii, x, y, scale, ori)

    xr = int(math.floor(x + 0.5))
    yr = int(math.floor(y + 0.5))
    co = math.cos(ori)
    si = math.sin(ori)
    desc = np.zeros(64, dtype=np.float32)
    length = 0.0
    count = 0
    cx = -0.5
    i = -8
    while i < 12:
        j = -8
        i = i - 4
        cx += 1.0
        cy = -0.5
        while j < 12:
            cy += 1.0
            j = j - 4
            ix = i + 5
            jx = j + 5
            xs = math.floor(xr + (-jx * scale * si + ix * scale * co)
                            + 0.5)
            ys = math.floor(yr + (jx * scale * co + ix * scale * si)
                            + 0.5)
            dx = dy = mdx = mdy = 0.0
            # 2.5F widens to double against the double-declared scale
            sig = 2.5 * float(scale)
            hsize = int(2 * math.floor(scale + 0.5))
            for k in range(i, i + 9):
                for l in range(j, j + 9):
                    sx = int(math.floor(xr + (-l * scale * si
                                              + k * scale * co) + 0.5))
                    sy = int(math.floor(yr + (l * scale * co
                                              + k * scale * si) + 0.5))
                    g1 = (1.0 / (2.0 * math.pi * sig * sig)) \
                        * math.exp(-((xs - sx) ** 2 + (ys - sy) ** 2)
                                   / (2.0 * sig * sig))
                    rx = float(surf._haar_x(ii, np.array([sy]),
                                            np.array([sx]), hsize)[0])
                    ry = float(surf._haar_y(ii, np.array([sy]),
                                            np.array([sx]), hsize)[0])
                    rrx = g1 * (-rx * si + ry * co)
                    rry = g1 * (rx * co + ry * si)
                    dx += rrx
                    dy += rry
                    mdx += abs(rrx)
                    mdy += abs(rry)
            g2 = (1.0 / (2.0 * math.pi * 1.5 * 1.5)) \
                * math.exp(-((cx - 2.0) ** 2 + (cy - 2.0) ** 2)
                           / (2.0 * 1.5 * 1.5))
            desc[count] = np.float32(dx * g2)
            desc[count + 1] = np.float32(dy * g2)
            desc[count + 2] = np.float32(mdx * g2)
            desc[count + 3] = np.float32(mdy * g2)
            count += 4
            length += (dx * dx + dy * dy + mdx * mdx + mdy * mdy) \
                * (g2 * g2)
            j += 9
        i += 9
    length = math.sqrt(length)
    want = (desc.astype(np.float64) / length).astype(np.float32)
    assert np.array_equal(got, want)
