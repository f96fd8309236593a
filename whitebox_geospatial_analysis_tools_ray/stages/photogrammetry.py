"""Photogrammetry family exemplar.

EstimateHeightsFromParallax (WhiteboxGIS/resources/plugins/Scripts/
EstimateHeightsFromParallax.groovy:216-295) is the family's
data-processing core and maps cleanly to Ray: broadcast constants
(principal / conjugate-principal points → average absolute parallax P
and the two flight-line angles), one stateless per-record map
(rotate both tie points into their flight-line frames,
p = |leftX − rightX|), one global mean, one final map
(h = G + (h_r − mean)). The FIRST record (file order) is the
reference: refP = p₀ and h₀ = 0 (:266-272) — an order dependence
carried as a broadcast scalar keyed by min rec_id.

The heavier members (SURFPixelMatching, TransformToEpipolarGeometry,
LocatePrincipalPoint) share this physical shape — per-image feature
extraction + candidate-pair shuffle — which the multimodal actor pool
and MinHash-LSH machinery already exercise (SURVEY §2.10 addendum).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# fixed camera geometry (both flight lines at the same bearing)
L_PP = (2000.0, 2000.0)
L_CPP = (2600.0, 2300.0)
R_PP = (2000.0, 2000.0)
R_CPP = (1400.0, 1700.0)


def _constants():
    lp = math.sqrt((L_PP[1] - L_CPP[1]) ** 2 + (L_PP[0] - L_CPP[0]) ** 2)
    rp = math.sqrt((R_PP[1] - R_CPP[1]) ** 2 + (R_PP[0] - R_CPP[0]) ** 2)
    P = (lp + rp) / 2.0
    la = -math.atan2(L_CPP[1] - L_PP[1], L_CPP[0] - L_PP[0])
    ra = -math.atan2(R_PP[1] - R_CPP[1], R_PP[0] - R_CPP[0])
    return P, la, ra


def _right_point(x, y, z):
    """Deterministic right-image tie point for a left point."""
    return x - 580.0 - z % 37.0, y + z % 11.0 - 5.0


def estimate_heights_from_parallax(sf_dir: str, H: float = 948.6,
                                   G: float = 300.0,
                                   round_to: int = 6) -> pd.DataFrame:
    from .points import read_points

    P, la, ra = _constants()
    cla, sla = math.cos(la), math.sin(la)
    cra, sra = math.cos(ra), math.sin(ra)
    pts = read_points(sf_dir)

    def parallax(batch):
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        z = np.asarray(batch["z"], dtype=np.float64)
        rx, ry = _right_point(x, y, z)
        lx = (x - L_PP[0]) * cla - (y - L_PP[1]) * sla
        rx_ = (rx - R_PP[0]) * cra - (ry - R_PP[1]) * sra
        return {"rec_id": np.asarray(batch["rec_id"], dtype=np.int64),
                "p": np.abs(lx - rx_)}

    pds = pts.map_batches(parallax, batch_format="numpy").to_pandas()
    pds = pds.sort_values("rec_id").reset_index(drop=True)
    ref_p = float(pds["p"].iloc[0])           # record 0 is the reference
    p = pds["p"].to_numpy()
    h = np.where(np.arange(len(p)) == 0, 0.0,
                 H * (p - ref_p) / (P + (p - ref_p)))
    avg = h.sum() / len(h)
    return pd.DataFrame({"rec_id": pds["rec_id"],
                         "height": np.round(G + (h - avg), round_to)})


def estimate_heights_sql(H: float = 948.6, G: float = 300.0) -> str:
    from ..core.features import POINTS_CTE

    P, la, ra = _constants()
    return f"""
WITH {POINTS_CTE},
par AS (SELECT rec_id,
    abs(((x - {L_PP[0]!r}) * cos({la!r}) - (y - {L_PP[1]!r}) * sin({la!r}))
        - (((x - 580.0 - (z % 37.0)) - {R_PP[0]!r}) * cos({ra!r})
           - ((y + (z % 11.0) - 5.0) - {R_PP[1]!r}) * sin({ra!r}))) AS p
  FROM pts),
ref AS (SELECT p AS refp FROM par ORDER BY rec_id LIMIT 1),
h AS (SELECT rec_id,
    CASE WHEN rec_id = (SELECT MIN(rec_id) FROM par) THEN 0.0
         ELSE {H!r} * (p - refp) / ({P!r} + (p - refp)) END AS hv
  FROM par CROSS JOIN ref),
m AS (SELECT SUM(hv) / COUNT(*) AS avg FROM h)
SELECT rec_id, round({G!r} + (hv - avg), 6) AS height
FROM h CROSS JOIN m
"""


# ---------------------------------------------------------------------------
# LocatePrincipalPoint (ImageProcessingTools/src/plugins/
# LocatePrincipalPoint.java:625-684, the 4-fiducial case): p2 = the
# mark FARTHEST from mark 0 (strict >, first max wins in scan order),
# the other two marks form the second diagonal, and the principal
# point is the determinant line intersection (:666-672). One photo =
# one group of 4 marks; thousands of photos = one stateless vectorized
# map (the per-record family) — the 8-mark branch adds the rotating
# MBB sweep the NNA query already exercises. Exact SQL oracle.
# ---------------------------------------------------------------------------


def _fiducials(x, y, z):
    """Deterministic 4 fiducial marks per photo: jittered rotated
    rectangle corners (k = 0..3: (−a,−b), (+a,−b), (+a,+b), (−a,+b))."""
    th = (z % 360.0) * (np.pi / 180.0)
    a = 30.0 + z % 20.0
    b = 15.0 + z % 10.0
    ct, st = np.cos(th), np.sin(th)
    cs = []
    signs = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
    for k, (sa, sb) in enumerate(signs):
        jx = (z + k * 7.0) % 5.0 - 2.0
        jy = (z + k * 11.0) % 7.0 - 3.0
        cs.append((x + sa * a * ct - sb * b * st + jx,
                   y + sa * a * st + sb * b * ct + jy))
    return cs


def locate_principal_point(sf_dir: str, round_to: int = 6) -> pd.DataFrame:
    from .points import read_points

    def fn(batch):
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        z = np.asarray(batch["z"], dtype=np.float64)
        c = _fiducials(x, y, z)
        (x0, y0), (x1, y1), (x2, y2), (x3, y3) = c
        d1 = np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
        d2 = np.sqrt((x2 - x0) ** 2 + (y2 - y0) ** 2)
        d3 = np.sqrt((x3 - x0) ** 2 + (y3 - y0) ** 2)
        # sequential strict-> scan: first max wins
        k = np.where((d3 > d1) & (d3 > d2), 3,
                     np.where(d2 > d1, 2, 1))
        p2x = np.choose(k - 1, [x1, x2, x3])
        p2y = np.choose(k - 1, [y1, y2, y3])
        p3x = np.choose(k - 1, [x2, x1, x1])
        p3y = np.choose(k - 1, [y2, y1, y1])
        p4x = np.choose(k - 1, [x3, x3, x2])
        p4y = np.choose(k - 1, [y3, y3, y2])
        den = (x0 - p2x) * (p3y - p4y) - (y0 - p2y) * (p3x - p4x)
        xn = (x0 * p2y - y0 * p2x) * (p3x - p4x) \
            - (x0 - p2x) * (p3x * p4y - p3y * p4x)
        yn = (x0 * p2y - y0 * p2x) * (p3y - p4y) \
            - (y0 - p2y) * (p3x * p4y - p3y * p4x)
        return {"photo_id": np.asarray(batch["rec_id"], dtype=np.int64),
                "pp_x": np.round(xn / den, round_to),
                "pp_y": np.round(yn / den, round_to)}

    return read_points(sf_dir).map_batches(fn, batch_format="numpy")


def locate_principal_point_sql() -> str:
    from ..core.features import POINTS_CTE

    def corner(k, sa, sb):
        return (f"x + {sa} * a * ct - {sb} * b * st"
                f" + ((z + {k} * 7.0) % 5.0 - 2.0) AS x{k}, "
                f"y + {sa} * a * st + {sb} * b * ct"
                f" + ((z + {k} * 11.0) % 7.0 - 3.0) AS y{k}")

    corners = ",\n  ".join([corner(0, "-1.0", "-1.0"),
                            corner(1, "1.0", "-1.0"),
                            corner(2, "1.0", "1.0"),
                            corner(3, "-1.0", "1.0")])
    return f"""
WITH {POINTS_CTE},
g AS (SELECT rec_id, x, y, z,
      (z % 360.0) * (pi() / 180.0) AS th,
      30.0 + (z % 20.0) AS a, 15.0 + (z % 10.0) AS b FROM pts),
t AS (SELECT rec_id, x, y, z, a, b,
      cos(th) AS ct, sin(th) AS st FROM g),
c AS (SELECT rec_id,
  {corners}
FROM t),
d AS (SELECT *,
  sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS d1,
  sqrt((x2 - x0) * (x2 - x0) + (y2 - y0) * (y2 - y0)) AS d2,
  sqrt((x3 - x0) * (x3 - x0) + (y3 - y0) * (y3 - y0)) AS d3
FROM c),
pick AS (SELECT *,
  CASE WHEN d3 > d1 AND d3 > d2 THEN 3
       WHEN d2 > d1 THEN 2 ELSE 1 END AS k FROM d),
lines AS (SELECT rec_id, x0, y0,
  CASE k WHEN 3 THEN x3 WHEN 2 THEN x2 ELSE x1 END AS p2x,
  CASE k WHEN 3 THEN y3 WHEN 2 THEN y2 ELSE y1 END AS p2y,
  CASE k WHEN 3 THEN x1 WHEN 2 THEN x1 ELSE x2 END AS p3x,
  CASE k WHEN 3 THEN y1 WHEN 2 THEN y1 ELSE y2 END AS p3y,
  CASE k WHEN 3 THEN x2 WHEN 2 THEN x3 ELSE x3 END AS p4x,
  CASE k WHEN 3 THEN y2 WHEN 2 THEN y3 ELSE y3 END AS p4y
FROM pick)
SELECT rec_id AS photo_id,
  round(((x0 * p2y - y0 * p2x) * (p3x - p4x)
         - (x0 - p2x) * (p3x * p4y - p3y * p4x))
        / ((x0 - p2x) * (p3y - p4y) - (y0 - p2y) * (p3x - p4x)), 6)
    AS pp_x,
  round(((x0 * p2y - y0 * p2x) * (p3y - p4y)
         - (y0 - p2y) * (p3x * p4y - p3y * p4x))
        / ((x0 - p2x) * (p3y - p4y) - (y0 - p2y) * (p3x - p4x)), 6)
    AS pp_y
FROM lines
"""


# ---------------------------------------------------------------------------
# ImageRectification (ImageProcessingTools/src/plugins/
# ImageRectificationPanel.java:449-528): first-order (affine) GCP fit —
# all four coordinate arrays are MIN-SHIFTED first (:465-470), the
# basis enumerates j=0..order, k=0..order−j → [1, y, x] (:476-481),
# each map axis is solved by least squares, and R² uses the literal
# population-variance formula varianceX = (SSx − sumX²/n)/n,
# SStotal = (n−1)·variance (:508-516). DOCUMENTED SUBSTITUTION: the
# panel's QR solver is replaced by Cramer on the normal equations (the
# trend_surface rule — deterministic, same solution); the impl and the
# SQL oracle share the identical cofactor expressions so the floats
# match bit-for-bit. The apply step (resample by the fitted transform)
# is the `raster_resample` gather plan.
# ---------------------------------------------------------------------------


def _cramer3(n, s1, s2, s11, s22, s12, t0, t1, t2):
    """Solve [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]·c = [t0,t1,t2] by the
    same cofactor expansion the SQL oracle writes."""
    det0 = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2))
    det_a = (t0 * (s11 * s22 - s12 * s12) - s1 * (t1 * s22 - s12 * t2)
             + s2 * (t1 * s12 - s11 * t2))
    det_b = (n * (t1 * s22 - t2 * s12) - t0 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * t2 - t1 * s2))
    det_c = (n * (s11 * t2 - s12 * t1) - s1 * (s1 * t2 - t1 * s2)
             + t0 * (s1 * s12 - s11 * s2))
    return det_a / det0, det_b / det0, det_c / det0


def image_rectification_fit(sf_dir: str, round_to: int = 6) -> pd.DataFrame:
    from .points import read_points

    pts = read_points(sf_dir)

    def extremes(batch):
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        z = np.asarray(batch["z"], dtype=np.float64)
        mx = 1.2 * x + 0.3 * y + 50.0 + (z % 7.0 - 3.0)
        my = -0.2 * x + 0.9 * y + 20.0 + (z % 5.0 - 2.0)
        return {"ixmin": [x.min()], "iymin": [y.min()],
                "mxmin": [mx.min()], "mymin": [my.min()]}

    e = pts.map_batches(extremes, batch_format="numpy").to_pandas()
    ixmin, iymin = float(e["ixmin"].min()), float(e["iymin"].min())
    mxmin, mymin = float(e["mxmin"].min()), float(e["mymin"].min())

    def moments(batch):
        x = np.asarray(batch["x"], dtype=np.float64) - ixmin
        y = np.asarray(batch["y"], dtype=np.float64) - iymin
        z = np.asarray(batch["z"], dtype=np.float64)
        x0 = np.asarray(batch["x"], dtype=np.float64)
        y0 = np.asarray(batch["y"], dtype=np.float64)
        X = 1.2 * x0 + 0.3 * y0 + 50.0 + (z % 7.0 - 3.0) - mxmin
        Y = -0.2 * x0 + 0.9 * y0 + 20.0 + (z % 5.0 - 2.0) - mymin
        return {"n": [float(len(x))],
                "sy": [y.sum()], "sx": [x.sum()],
                "syy": [(y * y).sum()], "sxx": [(x * x).sum()],
                "sxy": [(y * x).sum()],
                "sX": [X.sum()], "syX": [(y * X).sum()],
                "sxX": [(x * X).sum()], "sXX": [(X * X).sum()],
                "sY": [Y.sum()], "syY": [(y * Y).sum()],
                "sxY": [(x * Y).sum()], "sYY": [(Y * Y).sum()]}

    m = pts.map_batches(moments, batch_format="numpy").to_pandas().sum()
    n = m["n"]
    out = {}
    for tgt in ("X", "Y"):
        c0, cy, cx = _cramer3(n, m["sy"], m["sx"], m["syy"], m["sxx"],
                              m["sxy"], m[f"s{tgt}"], m[f"sy{tgt}"],
                              m[f"sx{tgt}"])
        ssresid = (m[f"s{tgt}{tgt}"]
                   - 2 * (c0 * m[f"s{tgt}"] + cy * m[f"sy{tgt}"]
                          + cx * m[f"sx{tgt}"])
                   + (c0 * c0 * n + cy * cy * m["syy"] + cx * cx * m["sxx"]
                      + 2 * c0 * cy * m["sy"] + 2 * c0 * cx * m["sx"]
                      + 2 * cy * cx * m["sxy"]))
        variance = (m[f"s{tgt}{tgt}"] - m[f"s{tgt}"] * m[f"s{tgt}"] / n) / n
        sstotal = (n - 1) * variance
        out[f"c0_{tgt.lower()}"] = round(float(c0), round_to)
        out[f"cy_{tgt.lower()}"] = round(float(cy), round_to)
        out[f"cx_{tgt.lower()}"] = round(float(cx), round_to)
        out[f"rsq_{tgt.lower()}"] = round(float(1.0 - ssresid / sstotal),
                                          round_to)
    return pd.DataFrame({k: [v] for k, v in out.items()})


def image_rectification_sql() -> str:
    from ..core.features import POINTS_CTE
    # NOTE: DuckDB identifiers are case-insensitive — map-side moments
    # use a t-prefix so they cannot collide with the image-side ones.
    return f"""
WITH {POINTS_CTE},
raw AS (SELECT x AS x0, y AS y0, z,
    1.2 * x + 0.3 * y + 50.0 + (z % 7.0 - 3.0) AS mx,
    -0.2 * x + 0.9 * y + 20.0 + (z % 5.0 - 2.0) AS my
  FROM pts),
mins AS (SELECT MIN(x0) AS ixmin, MIN(y0) AS iymin,
                MIN(mx) AS mxmin, MIN(my) AS mymin FROM raw),
sh AS (SELECT x0 - ixmin AS x, y0 - iymin AS y,
              mx - mxmin AS tx, my - mymin AS ty
       FROM raw CROSS JOIN mins),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(y) AS sy, SUM(x) AS sx, SUM(y*y) AS syy, SUM(x*x) AS sxx,
    SUM(y*x) AS sxy,
    SUM(tx) AS t0x, SUM(y*tx) AS t1x, SUM(x*tx) AS t2x,
    SUM(tx*tx) AS ttx,
    SUM(ty) AS t0y, SUM(y*ty) AS t1y, SUM(x*ty) AS t2y,
    SUM(ty*ty) AS tty
  FROM sh),
d AS (SELECT m.*,
  n*(syy*sxx - sxy*sxy) - sy*(sy*sxx - sxy*sx) + sx*(sy*sxy - syy*sx)
    AS d0,
  t0x*(syy*sxx - sxy*sxy) - sy*(t1x*sxx - sxy*t2x)
    + sx*(t1x*sxy - syy*t2x) AS da_x,
  n*(t1x*sxx - t2x*sxy) - t0x*(sy*sxx - sxy*sx) + sx*(sy*t2x - t1x*sx)
    AS db_x,
  n*(syy*t2x - sxy*t1x) - sy*(sy*t2x - t1x*sx) + t0x*(sy*sxy - syy*sx)
    AS dc_x,
  t0y*(syy*sxx - sxy*sxy) - sy*(t1y*sxx - sxy*t2y)
    + sx*(t1y*sxy - syy*t2y) AS da_y,
  n*(t1y*sxx - t2y*sxy) - t0y*(sy*sxx - sxy*sx) + sx*(sy*t2y - t1y*sx)
    AS db_y,
  n*(syy*t2y - sxy*t1y) - sy*(sy*t2y - t1y*sx) + t0y*(sy*sxy - syy*sx)
    AS dc_y
  FROM m),
c AS (SELECT d.*,
  da_x / d0 AS c0x, db_x / d0 AS cyx, dc_x / d0 AS cxx,
  da_y / d0 AS c0y, db_y / d0 AS cyy, dc_y / d0 AS cxy
  FROM d)
SELECT
  round(c0x, 6) AS c0_x, round(cyx, 6) AS cy_x, round(cxx, 6) AS cx_x,
  round(1.0 - (ttx - 2*(c0x*t0x + cyx*t1x + cxx*t2x)
        + (c0x*c0x*n + cyx*cyx*syy + cxx*cxx*sxx
           + 2*c0x*cyx*sy + 2*c0x*cxx*sx + 2*cyx*cxx*sxy))
        / ((n - 1) * ((ttx - t0x*t0x/n) / n)), 6) AS rsq_x,
  round(c0y, 6) AS c0_y, round(cyy, 6) AS cy_y, round(cxy, 6) AS cx_y,
  round(1.0 - (tty - 2*(c0y*t0y + cyy*t1y + cxy*t2y)
        + (c0y*c0y*n + cyy*cyy*syy + cxy*cxy*sxx
           + 2*c0y*cyy*sy + 2*c0y*cxy*sx + 2*cyy*cxy*sxy))
        / ((n - 1) * ((tty - t0y*t0y/n) / n)), 6) AS rsq_y
FROM c
"""
