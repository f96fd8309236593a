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
