"""Geographic ↔ UTM coordinate transforms (vectorized, no pyproj).

Semantics follow the reference's LL2UTM/UTM2LL
(WhiteboxAPI/src/whitebox/georeference/LL2UTM.java:117-188 — the Dutch
(2010) transverse-Mercator series with k0=0.9996, 500 km false easting,
10,000 km false northing in the south; zone = 1 + floor((lon+180)/6);
M-series at :169-173) and Ellipsoid.java:39-50 (WGS-84 a=6378137,
b=6356752.314). CoordinateSystemTransformation.java (1,809 LoC) reduces
to applying this per cell/vertex — here a single vectorized numpy kernel
used inside map_batches, so a reprojection is one stateless MB stage.
"""

from __future__ import annotations

import numpy as np

A_WGS84 = 6378137.0
B_WGS84 = 6356752.314
K0 = 0.9996
_DRAD = np.pi / 180.0


def utm_zone(lon: np.ndarray) -> np.ndarray:
    return (1 + np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 6.0)
            ).astype(np.int64)


def ll_to_utm(lat, lon, zone=None, a: float = A_WGS84, b: float = B_WGS84):
    """Vectorized forward transform. Returns (easting, northing, zone).

    Matches LL2UTM.convertGeographicCoordinates term for term."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    if zone is None:
        zone = utm_zone(lon)
    else:
        zone = np.broadcast_to(np.asarray(zone, dtype=np.int64), lat.shape)
    # explicit products (not **) so the DuckDB oracle mirrors the exact
    # float64 operation order
    e = np.sqrt(1.0 - (b / a) * (b / a))
    esq = 1.0 - (b / a) * (b / a)
    e0sq = e * e / (1.0 - e * e)
    phi = lat * _DRAD
    zcm = 3.0 + 6.0 * (zone - 1) - 180.0
    sphi = e * np.sin(phi)
    N = a / np.sqrt(1.0 - sphi * sphi)
    tphi = np.tan(phi)
    T = tphi * tphi
    cphi = np.cos(phi)
    C = e0sq * cphi * cphi
    Aa = (lon - zcm) * _DRAD * cphi
    M = phi * (1 - esq * (1 / 4.0 + esq * (3 / 64.0 + 5 * esq / 256.0)))
    M = M - np.sin(2 * phi) * (esq * (3 / 8.0 + esq * (3 / 32.0 + 45 * esq / 1024.0)))
    M = M + np.sin(4 * phi) * (esq * esq * (15 / 256.0 + esq * 45 / 1024.0))
    M = M - np.sin(6 * phi) * (esq * esq * esq * (35 / 3072.0))
    M = M * a
    x = K0 * N * Aa * (1 + Aa * Aa * ((1 - T + C) / 6.0
        + Aa * Aa * (5 - 18 * T + T * T + 72 * C - 58 * e0sq) / 120.0))
    x = x + 500000.0
    y = K0 * (M + N * tphi * (Aa * Aa * (1 / 2.0
        + Aa * Aa * ((5 - T + 9 * C + 4 * C * C) / 24.0
        + Aa * Aa * (61 - 58 * T + T * T + 600 * C - 330 * e0sq) / 720.0))))
    y = np.where(lat < 0, 10000000.0 + y, y)
    return x, y, zone


def utm_to_ll(easting, northing, zone, southern=False,
              a: float = A_WGS84, b: float = B_WGS84):
    """Vectorized inverse (footpoint-latitude series, same source)."""
    x = np.asarray(easting, dtype=np.float64) - 500000.0
    y = np.asarray(northing, dtype=np.float64)
    if southern:
        y = y - 10000000.0
    zone = np.asarray(zone, dtype=np.float64)
    e = np.sqrt(1.0 - (b / a) ** 2)
    esq = 1.0 - (b / a) ** 2
    e0sq = e * e / (1.0 - e * e)
    M = y / K0
    mu = M / (a * (1 - esq * (1 / 4.0 + esq * (3 / 64.0 + 5 * esq / 256.0))))
    e1 = (1 - np.sqrt(1 - esq)) / (1 + np.sqrt(1 - esq))
    phi1 = mu + e1 * (3 / 2.0 - 27 * e1 * e1 / 32.0) * np.sin(2 * mu)
    phi1 = phi1 + e1 * e1 * (21 / 16.0 - 55 * e1 * e1 / 32.0) * np.sin(4 * mu)
    phi1 = phi1 + e1 ** 3 * (151 / 96.0) * np.sin(6 * mu)
    phi1 = phi1 + e1 ** 4 * (1097 / 512.0) * np.sin(8 * mu)
    C1 = e0sq * np.cos(phi1) ** 2
    T1 = np.tan(phi1) ** 2
    N1 = a / np.sqrt(1 - (e * np.sin(phi1)) ** 2)
    R1 = N1 * (1 - esq) / (1 - (e * np.sin(phi1)) ** 2)
    D = x / (N1 * K0)
    phi = D * D * (1 / 2.0 - D * D * (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1
                                      - 9 * e0sq) / 24.0)
    phi = phi + D ** 6 * (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1
                          - 252 * e0sq - 3 * C1 * C1) / 720.0
    phi = phi1 - (N1 * np.tan(phi1) / R1) * phi
    lon = D * (1 + D * D * ((-1 - 2 * T1 - C1) / 6.0
        + D * D * (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * e0sq
                   + 24 * T1 * T1) / 120.0)) / np.cos(phi1)
    zcm = 3.0 + 6.0 * (zone - 1) - 180.0
    return phi / _DRAD, zcm + lon / _DRAD


def project_points(ds, lat_col: str = "y", lon_col: str = "x",
                   zone: int | None = None):
    """Stateless MB stage: add easting/northing/zone columns."""
    import pandas as pd

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        e_, n_, z_ = ll_to_utm(batch[lat_col].to_numpy(),
                               batch[lon_col].to_numpy(), zone)
        batch = batch.copy()
        batch["easting"], batch["northing"], batch["utm_zone"] = e_, n_, z_
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def utm_project_query(sf_dir: str, round_to: int = 4):
    """CoordinateSystemTransformation as a query: geocode document points
    to (lat, lon) and project to UTM. Output
    (rec_id, utm_zone, easting, northing), values rounded."""
    import pandas as pd

    from ..stages.points import read_points

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        lat = batch["y"].to_numpy() * 0.04 - 80.0
        lon = batch["x"].to_numpy() * 0.09 - 180.0
        e_, n_, z_ = ll_to_utm(lat, lon)
        return pd.DataFrame({
            "rec_id": batch["rec_id"],
            "utm_zone": z_,
            "easting": np.round(e_, round_to),
            "northing": np.round(n_, round_to)})

    return read_points(sf_dir).map_batches(fn, batch_format="pandas")


def _d(v: float) -> str:
    """Exact DOUBLE literal for DuckDB (e-notation forces DOUBLE, not
    DECIMAL, so long multiplication chains keep float64 semantics)."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "e0"


def utm_project_sql(round_to: int = 4) -> str:
    """DuckDB mirror of utm_project_query — same float64 op order."""
    from ..core.rng import geocode_sql

    a, b = A_WGS84, B_WGS84
    e = float(np.sqrt(1.0 - (b / a) * (b / a)))
    esq = 1.0 - (b / a) * (b / a)
    e0sq = e * e / (1.0 - e * e)
    D, dr = _d, _d(_DRAD)
    # the M-series coefficients, folded in float64 exactly as numpy does
    m1 = D(1 - esq * (1 / 4.0 + esq * (3 / 64.0 + 5 * esq / 256.0)))
    m2 = D(esq * (3 / 8.0 + esq * (3 / 32.0 + 45 * esq / 1024.0)))
    m3 = D(esq * esq * (15 / 256.0 + esq * 45 / 1024.0))
    m4 = D(esq * esq * esq * (35 / 3072.0))
    xs, ys = geocode_sql("doc_id")
    return f"""
WITH pts AS (
  SELECT doc_id AS rec_id, ({xs}) AS x, ({ys}) AS y FROM documents),
ll AS (
  SELECT rec_id, y * {D(0.04)} - {D(80)} AS lat,
         x * {D(0.09)} - {D(180)} AS lon FROM pts),
t1 AS (
  SELECT rec_id, lat, lon,
         CAST(1 + floor((lon + {D(180)}) / {D(6)}) AS BIGINT) AS zone,
         lat * {dr} AS phi
  FROM ll),
t2 AS (
  SELECT *, {D(3)} + {D(6)} * (zone - 1) - {D(180)} AS zcm,
         {D(e)} * sin(phi) AS sphi, tan(phi) AS tphi, cos(phi) AS cphi
  FROM t1),
t3 AS (
  SELECT *,
         {D(a)} / sqrt({D(1)} - sphi * sphi) AS N,
         tphi * tphi AS T,
         {D(e0sq)} * cphi * cphi AS C,
         (lon - zcm) * {dr} * cphi AS Aa,
         (((phi * {m1}
            - sin({D(2)} * phi) * {m2})
            + sin({D(4)} * phi) * {m3})
            - sin({D(6)} * phi) * {m4}) * {D(a)} AS M
  FROM t2)
SELECT rec_id, zone AS utm_zone,
       round({D(K0)} * N * Aa * (1 + Aa * Aa * ((1 - T + C) / {D(6)}
             + Aa * Aa * (5 - 18 * T + T * T + 72 * C
                          - 58 * {D(e0sq)}) / {D(120)}))
             + {D(500000)}, {round_to}) AS easting,
       round(CASE WHEN lat < 0 THEN {D(10000000)} ELSE {D(0)} END
             + {D(K0)} * (M + N * tphi * (Aa * Aa * ({D(0.5)}
               + Aa * Aa * ((5 - T + 9 * C + 4 * C * C) / {D(24)}
               + Aa * Aa * (61 - 58 * T + T * T + 600 * C
                            - 330 * {D(e0sq)}) / {D(720)})))), {round_to}
             ) AS northing
FROM t3
"""
