"""XYZ-point gridding tools (RasterCreation):

- InterpolationNN (InterpolationNN.java:334-420): grid anchored at
  west = minX − res/2, north = maxY + res/2, rows/cols = ceil(extent/res)
  (:334-339); each cell takes its single nearest point's z when the
  SQUARED distance is strictly under the squared maxDist (:243-244,
  :396-400), else NoData.
- PointDensity (PointDensity.java:334-339, :380-416): same grid; each
  cell finds its 10 nearest points and outputs the AREA of their
  bounding box divided by 10 (inverse point density); a degenerate
  (zero-area) neighbour box → NoData.

Ray mapping: the point table is the broadcast small side (the
InterpolationIDW KdTree state, SURVEY §2.3); one task per output row
band evaluates all cells vectorized against the broadcast matrix. At
scale the identical semantics run as the neighbour-cell-duplication
kNN join (`stages/knn.py`) — these tools' site tables are tiny by
construction. Both queries have exact DuckDB oracles (ties in the
k-NN set are measure-zero for the hashed layer; the bbox reduction is
selection-order-free).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..core.features import site_points, site_points_sql_values

_A = 2654435761
_M = 4294967296
NODATA = -32768.0


def site_z(site_id: np.ndarray) -> np.ndarray:
    """Deterministic z per site. SQL mirror:
    ``((site_id * 7919 + 13) * 2654435761) % 4294967296 / 4294967296.0
    * 1000.0``"""
    s = (np.asarray(site_id, dtype=np.int64) * 7919 + 13)
    return ((s * _A) % _M).astype(np.float64) / float(_M) * 1000.0


def xyz_grid(resolution: float = 100.0, n_sites: int = 25):
    """(west, north, nrows, ncols) per InterpolationNN.java:334-339."""
    sites = site_points(n_sites)
    xs = np.array([s["sx"] for s in sites])
    ys = np.array([s["sy"] for s in sites])
    west = xs.min() - 0.5 * resolution
    north = ys.max() + 0.5 * resolution
    nrows = int(math.ceil((north - ys.min()) / resolution))
    ncols = int(math.ceil((xs.max() - west) / resolution))
    return west, north, nrows, ncols


def _grid_eval(fn, resolution: float, n_sites: int,
               band_rows: int = 16) -> pd.DataFrame:
    """Shared banded driver: fn(x, y, sx, sy, sid) → value grid."""
    west, north, nrows, ncols = xyz_grid(resolution, n_sites)
    sites = site_points(n_sites)
    ref = ray.put((np.array([s["sx"] for s in sites]),
                   np.array([s["sy"] for s in sites]),
                   np.array([s["site_id"] for s in sites],
                            dtype=np.int64)))
    n_bands = math.ceil(nrows / band_rows)
    half = resolution / 2.0

    def solve(batch) -> pd.DataFrame:
        sx, sy, sid = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
            else ref
        out = []
        for b in batch["id"]:
            r0 = int(b) * band_rows
            r1 = min(r0 + band_rows, nrows)
            y = ((north - half) - np.arange(r0, r1) * resolution)[:, None]
            x = (np.arange(ncols) * resolution + (west + half))[None, :]
            vals = fn(x, y, sx, sy, sid)
            ok = vals != NODATA
            out.append(pd.DataFrame({
                "row_id": np.arange(r0, r1),
                "n_valid": ok.sum(axis=1).astype(np.int64),
                "row_sum": np.round(np.where(ok, vals, 0.0).sum(axis=1),
                                    6)}))
        return pd.concat(out, ignore_index=True)

    return (rd.range(n_bands).map_batches(solve, batch_format="numpy")
            .to_pandas().sort_values("row_id").reset_index(drop=True))


def interpolation_nn(resolution: float = 100.0, n_sites: int = 25,
                     max_dist: float = 600.0) -> pd.DataFrame:
    md2 = max_dist * max_dist

    def fn(x, y, sx, sy, sid):
        d2 = (x[..., None] - sx) ** 2 + (y[..., None] - sy) ** 2
        best = d2.argmin(axis=-1)
        bd = np.take_along_axis(d2, best[..., None], axis=-1)[..., 0]
        z = site_z(sid)[best]
        return np.where(bd < md2, z, NODATA)

    return _grid_eval(fn, resolution, n_sites)


def interpolation_nn_sql(resolution: float = 100.0, n_sites: int = 25,
                         max_dist: float = 600.0) -> str:
    west, north, nrows, ncols = xyz_grid(resolution, n_sites)
    sv = site_points_sql_values(site_points(n_sites), alias="s0")
    md2 = max_dist * max_dist
    half = resolution / 2.0
    return f"""
WITH s AS (SELECT site_id, CAST(sx AS DOUBLE) sx, CAST(sy AS DOUBLE) sy,
    ((site_id * 7919 + 13) * 2654435761) % 4294967296
      / 4294967296.0 * 1000.0 AS z FROM {sv}),
cells AS (SELECT r, c,
    c * {resolution!r} + {west + half!r} AS x,
    {north - half!r} - r * {resolution!r} AS y
  FROM range(0, {nrows}) t(r) CROSS JOIN range(0, {ncols}) u(c)),
ranked AS (SELECT r, c,
    (x - sx) * (x - sx) + (y - sy) * (y - sy) AS d2, z,
    row_number() OVER (PARTITION BY r, c
      ORDER BY (x - sx) * (x - sx) + (y - sy) * (y - sy), site_id) AS rn
  FROM cells CROSS JOIN s),
res AS (SELECT r, CASE WHEN d2 < {md2!r} THEN z ELSE {NODATA} END AS f
        FROM ranked WHERE rn = 1)
SELECT r AS row_id,
       CAST(SUM(CASE WHEN f <> {NODATA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       round(SUM(CASE WHEN f <> {NODATA} THEN f ELSE 0.0 END), 6)
         AS row_sum
FROM res GROUP BY r ORDER BY row_id
"""


def point_density(resolution: float = 100.0, n_sites: int = 25,
                  k: int = 10) -> pd.DataFrame:
    def fn(x, y, sx, sy, sid):
        d2 = (x[..., None] - sx) ** 2 + (y[..., None] - sy) ** 2
        kk = min(k, len(sx))
        idx = np.argpartition(d2, kk - 1, axis=-1)[..., :kk]
        nx = sx[idx]
        ny = sy[idx]
        area = (nx.max(axis=-1) - nx.min(axis=-1)) \
            * (ny.max(axis=-1) - ny.min(axis=-1))
        return np.where(area > 0, area / kk, NODATA)

    return _grid_eval(fn, resolution, n_sites)


def point_density_sql(resolution: float = 100.0, n_sites: int = 25,
                      k: int = 10) -> str:
    west, north, nrows, ncols = xyz_grid(resolution, n_sites)
    sv = site_points_sql_values(site_points(n_sites), alias="s0")
    half = resolution / 2.0
    kk = min(k, n_sites)
    return f"""
WITH s AS (SELECT site_id, CAST(sx AS DOUBLE) sx, CAST(sy AS DOUBLE) sy
           FROM {sv}),
cells AS (SELECT r, c,
    c * {resolution!r} + {west + half!r} AS x,
    {north - half!r} - r * {resolution!r} AS y
  FROM range(0, {nrows}) t(r) CROSS JOIN range(0, {ncols}) u(c)),
ranked AS (SELECT r, c, sx, sy,
    row_number() OVER (PARTITION BY r, c
      ORDER BY (x - sx) * (x - sx) + (y - sy) * (y - sy), site_id) AS rn
  FROM cells CROSS JOIN s),
box AS (SELECT r, c,
    (MAX(sx) - MIN(sx)) * (MAX(sy) - MIN(sy)) AS area
  FROM ranked WHERE rn <= {kk} GROUP BY r, c),
res AS (SELECT r,
    CASE WHEN area > 0 THEN area / {kk} ELSE {NODATA} END AS f FROM box)
SELECT r AS row_id,
       CAST(SUM(CASE WHEN f <> {NODATA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       round(SUM(CASE WHEN f <> {NODATA} THEN f ELSE 0.0 END), 6)
         AS row_sum
FROM res GROUP BY r ORDER BY row_id
"""
