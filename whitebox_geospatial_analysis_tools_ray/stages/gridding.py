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


# ---------------------------------------------------------------------------
# VectorAttributeGridding (WhiteboxGIS/resources/plugins/Scripts/
# VectorAttributeGridding.groovy:330-362): per output cell, the DISTINCT
# features with any vertex within searchDist — vertices at EXACTLY the
# cell centre are excluded (`result.distance > 0`, :349) — contribute
# their attribute once; output = their plain mean, NoData when no vertex
# is in range. Grid per :149-162 (bbox ± cellSize/2, ceil extents).
# The layer is the L-shape table (attribute = h); the whole-layer vertex
# KdTree (ShapeFile.getKdTree) becomes the broadcast vertex matrix.
# ---------------------------------------------------------------------------

def _l_vertex_table(sf_dir: str):
    """(rec_id, vx, vy) for all 6 L-ring vertices per feature, plus the
    attribute vector h — gathered once (the reference builds the same
    whole-layer KdTree up front)."""
    from .vector_overlay import doc_lshapes

    def verts(batch):
        rec = np.asarray(batch["rec_id"], dtype=np.int64)
        xa = np.asarray(batch["xa"]); ya = np.asarray(batch["ya"])
        h = np.asarray(batch["h"]); w2 = np.asarray(batch["w2"])
        vx = np.stack([xa - h, xa + h + w2, xa + h + w2, xa + h,
                       xa + h, xa - h])
        vy = np.stack([ya - h, ya - h, ya, ya, ya + h, ya + h])
        return {"rec_id": np.repeat(rec, 6),
                "vx": vx.T.ravel(), "vy": vy.T.ravel(),
                "h": np.repeat(h, 6)}

    df = (doc_lshapes(sf_dir).map_batches(verts, batch_format="numpy")
          .to_pandas())
    if len(df) == 0:        # empty table -> typed empty vertex table
        return pd.DataFrame({"rec_id": pd.Series([], dtype="int64"),
                             "vx": pd.Series([], dtype="float64"),
                             "vy": pd.Series([], dtype="float64"),
                             "h": pd.Series([], dtype="float64")})
    return df.sort_values(["rec_id"]).reset_index(drop=True)


def attribute_gridding(sf_dir: str, cell: float = 50.0,
                       search_dist: float = 300.0,
                       band_rows: int = 4) -> pd.DataFrame:
    # band_rows=4 (was 16): more bands = more parallelism AND a tighter
    # y-prefilter window; measured 8.8 s → 1.7 s at sf0.1 / 8 CPUs
    tab = _l_vertex_table(sf_dir)
    if len(tab) == 0:       # empty layer -> typed empty grid rows
        return pd.DataFrame({"row_id": pd.Series([], dtype="int64"),
                             "n_valid": pd.Series([], dtype="int64"),
                             "row_sum": pd.Series([], dtype="float64")})
    vx = tab["vx"].to_numpy()
    vy = tab["vy"].to_numpy()
    hval = tab["h"].to_numpy()[::6]  # one per feature
    nfeat = len(hval)
    north = vy.max() + cell / 2.0
    south = vy.min() - cell / 2.0
    west = vx.min() - cell / 2.0
    east = vx.max() + cell / 2.0
    nrows = int(math.ceil((north - south) / cell))
    ncols = int(math.ceil((east - west) / cell))
    r2 = search_dist * search_dist
    ref = ray.put((vx.reshape(nfeat, 6), vy.reshape(nfeat, 6), hval))
    n_bands = math.ceil(nrows / band_rows)

    def solve(batch) -> pd.DataFrame:
        fx0, fy0, hv0 = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        out = []
        for b in batch["id"]:
            r0 = int(b) * band_rows
            r1 = min(r0 + band_rows, nrows)
            y = (north - cell / 2.0 - np.arange(r0, r1) * cell)[:, None]
            x = (west + cell / 2.0 + np.arange(ncols) * cell)[None, :]
            # band y-window prefilter: a vertex with |dy| > search_dist
            # can never satisfy d2 <= r2 for any cell in this band, so
            # dropping features whose vertices ALL miss the window is
            # exact (they'd contribute feat=False zeros) and shrinks
            # the (rows × cols × feat × 6) tensor ~1/n_bands-fold
            ylo, yhi = float(y.min()) - search_dist, float(y.max()) + search_dist
            sel = ((fy0 >= ylo) & (fy0 <= yhi)).any(axis=1)
            fx, fy, hv = fx0[sel], fy0[sel], hv0[sel]
            d2 = ((x[..., None, None] - fx) ** 2
                  + (y[..., None, None] - fy) ** 2)
            inr = (d2 > 0) & (d2 <= r2)
            feat = inr.any(axis=-1)
            zero_only = (~feat) & ((d2 == 0) & (d2 <= r2)).any(axis=-1)
            if zero_only.any():  # the groovy would emit NaN here (0/0)
                raise ValueError("cell with only a coincident vertex "
                                 "in range — NaN case (unsupported)")
            cnt = feat.sum(axis=-1)
            tot = (feat * hv).sum(axis=-1)
            with np.errstate(invalid="ignore"):
                vals = np.where(cnt > 0, tot / np.maximum(cnt, 1), NODATA)
            ok = vals != NODATA
            out.append(pd.DataFrame({
                "row_id": np.arange(r0, r1),
                "n_valid": ok.sum(axis=1).astype(np.int64),
                "row_sum": np.round(np.where(ok, vals, 0.0).sum(axis=1),
                                    6)}))
        return pd.concat(out, ignore_index=True)

    return (rd.range(n_bands).map_batches(solve, batch_format="numpy")
            .to_pandas().sort_values("row_id").reset_index(drop=True))


def attribute_gridding_sql(cell: float = 50.0,
                           search_dist: float = 300.0) -> str:
    from ..core.features import POINTS_CTE
    r2 = search_dist * search_dist
    return f"""
WITH {POINTS_CTE},
l AS (SELECT rec_id, floor(x) AS xa, floor(y) AS ya,
             10.0 + (z % 200.0) AS h, 20.0 + (z % 97.0) AS w2 FROM pts),
e AS (SELECT * FROM range(0, 6) t(node_id)),
v AS (SELECT rec_id, h,
  CASE node_id WHEN 0 THEN xa - h WHEN 1 THEN xa + h + w2
               WHEN 2 THEN xa + h + w2 WHEN 3 THEN xa + h
               WHEN 4 THEN xa + h ELSE xa - h END AS vx,
  CASE node_id WHEN 0 THEN ya - h WHEN 1 THEN ya - h
               WHEN 2 THEN ya WHEN 3 THEN ya
               WHEN 4 THEN ya + h ELSE ya + h END AS vy
FROM l CROSS JOIN e),
ext AS (SELECT MAX(vy) + {cell / 2.0!r} AS north,
               MIN(vy) - {cell / 2.0!r} AS south,
               MIN(vx) - {cell / 2.0!r} AS west,
               MAX(vx) + {cell / 2.0!r} AS east FROM v),
dims AS (SELECT CAST(ceil((north - south) / {cell!r}) AS BIGINT) AS nr,
                CAST(ceil((east - west) / {cell!r}) AS BIGINT) AS nc
         FROM ext),
cells AS (SELECT r, c,
    (SELECT west FROM ext) + {cell / 2.0!r} + c * {cell!r} AS x,
    (SELECT north FROM ext) - {cell / 2.0!r} - r * {cell!r} AS y
  FROM range(0, 512) t(r) CROSS JOIN range(0, 512) u(c)
  WHERE r < (SELECT nr FROM dims) AND c < (SELECT nc FROM dims)),
near AS (SELECT r, c, rec_id, ANY_VALUE(h) AS h
  FROM cells JOIN v
    ON (x - vx) * (x - vx) + (y - vy) * (y - vy) > 0
   AND (x - vx) * (x - vx) + (y - vy) * (y - vy) <= {r2!r}
  GROUP BY r, c, rec_id),
agg AS (SELECT r, c, SUM(h) / COUNT(*) AS f FROM near GROUP BY r, c),
res AS (SELECT cells.r, COALESCE(agg.f, {NODATA}) AS f
        FROM cells LEFT JOIN agg ON agg.r = cells.r AND agg.c = cells.c)
SELECT r AS row_id,
       CAST(SUM(CASE WHEN f <> {NODATA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       round(SUM(CASE WHEN f <> {NODATA} THEN f ELSE 0.0 END), 6)
         AS row_sum
FROM res GROUP BY r ORDER BY row_id
"""


# ---------------------------------------------------------------------------
# MinimumInterpolation (WhiteboxGIS/resources/plugins/Scripts/
# MinimumInterpolation.groovy:310-336): per output cell, the MINIMUM z
# of all points within maxDist — note the groovy passes the RAW
# maxDist to KdTree.neighborsWithinRange (:319), which squares it
# internally (KdTree.java:355 ``range = range * range``), so the
# effective radius is maxDist with an INCLUSIVE cutoff (``dist <=
# range``, KdTree.java:366-380). Exactly one point in range → its
# value; none → NoData. Same banded broadcast plan as InterpolationNN;
# the LiDAR_{Min,Max}_interpolation tools are this reducer over the
# LAS source.
# ---------------------------------------------------------------------------


def minimum_interpolation(resolution: float = 100.0, n_sites: int = 25,
                          max_dist: float = 600.0) -> pd.DataFrame:
    md2 = max_dist * max_dist

    def fn(x, y, sx, sy, sid):
        d2 = (x[..., None] - sx) ** 2 + (y[..., None] - sy) ** 2
        inr = d2 <= md2
        z = site_z(sid)
        vals = np.where(inr, z, np.inf).min(axis=-1)
        return np.where(np.isfinite(vals), vals, NODATA)

    return _grid_eval(fn, resolution, n_sites)


def minimum_interpolation_sql(resolution: float = 100.0,
                              n_sites: int = 25,
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
agg AS (SELECT r, c, MIN(z) AS mz
  FROM cells JOIN s
    ON (x - sx) * (x - sx) + (y - sy) * (y - sy) <= {md2!r}
  GROUP BY r, c),
res AS (SELECT cells.r, COALESCE(agg.mz, {NODATA}) AS f
        FROM cells LEFT JOIN agg ON agg.r = cells.r AND agg.c = cells.c)
SELECT r AS row_id,
       CAST(SUM(CASE WHEN f <> {NODATA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       round(SUM(CASE WHEN f <> {NODATA} THEN f ELSE 0.0 END), 6)
         AS row_sum
FROM res GROUP BY r ORDER BY row_id
"""


# ---------------------------------------------------------------------------
# VectorFeatureDensity (WhiteboxGIS/resources/plugins/Scripts/
# VectorFeatureDensity.groovy:302-331): per output cell, the number of
# DISTINCT features with any vertex within searchDist — coincident
# vertices excluded (``result.distance > 0``, :326) — divided by the
# search circle's area in km² (``PI * d * d / 1e6``, :302). Cells with
# no vertex in range get density 0 (the groovy writes hs.size()/area
# unconditionally). Grid per :152-161 (bbox ± cellSize/2, ceil) — the
# VectorAttributeGridding plan with a count-distinct reducer.
# ---------------------------------------------------------------------------


def vector_feature_density(sf_dir: str, cell: float = 50.0,
                           search_dist: float = 300.0,
                           band_rows: int = 4) -> pd.DataFrame:
    # band_rows=4 + band y-prefilter: same plan/rationale as
    # attribute_gridding above (measured 5.0 s → 1.6 s at sf0.1)
    tab = _l_vertex_table(sf_dir)
    if len(tab) == 0:       # empty layer -> typed empty density rows
        return pd.DataFrame({"row_id": pd.Series([], dtype="int64"),
                             "n_nonzero": pd.Series([], dtype="int64"),
                             "row_sum": pd.Series([], dtype="float64")})
    vx = tab["vx"].to_numpy()
    vy = tab["vy"].to_numpy()
    nfeat = len(vx) // 6
    north = vy.max() + cell / 2.0
    south = vy.min() - cell / 2.0
    west = vx.min() - cell / 2.0
    east = vx.max() + cell / 2.0
    nrows = int(math.ceil((north - south) / cell))
    ncols = int(math.ceil((east - west) / cell))
    r2 = search_dist * search_dist
    area = math.pi * search_dist * search_dist / 1_000_000.0
    ref = ray.put((vx.reshape(nfeat, 6), vy.reshape(nfeat, 6)))
    n_bands = math.ceil(nrows / band_rows)

    def solve(batch) -> pd.DataFrame:
        fx0, fy0 = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        out = []
        for b in batch["id"]:
            r0 = int(b) * band_rows
            r1 = min(r0 + band_rows, nrows)
            y = (north - cell / 2.0 - np.arange(r0, r1) * cell)[:, None]
            x = (west + cell / 2.0 + np.arange(ncols) * cell)[None, :]
            ylo = float(y.min()) - search_dist
            yhi = float(y.max()) + search_dist
            sel = ((fy0 >= ylo) & (fy0 <= yhi)).any(axis=1)
            fx, fy = fx0[sel], fy0[sel]
            d2 = ((x[..., None, None] - fx) ** 2
                  + (y[..., None, None] - fy) ** 2)
            feat = ((d2 > 0) & (d2 <= r2)).any(axis=-1)
            dens = feat.sum(axis=-1) / area
            out.append(pd.DataFrame({
                "row_id": np.arange(r0, r1),
                "n_nonzero": (dens > 0).sum(axis=1).astype(np.int64),
                "row_sum": np.round(dens.sum(axis=1), 6)}))
        return pd.concat(out, ignore_index=True)

    return (rd.range(n_bands).map_batches(solve, batch_format="numpy")
            .to_pandas().sort_values("row_id").reset_index(drop=True))


def vector_feature_density_sql(cell: float = 50.0,
                               search_dist: float = 300.0) -> str:
    from ..core.features import POINTS_CTE
    r2 = search_dist * search_dist
    area = math.pi * search_dist * search_dist / 1_000_000.0
    return f"""
WITH {POINTS_CTE},
l AS (SELECT rec_id, floor(x) AS xa, floor(y) AS ya,
             10.0 + (z % 200.0) AS h, 20.0 + (z % 97.0) AS w2 FROM pts),
e AS (SELECT * FROM range(0, 6) t(node_id)),
v AS (SELECT rec_id,
  CASE node_id WHEN 0 THEN xa - h WHEN 1 THEN xa + h + w2
               WHEN 2 THEN xa + h + w2 WHEN 3 THEN xa + h
               WHEN 4 THEN xa + h ELSE xa - h END AS vx,
  CASE node_id WHEN 0 THEN ya - h WHEN 1 THEN ya - h
               WHEN 2 THEN ya WHEN 3 THEN ya
               WHEN 4 THEN ya + h ELSE ya + h END AS vy
FROM l CROSS JOIN e),
ext AS (SELECT MAX(vy) + {cell / 2.0!r} AS north,
               MIN(vy) - {cell / 2.0!r} AS south,
               MIN(vx) - {cell / 2.0!r} AS west,
               MAX(vx) + {cell / 2.0!r} AS east FROM v),
dims AS (SELECT CAST(ceil((north - south) / {cell!r}) AS BIGINT) AS nr,
                CAST(ceil((east - west) / {cell!r}) AS BIGINT) AS nc
         FROM ext),
cells AS (SELECT r, c,
    (SELECT west FROM ext) + {cell / 2.0!r} + c * {cell!r} AS x,
    (SELECT north FROM ext) - {cell / 2.0!r} - r * {cell!r} AS y
  FROM range(0, 512) t(r) CROSS JOIN range(0, 512) u(c)
  WHERE r < (SELECT nr FROM dims) AND c < (SELECT nc FROM dims)),
near AS (SELECT r, c, COUNT(DISTINCT rec_id) AS cnt
  FROM cells JOIN v
    ON (x - vx) * (x - vx) + (y - vy) * (y - vy) > 0
   AND (x - vx) * (x - vx) + (y - vy) * (y - vy) <= {r2!r}
  GROUP BY r, c),
res AS (SELECT cells.r, COALESCE(near.cnt, 0) / {area!r} AS dens
        FROM cells LEFT JOIN near ON near.r = cells.r AND near.c = cells.c)
SELECT r AS row_id,
       CAST(SUM(CASE WHEN dens > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonzero,
       round(SUM(dens), 6) AS row_sum
FROM res GROUP BY r ORDER BY row_id
"""


# ---------------------------------------------------------------------------
# CreateRectangularVectorGrid (WhiteboxGIS/resources/plugins/Scripts/
# CreateRectangularVectorGrid.groovy:142-171): grid cells snapped to an
# origin — startXGrid = floor((minX − originX)/widthX), endXGrid =
# ceil((maxX − originX)/widthX) (same for Y), one polygon per (row,
# col) with corners at originX + col·widthX etc.  Extent = the
# documents point layer (one distributed min/max reduce); cells
# generate as independent row-band tasks (nothing materializes
# driver-side).  CreateHexagonalVectorGrid = the same plan with the
# HexBinning axial geometry (`tile_hex`).  Exact SQL oracle.
# ---------------------------------------------------------------------------


def create_rect_grid(sf_dir: str, width_x: float = 250.0,
                     width_y: float = 250.0, origin_x: float = 13.0,
                     origin_y: float = 7.0) -> pd.DataFrame:
    from .points import extent_of, read_points

    from .points import extent_or_none

    ext = extent_or_none(read_points(sf_dir))
    if ext is None:
        # empty input → empty grid (the degenerate zero extent would
        # otherwise mint a spurious origin-anchored cell; empty-boundary
        # rule shared with the SQL mirror's extent-driven ranges)
        return pd.DataFrame({
            "grid_row": pd.Series([], dtype="int64"),
            "grid_col": pd.Series([], dtype="int64"),
            "minx": pd.Series([], dtype="float64"),
            "miny": pd.Series([], dtype="float64"),
            "maxx": pd.Series([], dtype="float64"),
            "maxy": pd.Series([], dtype="float64")})
    minx, miny, maxx, maxy = ext
    sx = int(math.floor((minx - origin_x) / width_x))
    ex = int(math.ceil((maxx - origin_x) / width_x))
    sy = int(math.floor((miny - origin_y) / width_y))
    ey = int(math.ceil((maxy - origin_y) / width_y))

    def gen(batch):
        out = {"grid_row": [], "grid_col": [], "minx": [], "miny": [],
               "maxx": [], "maxy": []}
        for rid in batch["id"]:
            row = sy + int(rid)
            for col in range(sx, ex):
                out["grid_row"].append(row)
                out["grid_col"].append(col)
                out["minx"].append(origin_x + col * width_x)
                out["miny"].append(origin_y + row * width_y)
                out["maxx"].append(origin_x + (col + 1) * width_x)
                out["maxy"].append(origin_y + (row + 1) * width_y)
        return pd.DataFrame(out)

    cells = (rd.range(ey - sy).map_batches(gen, batch_format="numpy")
             .to_pandas())
    return (cells.sort_values(["grid_row", "grid_col"])
            .reset_index(drop=True))


def create_rect_grid_sql(width_x: float = 250.0, width_y: float = 250.0,
                         origin_x: float = 13.0, origin_y: float = 7.0,
                         cap: int = 64) -> str:
    from ..core.features import POINTS_CTE
    return f"""
WITH {POINTS_CTE},
ext AS (SELECT MIN(x) AS minx, MIN(y) AS miny,
               MAX(x) AS maxx, MAX(y) AS maxy FROM pts),
g AS (SELECT CAST(floor((minx - {origin_x!r}) / {width_x!r}) AS BIGINT)
        AS sx,
      CAST(ceil((maxx - {origin_x!r}) / {width_x!r}) AS BIGINT) AS ex,
      CAST(floor((miny - {origin_y!r}) / {width_y!r}) AS BIGINT) AS sy,
      CAST(ceil((maxy - {origin_y!r}) / {width_y!r}) AS BIGINT) AS ey
      FROM ext)
SELECT sy + r.range AS grid_row, sx + c.range AS grid_col,
  {origin_x!r} + (sx + c.range) * {width_x!r} AS minx,
  {origin_y!r} + (sy + r.range) * {width_y!r} AS miny,
  {origin_x!r} + (sx + c.range + 1) * {width_x!r} AS maxx,
  {origin_y!r} + (sy + r.range + 1) * {width_y!r} AS maxy
FROM range({cap}) r CROSS JOIN range({cap}) c CROSS JOIN g
WHERE r.range < ey - sy AND c.range < ex - sx
ORDER BY grid_row, grid_col
"""
