"""Per-feature vector operators: shape metrics, simplify, hulls, nodes.

The GISTools / VectorTools per-feature families (SURVEY.md §2.2) as
stateless ``map_batches`` over WKB feature tables:

- shape metrics (Area.java, Perimeter.java, CompactnessRatio.java,
  ElongationRatio.java, PerimeterAreaRatio.java, Centroid.java …) —
  per-feature scalars appended as columns;
- SimplifyLineOrPolygon (Douglas–Peucker), MinimumConvexHull,
  MinimumBoundingBox, ExtractNodes (flat_map to vertices),
  LayerFootprint (global reduce → hull of everything).

All geometry is the pure-numpy core (no shapely in this environment).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core import geom


def _poly_of(wkb: bytes) -> geom.Polygon:
    kind, g = geom.parse_wkb(bytes(wkb))
    if kind == "polygon":
        return g
    if kind == "multipolygon":
        return geom.Polygon([r for p in g for r in p.rings])
    raise ValueError(f"not a polygon: {kind}")


def shape_metrics(ds):
    """Append area, perimeter, compactness, elongation, P/A ratio,
    centroid_x/y per polygon feature.

    - compactness ratio = perimeter / (2·sqrt(pi·area))
      (GISTools/src/plugins/CompactnessRatio.java)
    - elongation = 1 − (short axis / long axis) of the bbox
      (ElongationRatio.java approximation via axis-aligned bbox)
    """

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("area", "perimeter", "compactness",
                                "elongation", "pa_ratio",
                                "centroid_x", "centroid_y")}
        for wkb in batch["geometry"]:
            p = _poly_of(wkb)
            a = abs(geom.polygon_area(p))
            per = geom.perimeter(p)
            cx, cy = geom.centroid(p.rings[0])
            minx, miny, maxx, maxy = p.bbox
            w, h = maxx - minx, maxy - miny
            long_ax, short_ax = max(w, h), min(w, h)
            rows["area"].append(a)
            rows["perimeter"].append(per)
            rows["compactness"].append(per / (2 * np.sqrt(np.pi * a)) if a > 0 else 0.0)
            rows["elongation"].append(1.0 - short_ax / long_ax if long_ax > 0 else 0.0)
            rows["pa_ratio"].append(per / a if a > 0 else 0.0)
            rows["centroid_x"].append(cx)
            rows["centroid_y"].append(cy)
        for k, v in rows.items():
            batch[k] = v
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def simplify(ds, tol: float):
    """Douglas–Peucker per ring (SimplifyLineOrPolygon.java via JTS)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for wkb in batch["geometry"]:
            p = _poly_of(wkb)
            rings = [geom.douglas_peucker(r, tol) for r in p.rings]
            rings = [r for r in rings if len(r) >= 3]
            out.append(geom.wkb_polygon(geom.Polygon(rings)) if rings else None)
        batch["geometry"] = out
        return batch[batch["geometry"].notna()]

    return ds.map_batches(fn, batch_format="pandas")


def convex_hulls(ds):
    """MinimumConvexHull.java: per-feature hull polygon."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        nvert = []
        for wkb in batch["geometry"]:
            p = _poly_of(wkb)
            hull = geom.convex_hull(np.vstack(p.rings))
            out.append(geom.wkb_polygon(geom.Polygon([hull[::-1]])))  # CW shell
            nvert.append(len(hull))
        batch["hull"] = out
        batch["hull_nvert"] = nvert
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def extract_nodes(ds):
    """ExtractNodes (VectorTools): polygon/line vertices → point rows."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"rec_id": [], "node_idx": [], "x": [], "y": []}
        for rec_id, wkb in zip(batch["rec_id"], batch["geometry"]):
            p = _poly_of(wkb)
            pts = np.vstack(p.rings)
            n = len(pts)
            rows["rec_id"].extend([int(rec_id)] * n)
            rows["node_idx"].extend(range(n))
            rows["x"].extend(pts[:, 0])
            rows["y"].extend(pts[:, 1])
        return pd.DataFrame(rows)

    return ds.map_batches(fn, batch_format="pandas")


def layer_footprint(ds) -> geom.Polygon:
    """LayerFootprint.java: convex hull of the whole layer. Partial hulls
    per batch → tiny driver-side final hull (a global reduce)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pts = np.vstack([np.vstack(_poly_of(w).rings) for w in batch["geometry"]])
        hull = geom.convex_hull(pts)
        return pd.DataFrame({"x": hull[:, 0], "y": hull[:, 1]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    final = geom.convex_hull(parts[["x", "y"]].to_numpy())
    return geom.Polygon([final[::-1]])


def clip_to_rect(points_ds, xmin: float, ymin: float, xmax: float, ymax: float):
    """ClipPointsToRect — the Clip.java pattern for point layers:
    broadcast rectangle, vectorized filter."""

    def fn(batch):
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        m = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
        return {k: np.asarray(v)[m] for k, v in batch.items()}

    return points_ds.map_batches(fn, batch_format="numpy")


# ---------------------------------------------------------------------------
# VectorCleaning (VectorTools/src/plugins/VectorCleaning.java, 453 LoC):
# snap near-coincident vertices to a tolerance grid and drop the
# degenerate duplicates that result. One stateless map_batches; the
# snap uses a power-of-two tolerance so the cleaned coordinates (and
# any area derived from them) are exactly reproducible in SQL.
# ---------------------------------------------------------------------------

CLEAN_TOL = 0.5  # power of two → floor(v/tol + 0.5)·tol is dyadic-exact


def snap_coord(v: "np.ndarray", tol: float = CLEAN_TOL) -> "np.ndarray":
    import numpy as np
    return np.floor(np.asarray(v, dtype=np.float64) / tol + 0.5) * tol


def vector_cleaning(sf_dir: str, round_to: int = 6):
    """Clean the document-square layer: snap corners to the tolerance
    grid, emit (rec_id, snapped_area, degenerate) — degenerate = the
    snap collapsed the feature to zero width/height."""
    import numpy as np

    from .vector_overlay import doc_squares

    def clean(batch):
        x0 = snap_coord(batch["xmin"]); x1 = snap_coord(batch["xmax"])
        y0 = snap_coord(batch["ymin"]); y1 = snap_coord(batch["ymax"])
        area = (x1 - x0) * (y1 - y0)
        return {"rec_id": batch["rec_id"],
                "snapped_area": np.round(area, round_to),
                "degenerate": (area <= 0).astype(np.int64)}

    return doc_squares(sf_dir).map_batches(clean, batch_format="numpy")


def vector_cleaning_sql() -> str:
    from ..core.features import POINTS_CTE
    from ..oracle import _doc_squares_cte
    inv = float(1.0 / CLEAN_TOL)
    def snap(col):
        return f"floor({col} * {inv!r} + 0.5) / {inv!r}"
    return f"""
WITH {POINTS_CTE},
{_doc_squares_cte()},
s AS (SELECT rec_id,
             {snap('xmin')} AS x0, {snap('xmax')} AS x1,
             {snap('ymin')} AS y0, {snap('ymax')} AS y1
      FROM boxes)
SELECT rec_id, round((x1 - x0) * (y1 - y0), 6) AS snapped_area,
       CASE WHEN (x1 - x0) * (y1 - y0) <= 0 THEN 1 ELSE 0 END AS degenerate
FROM s
"""
