"""Vector overlay stages: Clip / Erase / Intersect (SURVEY.md §2.4).

Reference: VectorTools/src/plugins/Clip.java:275-296 (bbox prefilter) +
:455 (``clipGeom.intersection(jtsGeom)``), Difference.java:217-239,
Intersect.java:215-244 — per-feature geometry ops against a merged,
broadcast second layer.

Without a JTS equivalent in this environment the engine covers:
- axis-aligned box features vs a box clip layer EXACTLY (closed-form
  intersection; SQL-expressible, oracle-checked);
- arbitrary polygon features vs a CONVEX clip ring via Sutherland–
  Hodgman (core.geom.clip_convex) with shoelace areas, verified by
  geometric invariants in tests.
The general concave-vs-concave overlay is documented out of scope for
round 1 (tracked in SURVEY.md §7.5).

Distributed shape: the clip layer is tiny → broadcast (closure floats /
ray.put); features stream through a stateless ``map_batches``. Per-tile
area sums use the usual partial+final pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..core import geom
from .points import read_points

# the conformance clip window (Python-computed doubles; inlined into SQL)
CLIP_X0, CLIP_Y0 = 800.0, 600.0
CLIP_X1, CLIP_Y1 = 3100.0, 3400.0


def doc_squares(sf_dir: str) -> "rd.Dataset":
    """Feature layer: one axis-aligned square per document point, side
    derived from n_chars (half = 10 + n_chars mod 200). Columns
    (rec_id, xmin, ymin, xmax, ymax)."""
    pts = read_points(sf_dir)

    def to_box(batch):
        half = 10.0 + np.asarray(batch["z"], dtype=np.float64) % 200.0
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        return {"rec_id": np.asarray(batch["rec_id"], dtype=np.int64),
                "xmin": x - half, "ymin": y - half,
                "xmax": x + half, "ymax": y + half}

    return pts.map_batches(to_box, batch_format="numpy")


def clip_boxes(sf_dir: str, round_to: int = 6) -> "rd.Dataset":
    """Clip the square layer to the clip window; emit per-feature
    (rec_id, clip_area) for features with non-empty intersection."""
    boxes = doc_squares(sf_dir)

    def clip(batch):
        w = np.minimum(batch["xmax"], CLIP_X1) - np.maximum(batch["xmin"], CLIP_X0)
        h = np.minimum(batch["ymax"], CLIP_Y1) - np.maximum(batch["ymin"], CLIP_Y0)
        keep = (w > 0) & (h > 0)
        return {"rec_id": batch["rec_id"][keep],
                "clip_area": np.round(w[keep] * h[keep], round_to)}

    return boxes.map_batches(clip, batch_format="numpy")


def erase_boxes(sf_dir: str, round_to: int = 6) -> "rd.Dataset":
    """ErasePolygonFromRaster's vector analogue: area of each square
    OUTSIDE the clip window (original − intersection), zero rows dropped."""
    boxes = doc_squares(sf_dir)

    def erase(batch):
        area = ((batch["xmax"] - batch["xmin"])
                * (batch["ymax"] - batch["ymin"]))
        w = np.minimum(batch["xmax"], CLIP_X1) - np.maximum(batch["xmin"], CLIP_X0)
        h = np.minimum(batch["ymax"], CLIP_Y1) - np.maximum(batch["ymin"], CLIP_Y0)
        inter = np.maximum(w, 0.0) * np.maximum(h, 0.0)
        out = area - inter
        keep = out > 0
        return {"rec_id": batch["rec_id"][keep],
                "erase_area": np.round(out[keep], round_to)}

    return boxes.map_batches(erase, batch_format="numpy")


# ---------------------------------------------------------------------------
# General concave overlay (Intersect / Union / Difference / SymmetricDifference
# — VectorTools/src/plugins/{Intersect,Union,Difference,SymmetricDifference}
# .java:215-244) + Dissolve (Scripts/Dissolve.groovy:202), on the from-scratch
# boolean-area kernel in core.overlay.
#
# Conformance fixture: each document point becomes an L-SHAPED (concave,
# 6-vertex) polygon — square [xa−h,xa+h]² plus a foot [xa+h,xa+h+w2]×[ya−h,ya]
# — against a fixed concave L clip window. All coordinates are snapped to
# integers (exact in float64), and an L decomposes into two interior-disjoint
# rectangles, so DuckDB can mirror every op's area with pure box arithmetic /
# a slab-sweep in SQL while the Ray side runs the general trapezoid-sweep
# kernel on the actual concave rings. Distributed shape: the clip L is a
# module constant (broadcast-by-closure); features stream through a stateless
# ``map_batches``; Dissolve shuffles only 6 scalar columns per feature.
# ---------------------------------------------------------------------------

# clip L = S1 ∪ S2, interior-disjoint boxes sharing the y=2000 edge
CLIP_L_BOXES = ((800.0, 600.0, 3100.0, 2000.0),
                (800.0, 2000.0, 2000.0, 3400.0))
CLIP_L_RINGS = [np.array([[800.0, 600.0], [3100.0, 600.0], [3100.0, 2000.0],
                          [2000.0, 2000.0], [2000.0, 3400.0], [800.0, 3400.0]])]
CLIP_L_AREA = sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in CLIP_L_BOXES)

DISSOLVE_GROUPS = 499


def doc_lshapes(sf_dir: str) -> "rd.Dataset":
    """L-shape layer: (rec_id, xa, ya, h, w2) — all integer-valued doubles."""
    pts = read_points(sf_dir)

    def to_l(batch):
        z = np.asarray(batch["z"], dtype=np.float64)
        return {"rec_id": np.asarray(batch["rec_id"], dtype=np.int64),
                "xa": np.floor(np.asarray(batch["x"], dtype=np.float64)),
                "ya": np.floor(np.asarray(batch["y"], dtype=np.float64)),
                "h": 10.0 + z % 200.0,
                "w2": 20.0 + z % 97.0}

    return pts.map_batches(to_l, batch_format="numpy")


def _l_ring(xa: float, ya: float, h: float, w2: float) -> np.ndarray:
    return np.array([[xa - h, ya - h], [xa + h + w2, ya - h],
                     [xa + h + w2, ya], [xa + h, ya],
                     [xa + h, ya + h], [xa - h, ya + h]])


def overlay_areas(sf_dir: str, op: str, round_to: int = 6) -> "rd.Dataset":
    """Per-feature area of op(L_feature, L_clip) via the general kernel.

    ``intersection`` drops empty results (Clip.java drops features with
    empty intersections); the other ops keep every feature (their result
    is never empty — union/symdiff contain B; difference may be 0 when
    the feature lies inside the clip, kept as an explicit 0 row).
    """
    from ..core.overlay import boolean_area

    ls = doc_lshapes(sf_dir)
    col = f"{op.replace('symmetric_difference', 'symdiff')}_area"

    def per_batch(batch):
        n = len(batch["rec_id"])
        areas = np.empty(n, dtype=np.float64)
        for i in range(n):
            areas[i] = boolean_area(
                [_l_ring(batch["xa"][i], batch["ya"][i],
                         batch["h"][i], batch["w2"][i])],
                CLIP_L_RINGS, op)
        areas = np.round(areas, round_to)
        keep = areas > 0 if op == "intersection" else np.ones(n, dtype=bool)
        return {"rec_id": batch["rec_id"][keep], col: areas[keep]}

    return ls.map_batches(per_batch, batch_format="numpy")


def dissolve_union_area(sf_dir: str, n_groups: int = DISSOLVE_GROUPS,
                        round_to: int = 6) -> "rd.Dataset":
    """Dissolve: group features by attribute, exact area of each group's
    geometric union (Dissolve.groovy:202 buffer(0)-union per group;
    Fuse.java merges touching geometries the same way). groupby shuffles
    the 6-scalar L parameters only; each group unions locally via the
    combined-sweep kernel."""
    import pandas as pd

    from ..core.overlay import union_area_many

    ls = doc_lshapes(sf_dir)

    def add_gid(batch):
        batch["gid"] = batch["rec_id"] % n_groups
        return batch

    def per_group(df: "pd.DataFrame") -> "pd.DataFrame":
        polys = [[_l_ring(r.xa, r.ya, r.h, r.w2)]
                 for r in df.itertuples(index=False)]
        return pd.DataFrame({
            "gid": [int(df["gid"].iloc[0])],
            "union_area": [round(union_area_many(polys), round_to)]})

    return (ls.map_batches(add_gid, batch_format="numpy")
            .groupby("gid").map_groups(per_group, batch_format="pandas")
            .sort("gid"))


def clip_polygons_convex(polys: list[dict], clip_ring: np.ndarray,
                         round_to: int = 6) -> pd.DataFrame:
    """Sutherland–Hodgman clip of arbitrary polygon shells against a
    convex CCW ring; returns (zone_id, area, clip_area) per feature.
    Holes are subtracted (clip each ring, signed areas)."""
    rows = []
    for p in polys:
        poly: geom.Polygon = p["polygon"]
        total = 0.0
        clipped = 0.0
        for i, ring in enumerate(poly.rings):
            a = abs(geom.signed_area(np.asarray(ring)))
            cr = geom.clip_convex(np.asarray(ring), clip_ring)
            ca = abs(geom.signed_area(cr)) if len(cr) >= 3 else 0.0
            sign = 1.0 if i == 0 else -1.0
            total += sign * a
            clipped += sign * ca
        rows.append({"zone_id": p["zone_id"],
                     "area": round(total, round_to),
                     "clip_area": round(clipped, round_to)})
    return pd.DataFrame(rows)
