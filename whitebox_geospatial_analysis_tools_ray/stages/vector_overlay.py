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
from ..core.rng import EAST, NORTH, SOUTH, WEST
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
