"""Spatial joins: broadcast PIP join + groupby-shuffle cell-partitioned join.

Reference semantics:
- predicate set & semi/anti behaviour —
  ``VectorTools/src/plugins/IsolateVectorFeaturesByLocation.java:240-260,360-552``
- even-odd PIP fill — ``ConversionTools/src/plugins/VectorPolygonsToRaster.java:370-446``
- broadcast clip-geometry pattern — ``VectorTools/src/plugins/Clip.java:253-269``

Two physical strategies (SURVEY.md §7.3/7.4):

1. **Broadcast** (small zone side): the zone table is ``ray.put`` once;
   a callable-class actor pool builds a coarse grid index over zone
   bboxes ONCE PER ACTOR in ``__init__`` and streams point batches
   through vectorized bbox prefilter + exact even-odd PIP refine.
2. **Cell-partitioned shuffle** (both sides large): both sides get an
   H3/S2-style cell key (RectGrid tile id); zones are duplicated into
   every cell their bbox overlaps; ``groupby(cell).map_groups`` runs the
   same refine per cell. Hot cells can be salted (``salt`` param splits
   a cell's points into k sub-groups, replicating the zone side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..core.geom import Polygon, points_in_polygon, points_in_triangle
from ..core.rng import EAST, NORTH, SOUTH, WEST
from ..core.tiles import RectGrid


class ZoneGridIndex:
    """Coarse uniform-grid index over zone bounding boxes (pure numpy,
    the environment's stand-in for an STRtree). Built once per actor."""

    def __init__(self, zones: list[dict], ncells: int = 16):
        self.zones = zones
        self.ncells = ncells
        self.w = (EAST - WEST) / ncells
        self.h = (NORTH - SOUTH) / ncells
        self.cell_zones: dict[int, list[int]] = {}
        for zi, z in enumerate(zones):
            bb = z.get("bbox") or (z["xmin"], z["ymin"], z["xmax"], z["ymax"])
            c0 = max(0, int((bb[0] - WEST) // self.w))
            c1 = min(ncells - 1, int((bb[2] - WEST) // self.w))
            r0 = max(0, int((bb[1] - SOUTH) // self.h))
            r1 = min(ncells - 1, int((bb[3] - SOUTH) // self.h))
            for r in range(r0, r1 + 1):
                for c in range(c0, c1 + 1):
                    self.cell_zones.setdefault(r * ncells + c, []).append(zi)

    def candidates(self, x: np.ndarray, y: np.ndarray) -> dict[int, np.ndarray]:
        """zone index → boolean mask of points whose grid cell holds the zone."""
        col = np.clip(((x - WEST) // self.w).astype(np.int64), 0, self.ncells - 1)
        row = np.clip(((y - SOUTH) // self.h).astype(np.int64), 0, self.ncells - 1)
        cell = row * self.ncells + col
        out: dict[int, list] = {}
        for cid in np.unique(cell):
            for zi in self.cell_zones.get(int(cid), ()):
                out.setdefault(zi, []).append(cell == cid)
        return {zi: np.logical_or.reduce(masks) for zi, masks in out.items()}


def _zone_hit_mask(z: dict, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Exact predicate for one zone over a point batch."""
    if "polygon" in z:
        return points_in_polygon(x, y, z["polygon"])
    if "ax" in z:
        return points_in_triangle(x, y, z["ax"], z["ay"], z["bx"], z["by"],
                                  z["cx"], z["cy"])
    return ((x >= z["xmin"]) & (x <= z["xmax"]) &
            (y >= z["ymin"]) & (y <= z["ymax"]))


def _zone_bbox(z: dict) -> tuple:
    if "polygon" in z:
        return z["polygon"].bbox
    if "ax" in z:
        xs = (z["ax"], z["bx"], z["cx"])
        ys = (z["ay"], z["by"], z["cy"])
        return (min(xs), min(ys), max(xs), max(ys))
    return (z["xmin"], z["ymin"], z["xmax"], z["ymax"])


class BroadcastPIPJoin:
    """Actor-pool stage: inner / semi / anti spatial join of streamed
    points against a broadcast zone table.

    ``__init__`` runs once per actor: fetch zones from the object store
    and build the grid index (mirrors Clip.java:253-269's one-time
    merged clip geometry).
    """

    def __init__(self, zones_ref, mode: str = "inner"):
        zones = ray.get(zones_ref) if isinstance(zones_ref, ray.ObjectRef) else zones_ref
        for z in zones:
            z["bbox"] = _zone_bbox(z)
        self.zones = zones
        self.index = ZoneGridIndex(zones)
        self.mode = mode

    def __call__(self, batch: dict) -> pd.DataFrame:
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        rec = np.asarray(batch["rec_id"], dtype=np.int64)
        cand = self.index.candidates(x, y)
        if self.mode == "inner":
            recs, zids = [], []
            for zi, mask in cand.items():
                z = self.zones[zi]
                bb = z["bbox"]
                m = mask & (x >= bb[0]) & (x <= bb[2]) & (y >= bb[1]) & (y <= bb[3])
                if not m.any():
                    continue
                hit = np.zeros(len(x), dtype=bool)
                hit[m] = _zone_hit_mask(z, x[m], y[m])
                if hit.any():
                    recs.append(rec[hit])
                    zids.append(np.full(int(hit.sum()), z["zone_id"], dtype=np.int64))
            if not recs:
                return pd.DataFrame({"rec_id": np.array([], dtype=np.int64),
                                     "zone_id": np.array([], dtype=np.int64)})
            return pd.DataFrame({"rec_id": np.concatenate(recs),
                                 "zone_id": np.concatenate(zids)})
        # semi / anti: does each point hit ANY zone?
        any_hit = np.zeros(len(x), dtype=bool)
        for zi, mask in cand.items():
            z = self.zones[zi]
            m = mask & ~any_hit
            if not m.any():
                continue
            hit = np.zeros(len(x), dtype=bool)
            hit[m] = _zone_hit_mask(z, x[m], y[m])
            any_hit |= hit
        keep = any_hit if self.mode == "semi" else ~any_hit
        return pd.DataFrame({"rec_id": rec[keep], "x": x[keep], "y": y[keep]})


def broadcast_pip_join(points: "rd.Dataset", zones: list[dict],
                       mode: str = "inner", concurrency=None) -> "rd.Dataset":
    from .util import pool_size
    zones_ref = ray.put(zones)
    return points.map_batches(
        BroadcastPIPJoin, fn_constructor_args=(zones_ref, mode),
        batch_format="numpy", concurrency=concurrency or pool_size(),
        batch_size=32768)


class RTreePIPJoin:
    """Actor-pool inner PIP join indexed by the packed-Hilbert R-tree
    (core/rtree.py — the index the north rule names; ZoneGridIndex is
    the uniform-grid alternative). Tree built ONCE per actor in
    ``__init__``; per batch one vectorized frontier descent yields
    (point, zone) bbox candidates, then the exact predicate refines
    per zone. Output is identical to ``BroadcastPIPJoin(mode=inner)``
    — only the candidate generator differs."""

    def __init__(self, zones_ref):
        from ..core.rtree import PackedHilbertRTree
        zones = (ray.get(zones_ref)
                 if isinstance(zones_ref, ray.ObjectRef) else zones_ref)
        for z in zones:
            z["bbox"] = _zone_bbox(z)
        self.zones = zones
        self.tree = PackedHilbertRTree(
            np.array([z["bbox"] for z in zones], dtype=np.float64))

    def __call__(self, batch: dict) -> pd.DataFrame:
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        rec = np.asarray(batch["rec_id"], dtype=np.int64)
        prow, zid = self.tree.query_points(x, y)
        recs, zids = [], []
        for zi in np.unique(zid):
            rows = prow[zid == zi]
            z = self.zones[int(zi)]
            hit = _zone_hit_mask(z, x[rows], y[rows])
            if hit.any():
                recs.append(rec[rows[hit]])
                zids.append(np.full(int(hit.sum()), z["zone_id"],
                                    dtype=np.int64))
        if not recs:
            return pd.DataFrame({"rec_id": np.array([], dtype=np.int64),
                                 "zone_id": np.array([], dtype=np.int64)})
        return pd.DataFrame({"rec_id": np.concatenate(recs),
                             "zone_id": np.concatenate(zids)})


def rtree_pip_join(points: "rd.Dataset", zones: list[dict],
                   concurrency=None) -> "rd.Dataset":
    from .util import pool_size
    zones_ref = ray.put(zones)
    return points.map_batches(
        RTreePIPJoin, fn_constructor_args=(zones_ref,),
        batch_format="numpy", concurrency=concurrency or pool_size(),
        batch_size=32768)


# ---------------------------------------------------------------------------
# Cell-partitioned shuffle join (large × large path)
# ---------------------------------------------------------------------------

def cell_partitioned_pip_join(points: "rd.Dataset", zones: list[dict],
                              cell_width: float = 500.0, salt: int = 1) -> "rd.Dataset":
    """groupby-shuffle spatial hash join keyed on rect cell ids.

    Zones are replicated to every cell their bbox overlaps (driver-side —
    the zone side is the small-to-medium side); points are keyed by their
    single containing cell, optionally salted (cell_key = cell*salt + h)
    to split hot cells. The per-group refine is the same exact PIP.
    """
    grid = RectGrid.from_extent(WEST, SOUTH, EAST, NORTH,
                                width_x=cell_width, width_y=cell_width)
    # zone replication table: cell -> zones (driver-side, zones are small)
    cell_zone: dict[int, list] = {}
    for z in zones:
        bb = _zone_bbox(z)
        r0, c0 = grid.rowcol_of(np.array([bb[0]]), np.array([bb[1]]))
        r1, c1 = grid.rowcol_of(np.array([bb[2]]), np.array([bb[3]]))
        for r in range(int(r0[0]), int(r1[0]) + 1):
            for c in range(int(c0[0]), int(c1[0]) + 1):
                if 0 <= r < grid.rows and 0 <= c < grid.cols:
                    cell_zone.setdefault(r * grid.cols + c, []).append(z)
    cz_ref = ray.put(cell_zone)

    def key_points(batch):
        cell = grid.tile_of(batch["x"], batch["y"])
        if salt > 1:
            h = (np.asarray(batch["rec_id"], dtype=np.int64) * 2654435761) % salt
            cell = cell * salt + h
        return {"rec_id": np.asarray(batch["rec_id"], dtype=np.int64),
                "x": np.asarray(batch["x"], dtype=np.float64),
                "y": np.asarray(batch["y"], dtype=np.float64),
                "cell_key": cell}

    keyed = points.map_batches(key_points, batch_format="numpy")

    def _cell_join(cz, cell: int, group: pd.DataFrame) -> pd.DataFrame:
        if salt > 1:
            cell //= salt
        zlist = cz.get(cell, [])
        if not zlist:
            return pd.DataFrame({"rec_id": pd.Series([], dtype="int64"),
                                 "zone_id": pd.Series([], dtype="int64")})
        x = group["x"].to_numpy()
        y = group["y"].to_numpy()
        rec = group["rec_id"].to_numpy()
        recs, zids = [], []
        for z in zlist:
            hit = _zone_hit_mask(z, x, y)
            if hit.any():
                recs.append(rec[hit])
                zids.append(np.full(int(hit.sum()), z["zone_id"], dtype=np.int64))
        if not recs:
            return pd.DataFrame({"rec_id": pd.Series([], dtype="int64"),
                                 "zone_id": pd.Series([], dtype="int64")})
        return pd.DataFrame({"rec_id": np.concatenate(recs),
                             "zone_id": np.concatenate(zids)})

    # Bucketed shuffle: cell keys are unbounded (grid size), so shuffle
    # on cell_key % NB (NB ∝ cluster parallelism) and refine each cell
    # inside a pandas sub-groupby — avoids Ray's ~10 ms per-group
    # map_groups machinery across hundreds/thousands of cells while
    # keeping cells co-located (salting still splits hot cells first).
    from .util import adaptive_num_buckets
    NB = adaptive_num_buckets()

    def add_bucket(batch):
        batch["bucket"] = (batch["cell_key"] * 2654435761) % NB
        return batch

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cz = ray.get(cz_ref)
        outs = [_cell_join(cz, int(ck), sub)
                for ck, sub in g.groupby("cell_key", sort=True)]
        if not outs:
            return pd.DataFrame({"rec_id": pd.Series([], dtype="int64"),
                                 "zone_id": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return (keyed.map_batches(add_bucket, batch_format="numpy")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


# ---------------------------------------------------------------------------
# Within-distance join (points × broadcast sites)
# ---------------------------------------------------------------------------

def within_distance_join(points: "rd.Dataset", sites: list[dict],
                         radius: float) -> "rd.Dataset":
    """Emit (rec_id, site_id) for every point within `radius` of a site
    (IsolateVectorFeaturesByLocation 'within a distance' predicate).
    Sites are broadcast; distance test is vectorized per batch."""
    sx = np.array([s["sx"] for s in sites])
    sy = np.array([s["sy"] for s in sites])
    sid = np.array([s["site_id"] for s in sites], dtype=np.int64)
    r2 = radius * radius

    def fn(batch):
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        rec = np.asarray(batch["rec_id"], dtype=np.int64)
        d2 = (x[:, None] - sx[None, :]) ** 2 + (y[:, None] - sy[None, :]) ** 2
        pi, si = np.nonzero(d2 <= r2)
        return {"rec_id": rec[pi], "site_id": sid[si]}

    return points.map_batches(fn, batch_format="numpy")
