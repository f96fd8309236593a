"""Flagship pipeline — the BASELINE.json headline workload.

documents (web pages) → geocode to point features → tile assignment
(TileLasFile rule over the world extent) → broadcast spatial join
against the polygon zone table (even-odd PIP with per-actor grid index)
→ per-(tile, zone) aggregation. One scan of the input, one small
shuffle of pre-aggregated partials — the shape that must hold at
10^12 documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..core.features import doc_points, rect_zones, seeded_polygons
from ..core.rng import EAST, NORTH, SOUTH, WEST
from ..core.tiles import RectGrid
from ..stages.spatial_join import BroadcastPIPJoin, _zone_bbox


def flagship(sf_dir: str, tile_width: float = 250.0,
             use_polygons: bool = True) -> "rd.Dataset":
    """Returns (tile_id, zone_id, n_points) for points falling in zones."""
    zones = seeded_polygons() if use_polygons else rect_zones()
    for z in zones:
        z["bbox"] = _zone_bbox(z)
    zones_ref = ray.put(zones)
    grid = RectGrid.from_extent(WEST, SOUTH, EAST, NORTH,
                                width_x=tile_width, width_y=tile_width)

    class GeoJoin:
        """Actor: geocode + tile-assign + PIP join + partial count, fused
        into one pass over each Arrow batch (no intermediate shuffle)."""

        def __init__(self):
            zs = ray.get(zones_ref) if isinstance(zones_ref, ray.ObjectRef) else zones_ref
            self.join = BroadcastPIPJoin(zs, mode="inner")
            self.zones = zs

        def __call__(self, batch) -> pd.DataFrame:
            pts = doc_points(batch)
            pairs = self.join(pts)
            if len(pairs) == 0:
                return pd.DataFrame({"tile_id": pd.Series([], dtype="int64"),
                                     "zone_id": pd.Series([], dtype="int64"),
                                     "c": pd.Series([], dtype="int64")})
            # join back x/y by rec position to compute the tile id
            lut = pd.Series(np.arange(len(pts["rec_id"])), index=pts["rec_id"])
            pos = lut[pairs["rec_id"].to_numpy()].to_numpy()
            tile = grid.tile_of(pts["x"][pos], pts["y"][pos])
            df = pd.DataFrame({"tile_id": tile,
                               "zone_id": pairs["zone_id"].to_numpy()})
            return (df.groupby(["tile_id", "zone_id"], sort=False)
                    .size().rename("c").reset_index())

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    from ..stages.util import pool_size
    partials = ds.map_batches(GeoJoin, batch_format="numpy",
                              concurrency=pool_size(), batch_size=32768)
    # bounded-key final combine (tiles × zones): one pandas task —
    # scale-independent, no sort-aggregate fixed tail (see util).
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["tile_id", "zone_id"], sort=True)["c"].sum()
             .reset_index().rename(columns={"c": "n_points"}))
        return g.astype({"n_points": "int64"})

    from ..stages.util import combine_bounded
    return combine_bounded(partials, combine)
