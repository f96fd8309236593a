"""kNN / IDW stages — the BASELINE "kNN (IDW-style nearest-neighbour search)".

Reference semantics (RasterCreation/src/plugins/InterpolationIDW.java:542-571):
- range query with SQUARED-distance cutoff (strict ``d² < maxDist²``),
- weights ``1 / sqrt(d²)^p``,
- exact hit (``d² == 0``) short-circuits to that point's value,
- no neighbours → NoData (−32768).

Deviation (documented): when the ONLY in-range neighbour is an exact hit
the reference's result depends on KdTree result order (sumWeights stays 0
→ NoData); we deterministically return the exact-hit value (min rec_id
among exact hits). The SQL oracle encodes the same rule.

Distributed plan (SURVEY.md §2.4 "kNN lookups"): neighbour-cell
duplication range join — points are emitted to every cell of a
``maxdist``-pitch grid whose expanded bbox contains them (≤ 4 cells for
pitch == maxdist), query cells are keyed by their single grid cell, and a
``groupby(cell).map_groups`` refines exactly per group. The shuffle key
is the spatial cell — the same partitioning key used by the spatial
join, per the north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..core.rng import NODATA, SOUTH, WEST
from .util import coalesce_partials


def _grid_key(x: np.ndarray, y: np.ndarray, pitch: float) -> tuple[np.ndarray, np.ndarray]:
    gx = np.floor((np.asarray(x) - WEST) / pitch).astype(np.int64)
    gy = np.floor((np.asarray(y) - SOUTH) / pitch).astype(np.int64)
    return gx, gy


def idw_interpolate(points: "rd.Dataset", cells: list[dict],
                    max_dist: float = 400.0, p: float = 2.0,
                    round_to: int = 4) -> "rd.Dataset":
    """IDW value at each query cell centre. Returns (cell_id, idw_z)."""
    pitch = max_dist
    maxd2 = max_dist * max_dist

    cx = np.array([c["cx"] for c in cells])
    cy = np.array([c["cy"] for c in cells])
    cid = np.array([c["cell_id"] for c in cells], dtype=np.int64)
    gx, gy = _grid_key(cx, cy, pitch)
    import pyarrow as pa
    cells_tbl = pa.table({
        "gkey": gx * 1_000_003 + gy,
        "role": np.zeros(len(cid), dtype=np.int64),
        "id": cid, "x": cx, "y": cy, "z": np.zeros(len(cid))})
    cells_ds = rd.from_arrow(cells_tbl)

    def duplicate(batch):
        """Emit each point to every grid cell whose pitch-box, expanded
        by max_dist, contains it (≤ 2×2 cells when pitch == max_dist)."""
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        rec = np.asarray(batch["rec_id"], dtype=np.int64)
        z = np.asarray(batch["z"], dtype=np.float64)
        gx0, gy0 = _grid_key(x, y, pitch)
        out = {k: [] for k in ("gkey", "role", "id", "x", "y", "z")}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tgx, tgy = gx0 + dx, gy0 + dy
                # distance from point to the target cell's box
                bx0, bx1 = WEST + tgx * pitch, WEST + (tgx + 1) * pitch
                by0, by1 = SOUTH + tgy * pitch, SOUTH + (tgy + 1) * pitch
                ddx = np.maximum(np.maximum(bx0 - x, x - bx1), 0.0)
                ddy = np.maximum(np.maximum(by0 - y, y - by1), 0.0)
                m = (ddx * ddx + ddy * ddy) < maxd2
                if not m.any():
                    continue
                out["gkey"].append(tgx[m] * 1_000_003 + tgy[m])
                out["role"].append(np.ones(int(m.sum()), dtype=np.int64))
                out["id"].append(rec[m])
                out["x"].append(x[m])
                out["y"].append(y[m])
                out["z"].append(z[m])
        if not out["gkey"]:
            return {k: np.array([], dtype=np.int64 if k in ("gkey", "role", "id")
                                else np.float64) for k in out}
        return {k: np.concatenate(v) for k, v in out.items()}

    pts_dup = points.map_batches(duplicate, batch_format="numpy")

    def per_cell_group(g: pd.DataFrame) -> pd.DataFrame:
        qs = g[g["role"] == 0]
        ps = g[g["role"] == 1]
        if len(qs) == 0:
            return pd.DataFrame({"cell_id": pd.Series([], dtype="int64"),
                                 "idw_z": pd.Series([], dtype="float64")})
        qx = qs["x"].to_numpy(); qy = qs["y"].to_numpy()
        qid = qs["id"].to_numpy()
        px = ps["x"].to_numpy(); py = ps["y"].to_numpy()
        pz = ps["z"].to_numpy(); prec = ps["id"].to_numpy()
        vals = np.full(len(qs), NODATA)
        if len(ps):
            d2 = (qx[:, None] - px[None, :]) ** 2 + (qy[:, None] - py[None, :]) ** 2
            exact = d2 == 0.0
            inr = (d2 > 0.0) & (d2 < maxd2)
            w = np.zeros_like(d2)
            np.divide(1.0, np.sqrt(d2, where=inr, out=np.full_like(d2, np.inf)) ** p,
                      out=w, where=inr)
            wsum = w.sum(axis=1)
            zsum = (w * pz[None, :]).sum(axis=1)
            has = wsum > 0
            vals[has] = zsum[has] / wsum[has]
            ex_rows = exact.any(axis=1)
            if ex_rows.any():
                big = np.where(exact, prec[None, :], np.iinfo(np.int64).max)
                pick = np.argmin(big, axis=1)
                vals[ex_rows] = pz[pick[ex_rows]]
        return pd.DataFrame({"cell_id": qid.astype("int64"),
                             "idw_z": np.round(vals, round_to)})

    # Re-block the unioned (queries ∪ duplicated points) stream before the
    # cell shuffle: the union inherits every upstream block boundary, and
    # the groupby's reduce fan-out follows block count, so tiny blocks
    # mean pure scheduling overhead. Adaptive re-blocking keeps the
    # fan-out proportional to data volume at any scale.
    both = coalesce_partials(cells_ds.union(pts_dup))
    return both.groupby("gkey").map_groups(per_cell_group, batch_format="pandas")


def nearest_point_per_site(points: "rd.Dataset", sites: list[dict],
                           round_to: int = 6) -> "rd.Dataset":
    """1-NN: for each broadcast site, the nearest streamed point
    (NearestNeighbourAnalysis.groovy:233 pattern). Tie-break: min rec_id
    among points at the minimum distance. Partial per-batch argmin →
    tiny groupby(site) final reduce — no O(n) shuffle."""
    sx = np.array([s["sx"] for s in sites])
    sy = np.array([s["sy"] for s in sites])
    sid = np.array([s["site_id"] for s in sites], dtype=np.int64)

    def partial(batch):
        x = np.asarray(batch["x"], dtype=np.float64)
        y = np.asarray(batch["y"], dtype=np.float64)
        rec = np.asarray(batch["rec_id"], dtype=np.int64)
        d2 = (sx[:, None] - x[None, :]) ** 2 + (sy[:, None] - y[None, :]) ** 2
        md = d2.min(axis=1)
        # min rec_id among ties at the min distance, per site
        recs = np.array([rec[d2[i] == md[i]].min() for i in range(len(sid))],
                        dtype=np.int64)
        return {"site_id": sid, "d2": md, "rec": recs}

    partials = points.map_batches(partial, batch_format="numpy")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        md = g["d2"].min()
        rec = g.loc[g["d2"] == md, "rec"].min()
        return pd.DataFrame({"site_id": [int(g["site_id"].iloc[0])],
                             "nn_rec": [int(rec)],
                             "nn_dist": [round(float(np.sqrt(md)), round_to)]})

    return coalesce_partials(partials).groupby("site_id").map_groups(
        final, batch_format="pandas")
