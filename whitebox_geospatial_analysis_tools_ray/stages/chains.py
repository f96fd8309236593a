"""FindPolygonChains (VectorTools/src/plugins/FindPolygonChains.java:197-713).

Finds chains of elongated polygons (e.g. drumlin fields, lake chains):

1. PER POLYGON (:301-463): the 0.5°-increment rotating minimum-bounding-box
   sweep (m = 0..180, psi = −m·0.5°, :338-394) with the literal quirks —
   east/north initialised to ``Double.MIN_VALUE`` (the smallest POSITIVE
   double, :352-354), first-wins extreme-vertex key points, strict-< area
   improvement. elongation = 1 − short/long (:398); polygons with
   elongation > 0.25 contribute their two major-axis END POINTS (the key
   vertex nearest each axis endpoint within shortAxis²·1.05, :410-432),
   point index i = (rec−1)·2 (+1 for the far end, "endiness" 1/2).
2. PAIR MATCHING (:465-500, findConnectedNeighbour :619-713): for each
   end point IN INDEX ORDER, the nearest other-polygon end point within
   the radius that passes the geometric gates (dist1 < dist2, dist1 <
   dist3, dist4 > the allowable-distance blend :694-705), restricted to
   not-yet-connected points — a SEQUENTIAL GREEDY matching (earlier links
   constrain later candidates); a link forms only when the choice is
   MUTUAL (:469).
3. CHAIN WALK (:502-595): polygons with exactly one linked end start a
   chain; walk across links marking group ids; chains ≥ minChainLength
   emit (PARENT_ID = polygon record number, GROUP_ID) rows — shorter
   chains are marked visited but NOT output and do not consume a group id.

Ray mapping: phase 1 is the expensive part (O(V·181) per polygon over
every vertex) and runs as a stateless ``map_batches`` over the polygon
table; it reduces each polygon to ≤ 2 end-point rows (6 scalars each).
Phases 2-3 are inherently sequential-greedy over that COMPACT table
(2 rows per elongated polygon — the broadcast-small-side regime; the
reference holds the same table in its KdTree) and run driver-side after
a deterministic sort by point index. Candidate search is vectorized
(full distance row per probe; a cell-bucket prefilter replaces it
beyond ~10⁶ polygons).

The synthetic layer derives deterministically from the documents table:
rec_id → chain id / position; each chain lays 6 members along a hashed
axial direction (a multiple of the sweep's 0.5° increment) — five
elongated rectangles and one fat square (elongation 0 → excluded →
chain breaker); every third chain also fattens position 3, splitting it
into a 3-chain (emitted) and a 1-chain (below minChainLength, dropped).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

_H = 2654435761
_M = 4294967296
_DMIN = 4.9e-324  # Java Double.MIN_VALUE (smallest positive double)

RADIUS = 12.0
MIN_CHAIN = 3
ELONGATION_THRESHOLD = 0.25


def _hash(v):
    return (np.asarray(v, dtype=np.int64) * _H) % _M


def chain_members(sf_dir: str) -> "rd.Dataset":
    """(rec_id, cx, cy, theta, length, width, fat) member layer."""
    from .points import read_points

    def to_member(batch):
        rec = np.asarray(batch["rec_id"], dtype=np.int64)
        chain = rec // 6
        pos = rec % 6
        hc = _hash(chain)
        theta = (hc % 180).astype(np.float64) * 0.5 * math.pi / 180.0
        gx = (chain % 32).astype(np.float64) * 2000.0
        gy = (chain // 32).astype(np.float64) * 2000.0
        # member lengths within the chain (prefix sum, closed form)
        lens = np.stack([36.0 + (_hash(chain * 6 + j) % 12) for j in range(6)],
                        axis=1)
        gap = 4.0
        offs = np.cumsum(np.concatenate(
            [np.zeros((len(rec), 1)), lens[:, :-1] + gap], axis=1), axis=1)
        along = offs[np.arange(len(rec)), pos] + lens[np.arange(len(rec)), pos] / 2.0
        length = lens[np.arange(len(rec)), pos]
        fat = (pos == 5) | ((hc % 3 == 0) & (pos == 3))
        return {"rec_id": rec, "theta": theta,
                "cx": gx + along * np.cos(theta),
                "cy": gy + along * np.sin(theta),
                "length": np.where(fat, 20.0, length),
                "width": np.where(fat, 20.0, 8.0),
                "fat": fat}

    return read_points(sf_dir).map_batches(to_member, batch_format="numpy")


def _member_vertices(cx, cy, theta, length, width) -> np.ndarray:
    ca, sa = math.cos(theta), math.sin(theta)
    ax, ay = ca * length / 2.0, sa * length / 2.0
    px, py = -sa * width / 2.0, ca * width / 2.0
    return np.array([[cx - ax - px, cy - ay - py],
                     [cx + ax - px, cy + ay - py],
                     [cx + ax + px, cy + ay + py],
                     [cx - ax + px, cy - ay + py]])


def _rationalize_axial(angle: float) -> float:
    two_pi = 2.0 * math.pi
    return (((angle * 2.0) % two_pi + two_pi) % two_pi) / 2.0


def poly_endpoints(vertices: np.ndarray):
    """Literal per-polygon phase 1: 0.5°-sweep MBB → elongation + the two
    major-axis end points. Returns (elongation, (x,y) end 1, (x,y) end 2)
    or None when elongation ≤ threshold."""
    v = np.asarray(vertices, dtype=np.float64)
    east, west = v[:, 0].max(), v[:, 0].min()
    north, south = v[:, 1].max(), v[:, 1].min()
    mid_x = west + (east - west) / 2.0
    mid_y = south + (north - south) / 2.0
    x = v[:, 0] - mid_x
    y = v[:, 1] - mid_y
    m = np.arange(181)
    psi = -m * 0.5 * math.pi / 180.0
    cos_p, sin_p = np.cos(psi), np.sin(psi)
    xr = x[:, None] * cos_p[None, :] - y[:, None] * sin_p[None, :]
    yr = x[:, None] * sin_p[None, :] + y[:, None] * cos_p[None, :]
    w_ang = xr.min(axis=0)
    s_ang = yr.min(axis=0)
    # Double.MIN_VALUE init: only values > +4.9e-324 ever update east/north
    e_ang = np.maximum(xr.max(axis=0), _DMIN)
    n_ang = np.maximum(yr.max(axis=0), _DMIN)
    areas = (e_ang - w_ang) * (n_ang - s_ang)
    best = int(np.argmin(areas))
    ax_x = e_ang[best] - w_ang[best]
    ax_y = n_ang[best] - s_ang[best]
    key_pts = [int(np.argmin(xr[:, best])), int(np.argmax(xr[:, best])),
               int(np.argmin(yr[:, best])), int(np.argmax(yr[:, best]))]
    psi_b = psi[best]
    slope = -psi_b if ax_x > ax_y else -(math.pi / 2.0 + psi_b)
    bx = w_ang[best] + ax_x / 2.0
    by = s_ang[best] + ax_y / 2.0
    box_cx = mid_x + bx * math.cos(-psi_b) - by * math.sin(-psi_b)
    box_cy = mid_y + bx * math.sin(-psi_b) + by * math.cos(-psi_b)
    long_axis = max(ax_x, ax_y)
    short_axis = min(ax_x, ax_y)
    elongation = 1.0 - short_axis / long_axis
    if elongation <= ELONGATION_THRESHOLD:
        return None
    slope = _rationalize_axial(slope)
    x1 = box_cx + long_axis / 2.0 * math.cos(slope)
    y1 = box_cy + long_axis / 2.0 * math.sin(slope)
    x2 = box_cx - long_axis / 2.0 * math.cos(slope)
    y2 = box_cy - long_axis / 2.0 * math.sin(slope)
    ends = []
    for ex, ey in ((x1, y1), (x2, y2)):
        kp = -1
        min_d = short_axis * short_axis * 1.05
        for i in range(4):
            px, py = v[key_pts[i], 0], v[key_pts[i], 1]
            d = (px - ex) ** 2 + (py - ey) ** 2
            if d < min_d:
                kp = key_pts[i]
                min_d = d
        if kp < 0:  # the reference would throw here (vertices[-1])
            raise ValueError("no key point near axis endpoint")
        ends.append((v[kp, 0], v[kp, 1]))
    return elongation, ends[0], ends[1]


def endpoint_table(sf_dir: str) -> pd.DataFrame:
    """Distributed phase 1 → compact end-point table (driver-gathered)."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in batch.itertuples():
            verts = _member_vertices(r.cx, r.cy, r.theta, r.length, r.width)
            res = poly_endpoints(verts)
            if res is None:
                continue
            _, (x1, y1), (x2, y2) = res
            rec = int(r.rec_id)  # 0-based doc_id; recordNum = rec + 1
            rows.append({"pt": rec * 2, "x": x1, "y": y1,
                         "poly": rec + 1, "endiness": 1})
            rows.append({"pt": rec * 2 + 1, "x": x2, "y": y2,
                         "poly": rec + 1, "endiness": 2})
        return pd.DataFrame(rows, columns=["pt", "x", "y", "poly",
                                           "endiness"])

    return (chain_members(sf_dir)
            .map_batches(fn, batch_format="pandas")
            .to_pandas())


def _match_and_walk(pts: pd.DataFrame, n_polys: int,
                    radius: float = RADIUS,
                    min_chain: int = MIN_CHAIN) -> pd.DataFrame:
    """Literal phases 2-3 over the compact end-point table."""
    n = n_polys * 2
    poly = np.zeros(n, dtype=np.int64)
    endi = np.zeros(n, dtype=np.int64)
    x = np.zeros(n)
    y = np.zeros(n)
    for r in pts.itertuples():
        poly[r.pt] = r.poly
        endi[r.pt] = r.endiness
        x[r.pt] = r.x
        y[r.pt] = r.y
    conn_poly = np.zeros(n, dtype=np.int64)   # pointAttributes[..][2]
    conn_pt = np.full(n, -1, dtype=np.int64)  # pointAttributes[..][3]
    r2 = radius * radius

    def find(i: int) -> int:
        xi, yi = x[i], y[i]
        j = i + 1 if endi[i] == 1 else i - 1
        xo, yo = x[j], y[j]
        length1 = math.sqrt((xo - xi) ** 2 + (yo - yi) ** 2)
        d1 = (x - xi) ** 2 + (y - yi) ** 2
        cand = np.flatnonzero((poly > 0) & (poly != poly[i])
                              & (conn_poly == 0) & (d1 < r2))
        best, min_d = -1, r2
        for c in cand:
            d1c = d1[c]
            if d1c >= min_d:
                continue
            j2 = c + 1 if endi[c] == 1 else c - 1
            x3, y3, x4, y4 = x[c], y[c], x[j2], y[j2]
            length2 = math.sqrt((x3 - x4) ** 2 + (y3 - y4) ** 2)
            shorter = min(length1, length2)
            longer = max(length1, length2)
            tmp1 = shorter + math.sqrt(d1c)
            tmp2 = math.sqrt(tmp1 * tmp1 + longer * longer)
            tmp3 = math.sqrt(d1c) + longer + shorter
            allowable = tmp2 + (tmp3 - tmp2) * 0.5
            dist2 = (x3 - xo) ** 2 + (y3 - yo) ** 2
            dist3 = (x4 - xi) ** 2 + (y4 - yi) ** 2
            dist4 = math.sqrt((x4 - xo) ** 2 + (y4 - yo) ** 2)
            if d1c < dist2 and d1c < dist3 and dist4 > allowable:
                min_d = d1c
                best = int(c)
        return best

    for i in range(n):
        if poly[i] > 0:
            nb = find(i)
            if nb >= 0 and find(nb) == i:
                conn_poly[i] = poly[nb]
                conn_poly[nb] = poly[i]
                conn_pt[i] = nb
                conn_pt[nb] = i

    group_of = np.zeros(n_polys, dtype=np.int64)
    parents, groups = [], []
    gid = 1
    for p in range(n_polys):
        if group_of[p] != 0:
            continue
        linked = 0
        active = last = 0
        if conn_poly[p * 2] > 0:
            linked += 1
            active, last = p * 2, p * 2 + 1
        if conn_poly[p * 2 + 1] > 0:
            linked += 1
            active, last = p * 2 + 1, p * 2
        if linked != 1:
            continue
        group_of[p] = gid
        chain = [p]
        cur = p
        while True:
            group_of[cur] = gid
            if poly[active] == poly[last]:
                if conn_poly[active] > 0:
                    cur = int(conn_poly[active]) - 1
                    last = active
                    active = int(conn_pt[last])
                    chain.append(cur)
                else:
                    if len(chain) >= min_chain:
                        parents.extend(c + 1 for c in chain)
                        groups.extend(gid for _ in chain)
                        gid += 1
                    break
            else:
                last = active
                active = active + 1 if endi[active] == 1 else active - 1
    return pd.DataFrame({"parent_id": np.asarray(parents, dtype=np.int64),
                         "group_id": np.asarray(groups, dtype=np.int64)})


def find_polygon_chains(sf_dir: str) -> pd.DataFrame:
    """Distributed FindPolygonChains → (parent_id, group_id)."""
    pts = endpoint_table(sf_dir).sort_values("pt").reset_index(drop=True)
    n_polys = int(pts["poly"].max()) if len(pts) else 0
    return _match_and_walk(pts, n_polys)


def find_polygon_chains_naive(sf_dir: str) -> pd.DataFrame:
    """Single-process mirror: the same literal per-polygon sweep in a
    plain loop over the locally-generated layer, then phases 2-3."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    recs = np.sort(docs["doc_id"].to_numpy().astype(np.int64))
    rows = []
    for rec in recs:
        chain = rec // 6
        pos = rec % 6
        hc = int(_hash(chain))
        theta = (hc % 180) * 0.5 * math.pi / 180.0
        lens = [36.0 + int(_hash(chain * 6 + j) % 12) for j in range(6)]
        gap = 4.0
        along = sum(lens[:pos]) + gap * pos + lens[pos] / 2.0
        fat = pos == 5 or (hc % 3 == 0 and pos == 3)
        length = 20.0 if fat else lens[pos]
        width = 20.0 if fat else 8.0
        cx = (chain % 32) * 2000.0 + along * math.cos(theta)
        cy = (chain // 32) * 2000.0 + along * math.sin(theta)
        res = poly_endpoints(_member_vertices(cx, cy, theta, length, width))
        if res is None:
            continue
        _, (x1, y1), (x2, y2) = res
        rec = int(rec)  # 0-based doc_id; recordNum = rec + 1
        rows.append({"pt": rec * 2, "x": x1, "y": y1,
                     "poly": rec + 1, "endiness": 1})
        rows.append({"pt": rec * 2 + 1, "x": x2, "y": y2,
                     "poly": rec + 1, "endiness": 2})
    pts = pd.DataFrame(rows, columns=["pt", "x", "y", "poly", "endiness"])
    n_polys = int(pts["poly"].max()) if len(pts) else 0
    return _match_and_walk(pts, n_polys)
