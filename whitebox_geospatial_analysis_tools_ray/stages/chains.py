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
    pts = endpoint_table(sf_dir)
    if len(pts) == 0:       # empty layer -> typed empty chains
        return pd.DataFrame({"parent_id": pd.Series([], dtype="int64"),
                             "group_id": pd.Series([], dtype="int64")})
    pts = pts.sort_values("pt").reset_index(drop=True)
    n_polys = int(pts["poly"].max())
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


def find_polygon_chains_sql() -> str:
    """Exact mirror of find_polygon_chains — flipped from rows-only.

    Phase 1 (member synthesis + the 181-angle 0.5-degree MBB sweep with
    the Double.MIN_VALUE east/north clamp, first-wins key points and the
    Python-float %% rationalisation) replays as plain relational SQL;
    float expressions reproduce the Python's association order
    bit-exactly (verified: endpoint table identical at sf0.001/0.01).

    Phase 2's greedy mutual matching looks sequential, but its geometric
    gates are STATIC — connections only ever remove candidates — so each
    point's gate-passing candidates are precomputed ordered by (d1, c)
    and the scan replays as a one-row-per-step recursive machine whose
    step is just "first still-unconnected candidate + mutuality check"
    over carried conn lists.

    Phase 3's chain walk is declarative: links form only paths/cycles
    (each polygon end links at most once), so chains = path components
    (min-label closure), start = the component's minimum single-linked
    polygon, emitted iff length >= MIN_CHAIN, group ids ranked by start.

    Heavy shared CTEs are MATERIALIZED — the recursive machine would
    otherwise re-run phase 1 every step. ~20 s at the driver's sf0.01
    (500 docs, 1000 machine steps).
    """
    return """
WITH RECURSIVE
mem AS (
  SELECT doc_id AS rec, doc_id // 6 AS chain, doc_id % 6 AS pos
  FROM documents),
memh AS (
  SELECT rec, chain, pos,
         (chain * 2654435761) % 4294967296 AS hc,
         list_transform(range(6),
           j -> 36.0 + ((((chain * 6 + j) * 2654435761) % 4294967296) % 12))
           AS lens
  FROM mem),
memg AS (
  SELECT rec, pos, hc, lens,
         ((hc % 180) * 0.5) * pi() / 180.0 AS theta,
         (chain % 32) * 2000.0 AS gx,
         (chain // 32) * 2000.0 AS gy,
         (SELECT coalesce(sum(lens[j + 1] + 4.0), 0.0)
          FROM unnest(range(pos)) t(j)) + lens[pos + 1] / 2.0 AS along,
         (pos = 5 OR (hc % 3 = 0 AND pos = 3)) AS fat
  FROM memh),
member AS (
  SELECT rec, theta,
         gx + along * cos(theta) AS cx,
         gy + along * sin(theta) AS cy,
         CASE WHEN fat THEN 20.0 ELSE lens[pos + 1] END AS length,
         CASE WHEN fat THEN 20.0 ELSE 8.0 END AS width
  FROM memg),
mhalf AS (
  SELECT rec,
         cos(theta) * length / 2.0 AS ax, sin(theta) * length / 2.0 AS ay,
         -sin(theta) * width / 2.0 AS px, cos(theta) * width / 2.0 AS py,
         cx, cy
  FROM member),
mv AS (
  SELECT rec, t.k,
         CASE t.k WHEN 0 THEN cx - ax - px WHEN 1 THEN cx + ax - px
                  WHEN 2 THEN cx + ax + px ELSE cx - ax + px END AS vx,
         CASE t.k WHEN 0 THEN cy - ay - py WHEN 1 THEN cy + ay - py
                  WHEN 2 THEN cy + ay + py ELSE cy - ay + py END AS vy
  FROM mhalf, (SELECT unnest(range(4)) AS k) t),
mid AS (
  SELECT rec,
         min(vx) + (max(vx) - min(vx)) / 2.0 AS mid_x,
         min(vy) + (max(vy) - min(vy)) / 2.0 AS mid_y
  FROM mv GROUP BY rec),
cv AS (
  SELECT v.rec, v.k, v.vx, v.vy,
         v.vx - m.mid_x AS x, v.vy - m.mid_y AS y, m.mid_x, m.mid_y
  FROM mv v JOIN mid m ON m.rec = v.rec),
rot AS (
  SELECT c.rec, c.k, t.m,
         c.x * cos(((-t.m) * 0.5) * pi() / 180.0)
           - c.y * sin(((-t.m) * 0.5) * pi() / 180.0) AS xr,
         c.x * sin(((-t.m) * 0.5) * pi() / 180.0)
           + c.y * cos(((-t.m) * 0.5) * pi() / 180.0) AS yr
  FROM cv c, (SELECT unnest(range(181)) AS m) t),
ext AS (
  SELECT rec, m,
         min(xr) AS w, greatest(max(xr), 4.9e-324) AS e,
         min(yr) AS s, greatest(max(yr), 4.9e-324) AS n
  FROM rot GROUP BY rec, m),
best AS (
  SELECT rec, m, w, e, s, n, (e - w) * (n - s) AS area,
         row_number() OVER (PARTITION BY rec
                            ORDER BY (e - w) * (n - s), m) AS rn
  FROM ext),
b1 AS (SELECT rec, m, w, e, s, n, e - w AS ax_x, n - s AS ax_y
       FROM best WHERE rn = 1),
kp AS (      -- the 4 key points at the best angle, in the literal order
  SELECT b.rec, u.ki,
         CASE u.ki
           WHEN 0 THEN (SELECT r.k FROM rot r WHERE r.rec = b.rec AND r.m = b.m
                        ORDER BY r.xr, r.k LIMIT 1)
           WHEN 1 THEN (SELECT r.k FROM rot r WHERE r.rec = b.rec AND r.m = b.m
                        ORDER BY r.xr DESC, r.k LIMIT 1)
           WHEN 2 THEN (SELECT r.k FROM rot r WHERE r.rec = b.rec AND r.m = b.m
                        ORDER BY r.yr, r.k LIMIT 1)
           ELSE        (SELECT r.k FROM rot r WHERE r.rec = b.rec AND r.m = b.m
                        ORDER BY r.yr DESC, r.k LIMIT 1)
         END AS k
  FROM b1 b, (SELECT unnest(range(4)) AS ki) u),
geo AS (
  SELECT b.rec, b.ax_x, b.ax_y,
         ((-b.m) * 0.5) * pi() / 180.0 AS psi,
         greatest(b.ax_x, b.ax_y) AS long_axis,
         least(b.ax_x, b.ax_y) AS short_axis,
         b.w + b.ax_x / 2.0 AS bx, b.s + b.ax_y / 2.0 AS by,
         m.mid_x, m.mid_y
  FROM b1 b JOIN mid m ON m.rec = b.rec
  WHERE 1.0 - least(b.ax_x, b.ax_y) / greatest(b.ax_x, b.ax_y) > 0.25),
slo AS (
  SELECT rec, long_axis, short_axis,
         mid_x + bx * cos(-psi) - by * sin(-psi) AS box_cx,
         mid_y + bx * sin(-psi) + by * cos(-psi) AS box_cy,
         CASE WHEN ax_x > ax_y THEN -psi ELSE -(pi() / 2.0 + psi) END AS slope0
  FROM geo),
rat AS (   -- Python float %: fmod adjusted toward the divisor's sign
  SELECT rec, long_axis, short_axis, box_cx, box_cy,
         (CASE WHEN fmod(
                 (CASE WHEN fmod(slope0 * 2.0, 2.0 * pi()) <> 0
                        AND fmod(slope0 * 2.0, 2.0 * pi()) < 0
                       THEN fmod(slope0 * 2.0, 2.0 * pi()) + 2.0 * pi()
                       ELSE fmod(slope0 * 2.0, 2.0 * pi()) END) + 2.0 * pi(),
                 2.0 * pi()) <> 0
                AND fmod(
                 (CASE WHEN fmod(slope0 * 2.0, 2.0 * pi()) <> 0
                        AND fmod(slope0 * 2.0, 2.0 * pi()) < 0
                       THEN fmod(slope0 * 2.0, 2.0 * pi()) + 2.0 * pi()
                       ELSE fmod(slope0 * 2.0, 2.0 * pi()) END) + 2.0 * pi(),
                 2.0 * pi()) < 0
               THEN fmod(
                 (CASE WHEN fmod(slope0 * 2.0, 2.0 * pi()) <> 0
                        AND fmod(slope0 * 2.0, 2.0 * pi()) < 0
                       THEN fmod(slope0 * 2.0, 2.0 * pi()) + 2.0 * pi()
                       ELSE fmod(slope0 * 2.0, 2.0 * pi()) END) + 2.0 * pi(),
                 2.0 * pi()) + 2.0 * pi()
               ELSE fmod(
                 (CASE WHEN fmod(slope0 * 2.0, 2.0 * pi()) <> 0
                        AND fmod(slope0 * 2.0, 2.0 * pi()) < 0
                       THEN fmod(slope0 * 2.0, 2.0 * pi()) + 2.0 * pi()
                       ELSE fmod(slope0 * 2.0, 2.0 * pi()) END) + 2.0 * pi(),
                 2.0 * pi()) END) / 2.0 AS slope
  FROM slo),
axend AS (
  SELECT r.rec, r.short_axis, u.e AS endiness,
         r.box_cx + (CASE u.e WHEN 1 THEN 1.0 ELSE -1.0 END)
           * r.long_axis / 2.0 * cos(r.slope) AS ex,
         r.box_cy + (CASE u.e WHEN 1 THEN 1.0 ELSE -1.0 END)
           * r.long_axis / 2.0 * sin(r.slope) AS ey
  FROM rat r, (SELECT unnest([1, 2]) AS e) u),
ep AS MATERIALIZED (
  SELECT a.rec * 2 + (a.endiness - 1) AS pt,
         (SELECT v.vx FROM kp j JOIN cv v ON v.rec = a.rec AND v.k = j.k
          WHERE j.rec = a.rec
            AND (v.vx - a.ex) * (v.vx - a.ex)
              + (v.vy - a.ey) * (v.vy - a.ey)
                < a.short_axis * a.short_axis * 1.05
          ORDER BY (v.vx - a.ex) * (v.vx - a.ex)
                 + (v.vy - a.ey) * (v.vy - a.ey), j.ki LIMIT 1) AS x,
         (SELECT v.vy FROM kp j JOIN cv v ON v.rec = a.rec AND v.k = j.k
          WHERE j.rec = a.rec
            AND (v.vx - a.ex) * (v.vx - a.ex)
              + (v.vy - a.ey) * (v.vy - a.ey)
                < a.short_axis * a.short_axis * 1.05
          ORDER BY (v.vx - a.ex) * (v.vx - a.ex)
                 + (v.vy - a.ey) * (v.vy - a.ey), j.ki LIMIT 1) AS y,
         a.rec + 1 AS poly, a.endiness
  FROM axend a),
co AS (
  SELECT e.pt AS i, e.x, e.y, e.poly, e.endiness,
         p.x AS xo, p.y AS yo,
         sqrt((p.x - e.x) * (p.x - e.x)
            + (p.y - e.y) * (p.y - e.y)) AS len1
  FROM ep e JOIN ep p
    ON p.pt = CASE WHEN e.endiness = 1 THEN e.pt + 1 ELSE e.pt - 1 END),
cand AS (
  SELECT a.i, c.i AS c,
         (c.x - a.x) * (c.x - a.x) + (c.y - a.y) * (c.y - a.y) AS d1
  FROM co a JOIN co c ON c.poly <> a.poly
  WHERE (c.x - a.x) * (c.x - a.x) + (c.y - a.y) * (c.y - a.y) < 144.0
    AND (c.x - a.x) * (c.x - a.x) + (c.y - a.y) * (c.y - a.y)
        < (c.x - a.xo) * (c.x - a.xo) + (c.y - a.yo) * (c.y - a.yo)
    AND (c.x - a.x) * (c.x - a.x) + (c.y - a.y) * (c.y - a.y)
        < (c.xo - a.x) * (c.xo - a.x) + (c.yo - a.y) * (c.yo - a.y)
    AND sqrt((c.xo - a.xo) * (c.xo - a.xo) + (c.yo - a.yo) * (c.yo - a.yo))
        > (sqrt((least(a.len1, c.len1)
                 + sqrt((c.x - a.x) * (c.x - a.x)
                      + (c.y - a.y) * (c.y - a.y)))
              * (least(a.len1, c.len1)
                 + sqrt((c.x - a.x) * (c.x - a.x)
                      + (c.y - a.y) * (c.y - a.y)))
              + greatest(a.len1, c.len1) * greatest(a.len1, c.len1))
           + ((sqrt((c.x - a.x) * (c.x - a.x) + (c.y - a.y) * (c.y - a.y))
               + greatest(a.len1, c.len1) + least(a.len1, c.len1))
              - sqrt((least(a.len1, c.len1)
                      + sqrt((c.x - a.x) * (c.x - a.x)
                           + (c.y - a.y) * (c.y - a.y)))
                   * (least(a.len1, c.len1)
                      + sqrt((c.x - a.x) * (c.x - a.x)
                           + (c.y - a.y) * (c.y - a.y)))
                   + greatest(a.len1, c.len1) * greatest(a.len1, c.len1)))
             * 0.5)),
candl AS MATERIALIZED (SELECT i, list(c ORDER BY d1, c) AS cl FROM cand GROUP BY i),
nn2 AS MATERIALIZED (SELECT 2 * count(*) AS n FROM documents),
idx2 AS (SELECT unnest(range((SELECT n FROM nn2))) AS x),
plist AS MATERIALIZED (SELECT list(coalesce(e.poly, 0) ORDER BY i.x) AS pl
          FROM idx2 i LEFT JOIN ep e ON e.pt = i.x),
cl2 AS (SELECT i.x, coalesce(c.cl, []::BIGINT[]) AS cl
        FROM idx2 i LEFT JOIN candl c ON c.i = i.x),
clist AS MATERIALIZED (SELECT list(cl ORDER BY x) AS cls FROM cl2),
act AS MATERIALIZED (   -- only points with candidates can connect,
  SELECT list(i ORDER BY i) AS al, count(*) AS na FROM candl),
m2(r, cpl, ptl) AS (    -- so the scan iterates the ACTIVE list only
  SELECT 0,
         list_transform(range((SELECT n FROM nn2)), x -> 0),
         list_transform(range((SELECT n FROM nn2)), x -> -1)
  UNION ALL
  SELECT r + 1,
         CASE WHEN ok THEN
           list_transform(range(n), x ->
             CASE WHEN x = k THEN pl[nb + 1]
                  WHEN x = nb THEN pl[k + 1]
                  ELSE cpl[x + 1] END)
         ELSE cpl END,
         CASE WHEN ok THEN
           list_transform(range(n), x ->
             CASE WHEN x = k THEN nb
                  WHEN x = nb THEN k
                  ELSE ptl[x + 1] END)
         ELSE ptl END
  FROM (
    SELECT s1.*,
           s1.nb >= 0
           AND coalesce(list_filter(s1.cls[s1.nb + 1],
                 cc -> s1.cpl[cc + 1] = 0)[1], -1) = s1.k AS ok
    FROM (
      SELECT m2.r, m2.cpl, m2.ptl, p.pl, c.cls, a.al[m2.r + 1] AS k,
             (SELECT n FROM nn2) AS n,
             CASE WHEN p.pl[a.al[m2.r + 1] + 1] = 0 THEN -1
                  ELSE coalesce(list_filter(c.cls[a.al[m2.r + 1] + 1],
                        cc -> m2.cpl[cc + 1] = 0)[1], -1) END AS nb
      FROM m2, plist p, clist c, act a
      WHERE m2.r < a.na) s1) s2),
fin AS (SELECT cpl, ptl FROM m2, act WHERE r = na),
linkpt AS (
  SELECT i.x AS i, f.ptl[i.x + 1] AS j
  FROM fin f, idx2 i WHERE f.ptl[i.x + 1] >= 0),
pedge AS (
  SELECT DISTINCT least(i // 2 + 1, j // 2 + 1) AS a,
                  greatest(i // 2 + 1, j // 2 + 1) AS b
  FROM linkpt),
deg AS (SELECT i // 2 + 1 AS p, count(*) AS links FROM linkpt GROUP BY 1),
sym2 AS (SELECT a, b FROM pedge UNION SELECT b, a FROM pedge),
cc2(node, lbl) AS (
  SELECT a, a FROM sym2
  UNION
  SELECT s.a, c.lbl FROM cc2 c JOIN sym2 s ON s.b = c.node),
comp AS (SELECT node, min(lbl) AS comp_id FROM cc2 GROUP BY node),
cstat AS (
  SELECT c.comp_id, count(*) AS len,
         min(CASE WHEN d.links = 1 THEN c.node END) AS start
  FROM comp c JOIN deg d ON d.p = c.node
  GROUP BY c.comp_id),
emitted2 AS (
  SELECT comp_id, row_number() OVER (ORDER BY start) AS gid
  FROM cstat WHERE len >= 3 AND start IS NOT NULL)
SELECT c.node::BIGINT AS parent_id, e.gid::BIGINT AS group_id
FROM comp c JOIN emitted2 e ON e.comp_id = c.comp_id
ORDER BY group_id, parent_id

"""
