"""LocateConjugatePrincipalPoint — the annulus-signature pixel matcher
(ImageProcessingTools/src/plugins/LocateConjugatePrincipalPoint.java,
937 LoC; a hardcoded-developer-path tool, :70-90).

The data-processing core is ``findPixelMatch`` (:460-808), replicated
literally:

- **Annulus offsets** (:810-859): every (dx, dy) with
  Math.round(√(dx²+dy²)) == i, enumerated over the literal
  asymmetric window (a ∈ [−(cap+1), cap]), sorted by direction
  ``atan2(−dy, dx)`` DESCENDING then x, y ascending. Rings i ≤ cap−1
  are independent of the cap, so a smaller cap than the tool's 1000
  is bit-identical for every ring actually read (guarded).
- **Ring statistics** (:480-517): running mean/variance keyed on the
  CELL index ``a`` — not the valid count — so a ring whose first cells
  are NoData gets the literal ``M = z/(a+1)`` skew; variance =
  √(Q/(n−1)); "lumped" = mean |Δz| between consecutive valid cells in
  ring-scan order.
- **Adaptive radius** (:479-568): Douglas-Peucker-filter (:862-902,
  ε = 1.2) the mean and variance signatures; the kept indices form the
  COARSE rings; grow the radius by the step until both filters keep
  > 8 points and the union > 12.
- **Search** (:629-805): over the (2·window+1)² candidate cells of the
  transformed image, coarse-ring stats → weighted Pearson
  ``r1·w1 + r2·w2`` (w = filter-length shares); with fine search on,
  candidates scoring > 0.9 get a full all-rings detailed correlation
  (:722-800) and the DETAILED score competes for the max (strict >,
  first wins; 0/0 → NaN never beats — Java semantics).

Image pair: reference = the synthetic world raster; transformed = the
same surface shifted by (SHIFT_R, SHIFT_C) (off-source → NoData), so
true matches exist and border points degrade realistically. Control
points derive from the documents points (the tool reads a handful of
tie points per photo pair — :195-236); the initial transformed guess
carries a deterministic ±3-cell error inside the search window.

Ray plan: control points stream through one stateless ``map_batches``;
each point's 61²-candidate search is numpy-vectorized ACROSS candidates
(the Welford recurrence is sequential in the cell index but vector
across candidates); the raster is synth-backed so gathers are
overlap-reads (a file-backed image = the tile-keyed gather of SURVEY
§2.4). Not SQL-expressible (adaptive DP + index-keyed Welford) —
rows-only oracle; conformance = the literal-loop mirror at reduced
parameters plus determinism/known-shift tests.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import pandas as pd

from ..core.rng import NODATA
from .raster import RasterSpec, synth_value

# run() parameter block (LocateConjugatePrincipalPoint.java:61-64,205-207)
NEIGHBOURHOOD_START = 40
NEIGHBOURHOOD_STEP = 20
MAX_NEIGHBOURHOOD = 500
EPSILON = 1.2
SEARCH_WINDOW = 30
SCALE_FACTOR = 1.0
ACCEPT_THRESHOLD = 0.95

SHIFT_R, SHIFT_C = 7, -11
_OFFSET_CAP = 96        # rings ≤ 95 are exact (see header); guarded


@functools.lru_cache(maxsize=4)
def _annulus_offsets(cap: int = _OFFSET_CAP):
    """rings[i] = (dx_array, dy_array) in the literal scan+sort order."""
    # literal loop bounds (:819-822): row 0..2cap+1, a = row - (cap+1)
    a = np.arange(0, 2 * cap + 2) - (cap + 1)
    A, B = np.meshgrid(a, a, indexing="ij")     # A = dy, B = dx
    dist = np.sqrt(A * A + B * B)
    ring = np.floor(dist + 0.5).astype(np.int64)    # Java Math.round
    rings = []
    for i in range(cap + 1):
        m = ring == i
        dy = A[m].astype(np.int64)
        dx = B[m].astype(np.int64)
        if i == 0:
            rings.append((dx[:0], dy[:0]))
            continue
        direction = np.arctan2(-dy, dx)
        # direction DESC, then x ASC, then y ASC (XYAndDirection:910-935)
        order = np.lexsort((dy, dx, -direction))
        rings.append((dx[order], dy[order]))
    return rings


def _dp_filter(values: np.ndarray, start: int, end: int,
               eps: float) -> list[int]:
    """douglasPeuckerFilter (:862-902) on points (i, values[i]);
    returns kept indices (with junction duplicates merged)."""
    a = float(end - start)
    b = values[end] - values[start]
    c = -(b * start - a * values[start])
    norm = math.sqrt(a * a + b * b)
    dmax, index = 0.0, 0
    for i in range(start + 1, end):
        distance = abs(b * i - a * values[i] + c) / norm
        if distance > dmax:
            index = i
            dmax = distance
    if dmax >= eps:
        left = _dp_filter(values, start, index, eps)
        right = _dp_filter(values, index, end, eps)
        return left[:-1] + right
    return [start, end]


def _ring_stats_vec(get_z, rows2: np.ndarray, cols2: np.ndarray,
                    ring_dx: np.ndarray, ring_dy: np.ndarray,
                    nodata: float):
    """The :480-517 per-ring scan, vectorized across candidate centres.

    Returns (mean, variance, lump) arrays over the candidates, with the
    literal index-keyed Welford recurrence (M first, then Q from the
    UPDATED M) and the n>1 zero fallback."""
    k = len(rows2)
    total = np.zeros(k)
    n = np.zeros(k, dtype=np.int64)
    M = np.zeros(k)
    Q = np.zeros(k)
    prev = np.full(k, nodata)
    total_diff = np.zeros(k)
    for a in range(len(ring_dx)):
        z = get_z(rows2 + int(ring_dy[a]), cols2 + int(ring_dx[a]))
        valid = z != nodata
        total = np.where(valid, total + z, total)
        n = n + valid
        if a == 0:
            M = np.where(valid, z, M)
        else:
            Mn = M + (z - M) / (a + 1)
            Qn = Q + (a * (z - Mn) * (z - Mn)) / (a + 1)
            M = np.where(valid, Mn, M)
            Q = np.where(valid, Qn, Q)
        total_diff = np.where(valid & (prev != nodata),
                              total_diff + np.abs(z - prev), total_diff)
        prev = z
    ok = n > 1
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = np.where(ok, total / np.maximum(n, 1), 0.0)
        var = np.where(ok, np.sqrt(np.maximum(Q, 0.0)
                                   / np.maximum(n - 1, 1)), 0.0)
        lump = np.where(ok, total_diff / np.maximum(n - 1, 1), 0.0)
    return mean, var, lump


def find_pixel_match(get_ref, get_trans, ref_col: int, ref_row: int,
                     trans_col: int, trans_row: int,
                     fine_search: bool = True,
                     start: int = NEIGHBOURHOOD_START,
                     step: int = NEIGHBOURHOOD_STEP,
                     window: int = SEARCH_WINDOW,
                     max_neigh: int = MAX_NEIGHBOURHOOD,
                     eps: float = EPSILON,
                     nodata: float = NODATA):
    """findPixelMatch (:460-808), candidates vectorized."""
    rings = _annulus_offsets()
    radius = start
    ref_means = np.zeros(max_neigh + 1)
    ref_vars = np.zeros(max_neigh + 1)
    ref_lumps = np.zeros(max_neigh + 1)
    visited = np.zeros(max_neigh + 1, dtype=bool)
    one_r = np.array([ref_row])
    one_c = np.array([ref_col])
    while True:
        if radius >= _OFFSET_CAP:
            raise ValueError("annulus cap exceeded — raise _OFFSET_CAP")
        for i in range(1, radius + 1):
            if not visited[i]:
                dx, dy = rings[i]
                m, v, lu = _ring_stats_vec(get_ref, one_r, one_c, dx, dy,
                                           nodata)
                ref_means[i] = m[0]
                ref_vars[i] = v[0]
                ref_lumps[i] = lu[0]
                visited[i] = True
        kept1 = _dp_filter(ref_means, 1, radius, eps)
        kept2 = _dp_filter(ref_vars, 1, radius, eps)
        coarse = np.zeros(radius + 1, dtype=bool)
        for i in kept1:
            coarse[i] = True
        n_coarse = len(kept1)
        for i in kept2:
            if not coarse[i]:
                coarse[i] = True
                n_coarse += 1
        w1 = len(kept1) / (len(kept1) + len(kept2))
        w2 = len(kept2) / (len(kept1) + len(kept2))
        if len(kept1) > 8 and len(kept2) > 8 and n_coarse > 12:
            break
        radius += step
        if radius > max_neigh:
            # the reference's capped path (:563-566) exits the loop with
            # referenceRadius = max but the ring stats and the
            # coarse-rings array still sized for the PREVIOUS radius —
            # :577-586 then indexes out of bounds and the Java tool
            # crashes.  Unreachable on informative imagery (the start
            # radius already satisfies :556); raise rather than invent
            # a behaviour the reference doesn't have.
            raise ValueError(
                "adaptive radius hit maxNeighbourhoodSize — the "
                "reference crashes here (ArrayIndexOutOfBounds at "
                "LocateConjugatePrincipalPoint.java:581)")

    idx = np.arange(1, radius + 1)
    cmask = coarse[1:radius + 1]
    ref_mean = ref_means[idx][cmask].sum() / n_coarse
    ref_var = ref_vars[idx][cmask].sum() / n_coarse
    ref_mean_det = ref_means[idx].sum() / radius
    ref_var_det = ref_vars[idx].sum() / radius
    mean_dev = ref_means[idx] - ref_mean           # index a = i-1
    var_dev = ref_vars[idx] - ref_var
    mean_dev_det = ref_means[idx] - ref_mean_det
    var_dev_det = ref_vars[idx] - ref_var_det
    sqr1 = (mean_dev[cmask] ** 2).sum()
    sqr2 = (var_dev[cmask] ** 2).sum()
    sqr1_det = (mean_dev_det ** 2).sum()
    sqr2_det = (var_dev_det ** 2).sum()

    # candidate grid in the literal row-major scan order
    rr = np.arange(trans_row - window, trans_row + window + 1)
    cc = np.arange(trans_col - window, trans_col + window + 1)
    rows2 = np.repeat(rr, len(cc))
    cols2 = np.tile(cc, len(rr))
    k = len(rows2)
    means = np.zeros((radius + 1, k))
    varis = np.zeros((radius + 1, k))
    for i in range(1, radius + 1):
        if coarse[i]:
            si = int(np.floor(i * SCALE_FACTOR + 0.5))
            dx, dy = rings[si]
            m, v, _ = _ring_stats_vec(get_trans, rows2, cols2, dx, dy,
                                      nodata)
            means[i] = m
            varis[i] = v
    s_mean = means[idx][cmask].sum(axis=0) / n_coarse
    s_var = varis[idx][cmask].sum(axis=0) / n_coarse
    dmean = means[idx] - s_mean
    dvar = varis[idx] - s_var
    cov1 = (dmean[cmask] * mean_dev[cmask, None]).sum(axis=0)
    cov2 = (dvar[cmask] * var_dev[cmask, None]).sum(axis=0)
    ssd1 = (dmean[cmask] ** 2).sum(axis=0)
    ssd2 = (dvar[cmask] ** 2).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        score = (cov1 / np.sqrt(sqr1 * ssd1)) * w1 \
            + (cov2 / np.sqrt(sqr2 * ssd2)) * w2

    best_score = 0.0
    best_row, best_col = -1, -1
    if not fine_search:
        for j in range(k):              # literal strict-> scan order
            s = score[j]
            if s > best_score:
                best_score = float(s)
                best_row, best_col = int(rows2[j]), int(cols2[j])
        return best_row, best_col, best_score

    cand = np.flatnonzero(score > 0.9)
    if len(cand):
        fm = means[:, cand].copy()
        fv = varis[:, cand].copy()
        for i in range(1, radius + 1):
            if not coarse[i]:
                si = int(np.floor(i * SCALE_FACTOR + 0.5))
                dx, dy = rings[si]
                m, v, _ = _ring_stats_vec(get_trans, rows2[cand],
                                          cols2[cand], dx, dy, nodata)
                fm[i] = m
                fv[i] = v
        s_mean = fm[idx].sum(axis=0) / radius
        s_var = fv[idx].sum(axis=0) / radius
        dmean = fm[idx] - s_mean
        dvar = fv[idx] - s_var
        cov1 = (dmean * mean_dev_det[:, None]).sum(axis=0)
        cov2 = (dvar * var_dev_det[:, None]).sum(axis=0)
        ssd1 = (dmean ** 2).sum(axis=0)
        ssd2 = (dvar ** 2).sum(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            fscore = (cov1 / np.sqrt(sqr1_det * ssd1)) * w1 \
                + (cov2 / np.sqrt(sqr2_det * ssd2)) * w2
        for jj, j in enumerate(cand):   # literal scan order
            s = fscore[jj]
            if s > best_score:
                best_score = float(s)
                best_row, best_col = int(rows2[j]), int(cols2[j])
    return best_row, best_col, best_score


def _get_ref(spec: RasterSpec):
    def get(r, c):
        r = np.asarray(r)
        c = np.asarray(c)
        ok = (r >= 0) & (r < spec.rows) & (c >= 0) & (c < spec.cols)
        z = synth_value(np.where(ok, r * spec.cols + c, 0))
        return np.where(ok, z, spec.nodata)
    return get


def _get_trans(spec: RasterSpec, sr: int = SHIFT_R, sc: int = SHIFT_C):
    ref = _get_ref(spec)

    def get(r, c):
        r = np.asarray(r)
        c = np.asarray(c)
        ok = (r >= 0) & (r < spec.rows) & (c >= 0) & (c < spec.cols)
        z = ref(r - sr, c - sc)
        return np.where(ok, z, spec.nodata)
    return get


def locate_conjugate_point(sf_dir: str, n_points: int = 8,
                           spec: RasterSpec | None = None,
                           round_to: int = 6) -> pd.DataFrame:
    """One row per control point: the matched transformed-image cell
    and its correlation (accepted = corr ≥ 0.95, :214)."""
    import ray.data as rd

    from ..core.rng import EAST, NORTH, SOUTH, WEST, geocode_xy

    spec = spec or RasterSpec()
    csx = (EAST - WEST) / spec.cols
    csy = (NORTH - SOUTH) / spec.rows
    ewr = EAST - WEST - csx
    nsr = NORTH - SOUTH - csy
    ids = np.arange(n_points, dtype=np.int64) * 31 + 3
    x, y = geocode_xy(ids)
    col = np.floor((spec.cols - 1) * (x - WEST - csx / 2.0)
                   / ewr + 0.5).astype(np.int64)
    row = np.floor((spec.rows - 1) * (NORTH - csy / 2.0 - y)
                   / nsr + 0.5).astype(np.int64)
    g_r = (ids * 11 % 7 - 3).astype(np.int64)       # deterministic guess
    g_c = (ids * 7 % 5 - 2).astype(np.int64)        # error within ±3

    pts = rd.from_items([
        {"pt_id": int(ids[i]), "ref_row": int(row[i]),
         "ref_col": int(col[i]),
         "trans_row": int(row[i] + SHIFT_R + g_r[i]),
         "trans_col": int(col[i] + SHIFT_C + g_c[i])}
        for i in range(n_points)])

    def match(batch) -> pd.DataFrame:
        gr = _get_ref(spec)
        gt = _get_trans(spec)
        out = {"pt_id": [], "ref_row": [], "ref_col": [],
               "match_row": [], "match_col": [], "corr": [],
               "accepted": []}
        for i in range(len(batch["pt_id"])):
            mr, mc, s = find_pixel_match(
                gr, gt, int(batch["ref_col"][i]), int(batch["ref_row"][i]),
                int(batch["trans_col"][i]), int(batch["trans_row"][i]))
            out["pt_id"].append(int(batch["pt_id"][i]))
            out["ref_row"].append(int(batch["ref_row"][i]))
            out["ref_col"].append(int(batch["ref_col"][i]))
            out["match_row"].append(mr)
            out["match_col"].append(mc)
            out["corr"].append(round(s, round_to))
            out["accepted"].append(bool(s >= ACCEPT_THRESHOLD))
        return pd.DataFrame(out)

    return (pts.map_batches(match, batch_format="numpy", batch_size=1)
            .to_pandas().sort_values("pt_id").reset_index(drop=True))


def find_pixel_match_literal(get_ref, get_trans, ref_col, ref_row,
                             trans_col, trans_row, fine_search=True,
                             start=12, step=6, window=6, max_neigh=30,
                             eps=EPSILON, nodata=NODATA):
    """Pure sequential replay of :460-808 (loops, no vectors) — the
    mirror for the vectorized kernel, run at reduced parameters."""
    rings = _annulus_offsets()
    radius = start
    ref_means = [0.0] * (max_neigh + 1)
    ref_vars = [0.0] * (max_neigh + 1)
    visited = [False] * (max_neigh + 1)

    def ring_stats(get_z, r0, c0, i):
        dx, dy = rings[i]
        total, n, M, Q = 0.0, 0, 0.0, 0.0
        prev = nodata
        tdiff = 0.0
        for a in range(len(dx)):
            z = float(get_z(np.array([r0 + dy[a]]),
                            np.array([c0 + dx[a]]))[0])
            if z != nodata:
                total += z
                n += 1
                if a > 0:
                    M = M + (z - M) / (a + 1)
                    Q = Q + (a * (z - M) * (z - M)) / (a + 1)
                else:
                    M = z
                    Q = 0.0
                if prev != nodata:
                    tdiff += abs(z - prev)
            prev = z
        if n > 1:
            return total / n, math.sqrt(Q / (n - 1))
        return 0.0, 0.0

    while True:
        for i in range(1, radius + 1):
            if not visited[i]:
                ref_means[i], ref_vars[i] = ring_stats(get_ref, ref_row,
                                                       ref_col, i)
                visited[i] = True
        kept1 = _dp_filter(np.array(ref_means), 1, radius, eps)
        kept2 = _dp_filter(np.array(ref_vars), 1, radius, eps)
        coarse = [False] * (radius + 1)
        for i in kept1:
            coarse[i] = True
        n_coarse = len(kept1)
        for i in kept2:
            if not coarse[i]:
                coarse[i] = True
                n_coarse += 1
        w1 = len(kept1) / (len(kept1) + len(kept2))
        w2 = len(kept2) / (len(kept1) + len(kept2))
        if len(kept1) > 8 and len(kept2) > 8 and n_coarse > 12:
            break
        radius += step
        if radius > max_neigh:
            raise ValueError("capped path crashes in the reference")

    ref_mean = sum(ref_means[a] for a in range(1, radius + 1)
                   if coarse[a]) / n_coarse
    ref_var = sum(ref_vars[a] for a in range(1, radius + 1)
                  if coarse[a]) / n_coarse
    ref_mean_det = sum(ref_means[1:radius + 1]) / radius
    ref_var_det = sum(ref_vars[1:radius + 1]) / radius
    mdev = [ref_means[a] - ref_mean for a in range(radius + 1)]
    vdev = [ref_vars[a] - ref_var for a in range(radius + 1)]
    mdev_d = [ref_means[a] - ref_mean_det for a in range(radius + 1)]
    vdev_d = [ref_vars[a] - ref_var_det for a in range(radius + 1)]
    sqr1 = sum(mdev[a] ** 2 for a in range(1, radius + 1) if coarse[a])
    sqr2 = sum(vdev[a] ** 2 for a in range(1, radius + 1) if coarse[a])
    sqr1_d = sum(d ** 2 for d in mdev_d[1:radius + 1])
    sqr2_d = sum(d ** 2 for d in vdev_d[1:radius + 1])

    best, brow, bcol = 0.0, -1, -1
    for row2 in range(trans_row - window, trans_row + window + 1):
        for col2 in range(trans_col - window, trans_col + window + 1):
            means = [0.0] * (radius + 1)
            varis = [0.0] * (radius + 1)
            for i in range(1, radius + 1):
                if coarse[i]:
                    si = int(math.floor(i * SCALE_FACTOR + 0.5))
                    means[i], varis[i] = ring_stats(get_trans, row2,
                                                    col2, si)
            s_mean = sum(means[a] for a in range(1, radius + 1)
                         if coarse[a]) / n_coarse
            s_var = sum(varis[a] for a in range(1, radius + 1)
                        if coarse[a]) / n_coarse
            cov1 = cov2 = ssd1 = ssd2 = 0.0
            for a in range(1, radius + 1):
                if coarse[a]:
                    cov1 += (means[a] - s_mean) * mdev[a]
                    cov2 += (varis[a] - s_var) * vdev[a]
                    ssd1 += (means[a] - s_mean) ** 2
                    ssd2 += (varis[a] - s_var) ** 2
            with np.errstate(divide="ignore", invalid="ignore"):
                r1 = cov1 / math.sqrt(sqr1 * ssd1) if sqr1 * ssd1 > 0 \
                    else float("nan")
                r2 = cov2 / math.sqrt(sqr2 * ssd2) if sqr2 * ssd2 > 0 \
                    else float("nan")
            score = r1 * w1 + r2 * w2
            if not fine_search:
                if score > best:
                    best, brow, bcol = score, row2, col2
            elif score > 0.9:
                for i in range(1, radius + 1):
                    if not coarse[i]:
                        si = int(math.floor(i * SCALE_FACTOR + 0.5))
                        means[i], varis[i] = ring_stats(get_trans, row2,
                                                        col2, si)
                s_mean = sum(means[1:radius + 1]) / radius
                s_var = sum(varis[1:radius + 1]) / radius
                cov1 = cov2 = ssd1 = ssd2 = 0.0
                for a in range(1, radius + 1):
                    cov1 += (means[a] - s_mean) * mdev_d[a]
                    cov2 += (varis[a] - s_var) * vdev_d[a]
                    ssd1 += (means[a] - s_mean) ** 2
                    ssd2 += (varis[a] - s_var) ** 2
                r1 = cov1 / math.sqrt(sqr1_d * ssd1) if sqr1_d * ssd1 > 0 \
                    else float("nan")
                r2 = cov2 / math.sqrt(sqr2_d * ssd2) if sqr2_d * ssd2 > 0 \
                    else float("nan")
                fscore = r1 * w1 + r2 * w2
                if fscore > best:
                    best, brow, bcol = fscore, row2, col2
    return brow, bcol, best
