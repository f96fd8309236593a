"""Ordinary kriging (Scripts/KrigingInterpolation.groovy backed by
WhiteboxAPI/src/whitebox/stats/Kriging.java, 2,274 LoC).

Reference semantics (studied only): pairwise semivariances binned into
lags (Kriging.java bins/``LagSize``), a theoretical model fitted to the
binned values — spherical / exponential / gaussian formulas at
Kriging.java:955-982 — by Levenberg–Marquardt (:825-940), then an
ordinary-kriging solve per output cell over nearby sample points.

Ray plan (the SURVEY §2.10 "variogram fit = global agg + driver
optimize; apply = kNN join + solve per cell"):

1. EMPIRICAL VARIOGRAM — one neighbour-cell duplication shuffle (the
   stages/knn.py pattern, pitch = max lag distance); each cell group
   emits per-lag partials (count, Σ½Δz², Σd) for pairs owned by the
   group (pair counted ONCE: in the home cell of the smaller rec_id);
   a tiny ``groupby(bin)`` reduce finishes the variogram.
2. FIT (driver, O(n_lags)) — spherical model γ(d) = sill·(1.5 d/R −
   0.5 (d/R)³) capped at sill for d > R (Kriging.java:972-981, nugget
   0 as with ConsiderNugget=false): deterministic coarse-to-fine grid
   search over R with the closed-form least-squares sill per R —
   an order-stable replacement for the reference's LM iterations.
3. APPLY — second duplication shuffle keyed by the SAME grid; per
   query cell the k nearest in-range samples (sorted by (d², rec_id))
   form the OK system [[γ(d_ij), 1], [1, 0]] · w = [γ(d_i0), 1];
   prediction = w · z; no in-range samples → NoData.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..core.features import cell_centers
from ..core.rng import NODATA, SOUTH, WEST
from .points import read_points
from .util import coalesce_partials

LAG_SIZE = 100.0
N_LAGS = 6
MAX_DIST = LAG_SIZE * N_LAGS  # pair cutoff == duplication pitch
K_NEIGHBORS = 12


def _grid_key(x, y, pitch):
    gx = np.floor((np.asarray(x) - WEST) / pitch).astype(np.int64)
    gy = np.floor((np.asarray(y) - SOUTH) / pitch).astype(np.int64)
    return gx * 1_000_003 + gy, gx, gy


def _duplicate(batch, pitch: float):
    """Emit each point to every grid cell whose box, expanded by pitch,
    is within ``pitch`` of it; tag the home cell (dup=0)."""
    x = np.asarray(batch["x"], dtype=np.float64)
    y = np.asarray(batch["y"], dtype=np.float64)
    rec = np.asarray(batch["rec_id"], dtype=np.int64)
    z = np.asarray(batch["z"], dtype=np.float64)
    _, gx0, gy0 = _grid_key(x, y, pitch)
    out = {k: [] for k in ("gkey", "dup", "rec_id", "x", "y", "z")}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            tgx, tgy = gx0 + dx, gy0 + dy
            bx0, bx1 = WEST + tgx * pitch, WEST + (tgx + 1) * pitch
            by0, by1 = SOUTH + tgy * pitch, SOUTH + (tgy + 1) * pitch
            ddx = np.maximum(np.maximum(bx0 - x, x - bx1), 0.0)
            ddy = np.maximum(np.maximum(by0 - y, y - by1), 0.0)
            m = (ddx * ddx + ddy * ddy) < pitch * pitch
            if not m.any():
                continue
            out["gkey"].append(tgx[m] * 1_000_003 + tgy[m])
            out["dup"].append(np.full(int(m.sum()),
                                      int(dx != 0 or dy != 0), dtype=np.int64))
            out["rec_id"].append(rec[m])
            out["x"].append(x[m])
            out["y"].append(y[m])
            out["z"].append(z[m])
    return {k: (np.concatenate(v) if v else np.array(
        [], dtype=np.int64 if k in ("gkey", "dup", "rec_id") else np.float64))
        for k, v in out.items()}


def empirical_variogram(points: "rd.Dataset",
                        lag: float = LAG_SIZE,
                        n_lags: int = N_LAGS) -> pd.DataFrame:
    """(bin, n_pairs, gamma, mean_dist) — γ = Σ½(zi−zj)²/N per lag."""
    pitch = lag * n_lags

    dup = points.map_batches(lambda b: _duplicate(b, pitch),
                             batch_format="numpy")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["dup"] == 0]
        if len(own) == 0:
            return pd.DataFrame({"bin": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "ssq": pd.Series([], dtype="float64"),
                                 "sd": pd.Series([], dtype="float64")})
        ax = own["x"].to_numpy(); ay = own["y"].to_numpy()
        ar = own["rec_id"].to_numpy(); az = own["z"].to_numpy()
        bx = g["x"].to_numpy(); by = g["y"].to_numpy()
        br = g["rec_id"].to_numpy(); bz = g["z"].to_numpy()
        d2 = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
        m = (d2 > 0.0) & (d2 < pitch * pitch) & (ar[:, None] < br[None, :])
        if not m.any():
            return pd.DataFrame({"bin": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "ssq": pd.Series([], dtype="float64"),
                                 "sd": pd.Series([], dtype="float64")})
        d = np.sqrt(d2[m])
        dz2 = ((az[:, None] - bz[None, :]) ** 2)[m]
        bins = np.minimum((d / lag).astype(np.int64), n_lags - 1)
        df = pd.DataFrame({"bin": bins, "one": 1, "hsq": 0.5 * dz2, "d": d})
        gg = df.groupby("bin").agg(n=("one", "sum"), ssq=("hsq", "sum"),
                                   sd=("d", "sum"))
        return gg.reset_index()

    parts = (coalesce_partials(dup).groupby("gkey")
             .map_groups(partial, batch_format="pandas"))
    tot = (parts.groupby("bin")
           .sum(["n", "ssq", "sd"]).to_pandas()
           .rename(columns={"sum(n)": "n", "sum(ssq)": "ssq",
                            "sum(sd)": "sd"})
           .sort_values("bin").reset_index(drop=True))
    tot["gamma"] = tot["ssq"] / tot["n"]
    tot["mean_dist"] = tot["sd"] / tot["n"]
    return tot[["bin", "n", "gamma", "mean_dist"]]


def spherical(d: np.ndarray, sill: float, rng: float) -> np.ndarray:
    """Kriging.java:972-981 spherical model, nugget 0."""
    d = np.asarray(d, dtype=np.float64)
    r = np.where(d >= rng, sill,
                 sill * (1.5 * d / rng - 0.5 * (d / rng) ** 3))
    return np.where(d <= 0.0, 0.0, r)


def fit_spherical(vario: pd.DataFrame) -> tuple[float, float]:
    """(sill, range) by deterministic coarse-to-fine search over range
    with the closed-form least-squares sill — replaces the reference's
    LM iterations (Kriging.java:825-940) order-stably."""
    d = vario["mean_dist"].to_numpy()
    g = vario["gamma"].to_numpy()

    def sse(rng: float) -> tuple[float, float]:
        f = spherical(d, 1.0, rng)
        denom = float(f @ f)
        sill = float(f @ g) / denom if denom > 0 else 0.0
        sill = max(sill, 0.0)  # reference clamps Sill < 0 → 0 (:944)
        resid = g - sill * f
        return float(resid @ resid), sill

    lo, hi = LAG_SIZE * 0.5, MAX_DIST * 2.0
    best_r, best_sill, best_e = lo, 0.0, np.inf
    for _ in range(3):  # coarse → fine
        for rng in np.linspace(lo, hi, 61):
            e, s = sse(float(rng))
            if e < best_e - 1e-15:
                best_e, best_r, best_sill = e, float(rng), s
        step = (hi - lo) / 60.0
        lo, hi = max(best_r - step, 1e-6), best_r + step
    return best_sill, best_r


def krige_cells(sf_dir: str, k: int = K_NEIGHBORS,
                round_to: int = 4) -> "rd.Dataset":
    """Ordinary-kriging prediction at the 16×16 query cell centres:
    (cell_id, kriged_z)."""
    points = read_points(sf_dir)
    vario = empirical_variogram(points)
    sill, rng = fit_spherical(vario)
    pitch = MAX_DIST

    cells = cell_centers()
    cx = np.array([c["cx"] for c in cells])
    cy = np.array([c["cy"] for c in cells])
    cid = np.array([c["cell_id"] for c in cells], dtype=np.int64)
    gkey, _, _ = _grid_key(cx, cy, pitch)
    import pyarrow as pa
    cells_ds = rd.from_arrow(pa.table(
        {"gkey": gkey, "dup": np.full(len(cid), 2, dtype=np.int64),
         "rec_id": cid, "x": cx, "y": cy, "z": np.zeros(len(cid))}))

    dup = read_points(sf_dir).map_batches(
        lambda b: _duplicate(b, pitch), batch_format="numpy")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        qs = g[g["dup"] == 2]
        ps = g[g["dup"] != 2].drop_duplicates("rec_id")
        if len(qs) == 0:
            return pd.DataFrame({"cell_id": pd.Series([], dtype="int64"),
                                 "kriged_z": pd.Series([], dtype="float64")})
        px = ps["x"].to_numpy(); py = ps["y"].to_numpy()
        pz = ps["z"].to_numpy(); pr = ps["rec_id"].to_numpy()
        out = np.full(len(qs), NODATA)
        for qi, (qx, qy) in enumerate(zip(qs["x"].to_numpy(),
                                          qs["y"].to_numpy())):
            if len(ps) == 0:
                continue
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            inr = np.flatnonzero(d2 < pitch * pitch)
            if len(inr) == 0:
                continue
            order = inr[np.lexsort((pr[inr], d2[inr]))][:k]
            nx, ny, nz = px[order], py[order], pz[order]
            nd = np.sqrt(d2[order])
            m = len(order)
            dij = np.sqrt((nx[:, None] - nx[None, :]) ** 2
                          + (ny[:, None] - ny[None, :]) ** 2)
            A = np.ones((m + 1, m + 1))
            A[:m, :m] = spherical(dij, sill, rng)
            A[m, m] = 0.0
            b = np.ones(m + 1)
            b[:m] = spherical(nd, sill, rng)
            w = np.linalg.lstsq(A, b, rcond=None)[0]
            out[qi] = float(w[:m] @ nz)
        return pd.DataFrame({"cell_id": qs["rec_id"].to_numpy(),
                             "kriged_z": np.round(out, round_to)})

    both = coalesce_partials(cells_ds.union(dup))
    return (both.groupby("gkey").map_groups(per_group, batch_format="pandas")
            .sort("cell_id"))


# ---------------------------------------------------------------------------
# Single-process mirror (tests)
# ---------------------------------------------------------------------------

def krige_cells_naive(sf_dir: str, k: int = K_NEIGHBORS,
                      round_to: int = 4) -> pd.DataFrame:
    pts = read_points(sf_dir).to_pandas()
    x = pts["x"].to_numpy(); y = pts["y"].to_numpy()
    z = pts["z"].to_numpy(); r = pts["rec_id"].to_numpy()
    # brute-force variogram
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    m = (d2 > 0) & (d2 < MAX_DIST * MAX_DIST) & (r[:, None] < r[None, :])
    d = np.sqrt(d2[m])
    hsq = 0.5 * ((z[:, None] - z[None, :]) ** 2)[m]
    bins = np.minimum((d / LAG_SIZE).astype(np.int64), N_LAGS - 1)
    df = pd.DataFrame({"bin": bins, "hsq": hsq, "d": d, "one": 1})
    gg = (df.groupby("bin").agg(n=("one", "sum"), ssq=("hsq", "sum"),
                                sd=("d", "sum")).reset_index())
    gg["gamma"] = gg["ssq"] / gg["n"]
    gg["mean_dist"] = gg["sd"] / gg["n"]
    sill, rng = fit_spherical(gg)
    rows = []
    for c in cell_centers():
        qd2 = (x - c["cx"]) ** 2 + (y - c["cy"]) ** 2
        inr = np.flatnonzero(qd2 < MAX_DIST * MAX_DIST)
        if len(inr) == 0:
            rows.append({"cell_id": c["cell_id"], "kriged_z": NODATA})
            continue
        order = inr[np.lexsort((r[inr], qd2[inr]))][:k]
        nx, ny, nz = x[order], y[order], z[order]
        nd = np.sqrt(qd2[order])
        mm = len(order)
        dij = np.sqrt((nx[:, None] - nx[None, :]) ** 2
                      + (ny[:, None] - ny[None, :]) ** 2)
        A = np.ones((mm + 1, mm + 1))
        A[:mm, :mm] = spherical(dij, sill, rng)
        A[mm, mm] = 0.0
        b = np.ones(mm + 1)
        b[:mm] = spherical(nd, sill, rng)
        w = np.linalg.lstsq(A, b, rcond=None)[0]
        rows.append({"cell_id": c["cell_id"],
                     "kriged_z": round(float(w[:mm] @ nz), round_to)})
    return pd.DataFrame(rows).sort_values("cell_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# RadialBasisFunctionInterpolation (Scripts/RadialBasisFunctionInterpolation
# .groovy, 686 LoC): per output cell, solve the RBF system over the
# nearby samples — the SAME duplication-shuffle plan as ordinary
# kriging, with the multiquadric kernel φ(d) = √(d² + ε²) in place of
# the variogram matrix (no global fit pass needed).
# ---------------------------------------------------------------------------

def _mq(d: np.ndarray, eps: float) -> np.ndarray:
    return np.sqrt(d * d + eps * eps)


def rbf_cells(sf_dir: str, k: int = K_NEIGHBORS, eps: float = 50.0,
              round_to: int = 4) -> "rd.Dataset":
    """Multiquadric RBF prediction at the query cell centres:
    (cell_id, rbf_z)."""
    pitch = MAX_DIST
    cells = cell_centers()
    cx = np.array([c["cx"] for c in cells])
    cy = np.array([c["cy"] for c in cells])
    cid = np.array([c["cell_id"] for c in cells], dtype=np.int64)
    gkey, _, _ = _grid_key(cx, cy, pitch)
    import pyarrow as pa
    cells_ds = rd.from_arrow(pa.table(
        {"gkey": gkey, "dup": np.full(len(cid), 2, dtype=np.int64),
         "rec_id": cid, "x": cx, "y": cy, "z": np.zeros(len(cid))}))
    dup = read_points(sf_dir).map_batches(
        lambda b: _duplicate(b, pitch), batch_format="numpy")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        qs = g[g["dup"] == 2]
        ps = g[g["dup"] != 2].drop_duplicates("rec_id")
        if len(qs) == 0:
            return pd.DataFrame({"cell_id": pd.Series([], dtype="int64"),
                                 "rbf_z": pd.Series([], dtype="float64")})
        px = ps["x"].to_numpy(); py = ps["y"].to_numpy()
        pz = ps["z"].to_numpy(); pr = ps["rec_id"].to_numpy()
        out = np.full(len(qs), NODATA)
        for qi, (qx, qy) in enumerate(zip(qs["x"].to_numpy(),
                                          qs["y"].to_numpy())):
            if len(ps) == 0:
                continue
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            inr = np.flatnonzero(d2 < pitch * pitch)
            if len(inr) == 0:
                continue
            order = inr[np.lexsort((pr[inr], d2[inr]))][:k]
            nx, ny, nz = px[order], py[order], pz[order]
            m = len(order)
            dij = np.sqrt((nx[:, None] - nx[None, :]) ** 2
                          + (ny[:, None] - ny[None, :]) ** 2)
            A = _mq(dij, eps)
            w = np.linalg.lstsq(A, nz, rcond=None)[0]
            out[qi] = float(w @ _mq(np.sqrt(d2[order]), eps))
        return pd.DataFrame({"cell_id": qs["rec_id"].to_numpy(),
                             "rbf_z": np.round(out, round_to)})

    both = coalesce_partials(cells_ds.union(dup))
    return (both.groupby("gkey").map_groups(per_group, batch_format="pandas")
            .sort("cell_id"))


def rbf_cells_naive(sf_dir: str, k: int = K_NEIGHBORS, eps: float = 50.0,
                    round_to: int = 4) -> pd.DataFrame:
    pts = read_points(sf_dir).to_pandas()
    x = pts["x"].to_numpy(); y = pts["y"].to_numpy()
    z = pts["z"].to_numpy(); r = pts["rec_id"].to_numpy()
    rows = []
    for c in cell_centers():
        qd2 = (x - c["cx"]) ** 2 + (y - c["cy"]) ** 2
        inr = np.flatnonzero(qd2 < MAX_DIST * MAX_DIST)
        if len(inr) == 0:
            rows.append({"cell_id": c["cell_id"], "rbf_z": NODATA})
            continue
        order = inr[np.lexsort((r[inr], qd2[inr]))][:k]
        nx, ny, nz = x[order], y[order], z[order]
        dij = np.sqrt((nx[:, None] - nx[None, :]) ** 2
                      + (ny[:, None] - ny[None, :]) ** 2)
        w = np.linalg.lstsq(_mq(dij, eps), nz, rcond=None)[0]
        rows.append({"cell_id": c["cell_id"],
                     "rbf_z": round(float(w @ _mq(np.sqrt(qd2[order]), eps)),
                                    round_to)})
    return pd.DataFrame(rows).sort_values("cell_id").reset_index(drop=True)
