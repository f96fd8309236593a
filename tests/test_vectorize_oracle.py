"""Round-4: the raster_to_polygons oracle rests on one claim — the
impl's ring trace (with the used-edge filter and the
sharpest-clockwise-turn saddle rule, stages/vectorize._assemble) equals
the cycle decomposition of the PURE successor permutation the SQL
pointer-doubles over. This fuzz suite establishes the claim on random
grids with corner-touching regions and NoData holes, plus the pairing
injectivity it relies on."""

import numpy as np
import pandas as pd
import pytest

from whitebox_geospatial_analysis_tools_ray.stages import vectorize as V


def _edges_of(cls: np.ndarray) -> pd.DataFrame:
    H, W = cls.shape
    out = {"value": [], "sx": [], "sy": [], "ex": [], "ey": []}
    pad = np.full((H + 2, W + 2), -1, dtype=np.int64)
    pad[1:-1, 1:-1] = cls
    c_cls = pad[1:-1, 1:-1]
    for (dr, dc), (cx0, cy0), (dx, dy) in V._SIDES:
        nb = pad[1 + dr:1 + H + dr, 1 + dc:1 + W + dc]
        m = (c_cls >= 0) & (c_cls != nb)
        rr, cc = np.nonzero(m)
        if not len(rr):
            continue
        sx = cc + cx0
        sy = rr + cy0
        out["value"].append(c_cls[rr, cc])
        out["sx"].append(sx)
        out["sy"].append(sy)
        out["ex"].append(sx + dx)
        out["ey"].append(sy + dy)
    if not out["value"]:
        return pd.DataFrame({k: pd.Series([], dtype="int64")
                             for k in out})
    return pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})


def _perm_rings(df: pd.DataFrame) -> tuple[int, bool]:
    """Cycle count of the pure successor permutation (the SQL model:
    no used-filter) + whether succ is injective."""
    from collections import defaultdict
    sx, sy, ex, ey = (df[c].to_numpy() for c in ("sx", "sy", "ex", "ey"))
    n = len(sx)
    outm = defaultdict(list)
    for j in range(n):
        outm[(sx[j], sy[j])].append(j)
    succ = np.full(n, -1)
    for i in range(n):
        din = (ex[i] - sx[i], ey[i] - sy[i])
        cands = outm.get((ex[i], ey[i]), [])

        def key(j):
            dout = (ex[j] - sx[j], ey[j] - sy[j])
            cross = din[0] * dout[1] - din[1] * dout[0]
            dot = din[0] * dout[0] + din[1] * dout[1]
            return (-cross, -dot, j)

        succ[i] = min(cands, key=key)
    inj = len(set(succ.tolist())) == n
    seen = np.zeros(n, bool)
    rings = 0
    for s in range(n):
        if seen[s]:
            continue
        rings += 1
        i = s
        while not seen[i]:
            seen[i] = True
            i = succ[i]
    return rings, inj


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_impl_rings_equal_permutation_cycles(seed):
    rng = np.random.RandomState(seed)
    for _ in range(120):
        H, W = rng.randint(2, 8), rng.randint(2, 8)
        cls = rng.randint(0, 3, (H, W))
        if rng.rand() < 0.4:
            cls[rng.rand(H, W) < 0.25] = -1      # NoData holes
        df = _edges_of(cls)
        for _, g in df.groupby("value"):
            g = g.reset_index(drop=True)
            r_impl, per, _a2 = V._assemble(g)
            r_perm, inj = _perm_rings(g)
            assert inj, "saddle pairing must be a proper matching"
            assert r_impl == r_perm
            assert per == len(g)


def test_corner_touch_splits_rings():
    """Two diagonal same-class cells: the clockwise-sharpest rule keeps
    them as TWO rings (the pinch-split convention) on both models."""
    cls = np.array([[1, 0], [0, 1]])
    df = _edges_of(cls)
    g = df[df["value"] == 1].reset_index(drop=True)
    r_impl, _, _ = V._assemble(g)
    r_perm, inj = _perm_rings(g)
    assert r_impl == r_perm == 2 and inj
