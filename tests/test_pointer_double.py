"""Property tests for the pointer-doubling resolvers that replaced the
per-cell ascending-z walks (hydro._pointer_double / _pointer_double_add):
on random acyclic functional graphs the doubled result must equal a
literal chain-following loop, for any chain depth and terminal layout."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from whitebox_geospatial_analysis_tools_ray.stages.hydro import (
    _pointer_double, _pointer_double_add, _pointer_targets)


def _random_dag(rng, n):
    """Random functional graph where nxt[u] < u (acyclic chains) and a
    random subset of nodes are terminals (nxt = self)."""
    done = rng.random(n) < 0.3
    done[0] = True  # node 0 must be terminal (no smaller node)
    nxt = np.arange(n)
    for u in range(1, n):
        if not done[u]:
            nxt[u] = rng.integers(0, u)
    return done, nxt


@given(st.integers(1, 400), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_pointer_double_equals_chain_walk(n, seed):
    rng = np.random.default_rng(seed)
    done, nxt = _random_dag(rng, n)
    val = np.where(done, rng.integers(-1, 100, n), -999).astype(np.int64)

    got = _pointer_double(val.copy(), done.copy(), nxt.copy())

    want = val.copy()
    for u in range(n):
        v = u
        while not done[v]:
            v = nxt[v]
        want[u] = val[v]
    np.testing.assert_array_equal(got, want)


@given(st.integers(1, 400), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_pointer_double_add_equals_chain_sum(n, seed):
    rng = np.random.default_rng(seed)
    done, nxt = _random_dag(rng, n)
    # integer steps so float addition order cannot matter
    add = np.where(done, 0, rng.integers(0, 7, n)).astype(np.float64)
    val = np.where(done, rng.integers(0, 50, n), 0).astype(np.float64)

    got = _pointer_double_add(add.copy(), val.copy(), done.copy(),
                              nxt.copy())

    want = np.empty(n)
    for u in range(n):
        v, s = u, 0.0
        while not done[v]:
            s += add[v]
            v = nxt[v]
        want[u] = s + val[v]
    np.testing.assert_array_equal(got, want)


@given(st.integers(0, 2**32 - 1), st.integers(4, 14), st.integers(4, 14))
@settings(max_examples=30, deadline=None)
def test_pointer_targets_matches_scalar_decode(seed, H, W):
    """_pointer_targets decodes the D8 code per cell exactly as the
    scalar bit_length walk did, including nodata and border cases."""
    from whitebox_geospatial_analysis_tools_ray.stages.terrain import (
        _DX, _DY, d8_kernel)

    rng = np.random.default_rng(seed)
    nodata = -32768.0
    z = rng.uniform(0, 100, (H, W))
    z[rng.random((H, W)) < 0.15] = nodata
    pad = np.full((H + 2, W + 2), nodata)
    pad[1:-1, 1:-1] = z
    ptr = d8_kernel(pad, nodata)[1:-1, 1:-1]

    lin, in_tile, r2, c2, has = _pointer_targets(z, ptr, nodata)
    for r in range(H):
        for c in range(W):
            code = ptr[r, c]
            expect_has = (z[r, c] != nodata and code != nodata
                          and code > 0)
            assert bool(has[r, c]) == expect_has
            if not expect_has:
                continue
            i = int(code).bit_length() - 1
            rr, cc = r + _DY[i], c + _DX[i]
            assert (r2[r, c], c2[r, c]) == (rr, cc)
            inside = 0 <= rr < H and 0 <= cc < W
            assert bool(in_tile[r, c]) == inside
            if inside:
                assert lin[r, c] == rr * W + cc
