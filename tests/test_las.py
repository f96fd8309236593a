"""LAS 1.2 reader/writer roundtrip + distributed chunked read."""

import numpy as np

from whitebox_geospatial_analysis_tools_ray.sources import las


def test_las_roundtrip(tmp_path, ray_session):
    g = np.random.default_rng(5)
    n = 1000
    x = g.uniform(0, 4000, n)
    y = g.uniform(0, 4000, n)
    z = g.uniform(0, 900, n)
    inten = g.integers(0, 4096, n)
    cls = g.integers(1, 8, n)
    p = str(tmp_path / "t.las")
    las.write_las(p, x, y, z, inten, cls)

    hdr = las.read_las_header(p)
    assert hdr.version == (1, 2)
    assert hdr.n_points == n
    assert hdr.point_format == 0

    df = las.read_las(p, chunk_points=256).to_pandas()
    assert len(df) == n
    # quantized to scale 1/1024 → within half a quantum, exactly dyadic
    assert np.abs(df["x"].to_numpy() - x).max() <= las.SCALE / 2 + 1e-12
    assert (df["intensity"].to_numpy() == inten).all()
    assert (df["classification"].to_numpy() == cls).all()
    # chunk boundaries must not duplicate or drop records
    df2 = las.read_las(p, chunk_points=1000000).to_pandas()
    assert (df.sort_values(["x", "y"]).reset_index(drop=True)
            == df2.sort_values(["x", "y"]).reset_index(drop=True)).all().all()


def test_las_rejects_non_las(tmp_path):
    p = str(tmp_path / "x.las")
    open(p, "wb").write(b"NOPE" + b"\0" * 300)
    try:
        las.read_las_header(p)
        assert False
    except ValueError:
        pass


def test_isolate_ground_points_matches_literal_order_walk():
    """Distributed pair-extraction + driver replay vs the literal
    O(n²) index-order walk (incl. the already-marked centre skip and
    the equal-z → neighbour-marked branch)."""
    import math

    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.sources.las import (
        isolate_ground_points, read_las, synth_las_path)

    sf = "/root/testdata/sf0.001"
    got = isolate_ground_points(sf)
    df = read_las(synth_las_path(sf)).to_pandas()
    x = df["x"].to_numpy(); y = df["y"].to_numpy(); z = df["z"].to_numpy()
    n = len(df)
    thr = math.tan(math.radians(30.0))
    off = np.zeros(n, dtype=bool)
    d2 = (x[:, None] - x) ** 2 + (y[:, None] - y) ** 2
    for a in range(n):
        if off[a]:
            continue
        for b in range(n):
            dd = d2[a, b]
            if dd == 0.0 or dd > 600.0 * 600.0:
                continue
            dist = math.sqrt(dd)
            if z[a] > z[b]:
                hi, ediff = a, z[a] - z[b]
            else:
                hi, ediff = b, z[b] - z[a]
            if ediff / dist > thr and ediff > 0.15:
                off[hi] = True
    assert int(got["n_off_terrain"].iloc[0]) == int(off.sum())
    assert int(got["sum_off_index"].iloc[0]) == int(np.flatnonzero(off).sum())
