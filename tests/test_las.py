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
