"""TAS .vtr roundtrip through indexed byte-range record reads."""

import numpy as np

from whitebox_geospatial_analysis_tools_ray.sources import tas_vector as tv


def test_tas_vector_roundtrip(tmp_path, ray_session):
    g = np.random.default_rng(17)
    feats = []
    for i in range(200):
        nv = int(g.integers(1, 9))
        feats.append({"value": float(np.float32(g.uniform(0, 50))),
                      "xs": g.uniform(100, 900, nv),
                      "ys": g.uniform(200, 800, nv)})
    p = str(tmp_path / "t.vtr")
    tv.write_tas_vector(p, feats, west=100.0, south=200.0,
                        north=800.0, east=900.0)
    hdr, recs = tv.index_tas_vector(p)
    assert len(recs) == 200
    assert hdr["west"] == 100.0 and hdr["north"] == 800.0

    df = (tv.read_tas_vector(p, records_per_task=64).to_pandas()
          .sort_values("rec_id").reset_index(drop=True))
    assert len(df) == 200
    assert (df["rec_id"].to_numpy() == np.arange(1, 201)).all()
    assert (df["n_vertices"].to_numpy()
            == np.array([len(f["xs"]) for f in feats])).all()
    np.testing.assert_allclose(df["value"].to_numpy(),
                               [f["value"] for f in feats], rtol=1e-6)
    # f32 quantization bound on coordinates
    np.testing.assert_allclose(
        df["first_x"].to_numpy(), [f["xs"][0] for f in feats], atol=1e-3)
