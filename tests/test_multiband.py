"""Raw multiband (BSQ/BIL/BIP) roundtrip through byte-range reads."""

import numpy as np
import pytest

from whitebox_geospatial_analysis_tools_ray.sources import multiband as mb


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_multiband_roundtrip(tmp_path, ray_session, interleave):
    g = np.random.default_rng(33)
    cube = g.uniform(0, 1000, (3, 41, 29)).astype(np.float32).astype(np.float64)
    p = str(tmp_path / f"{interleave}.raw")
    hdr = mb.write_multiband(p, cube, interleave, header_offset=100)
    for band in range(3):
        ds = mb.import_multiband(p, hdr, band, tile_rows=16)
        frames = ds.to_pandas().sort_values("tile_id")
        got = np.vstack([np.asarray(r.data).reshape(-1, 29)
                         for r in frames.itertuples()])
        np.testing.assert_array_equal(got, cube[band])
