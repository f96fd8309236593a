"""LL↔UTM transform (functions/crs.py vs LL2UTM.java semantics)."""

import numpy as np

from whitebox_geospatial_analysis_tools_ray.functions import crs


def test_central_meridian_exact():
    # on the central meridian: easting exactly 500000; equator northing 0;
    # 45°N northing = meridian arc(45°, WGS-84) × k0
    e, n, z = crs.ll_to_utm(0.0, 3.0)
    assert (float(e), float(n), int(z)) == (500000.0, 0.0, 31)
    e, n, _ = crs.ll_to_utm(45.0, 3.0)
    assert float(e) == 500000.0
    assert abs(float(n) - 4984944.378 * 0.9996) < 0.05


def test_known_point_cn_tower():
    # published UTM of 43.6426N 79.3871W: zone 17, ~630084 E, ~4833439 N
    e, n, z = crs.ll_to_utm(43.6426, -79.3871)
    assert int(z) == 17
    assert abs(float(e) - 630084) < 10 and abs(float(n) - 4833439) < 10


def test_roundtrip_accuracy():
    lat = np.linspace(-79, 79, 25)
    lon = np.linspace(-179, 179, 25)
    LA, LO = np.meshgrid(lat, lon)
    la, lo = LA.ravel(), LO.ravel()
    E, N, Z = crs.ll_to_utm(la, lo)
    s = la < 0
    la2 = np.empty_like(la)
    lo2 = np.empty_like(lo)
    la2[~s], lo2[~s] = crs.utm_to_ll(E[~s], N[~s], Z[~s])
    la2[s], lo2[s] = crs.utm_to_ll(E[s], N[s], Z[s], southern=True)
    assert np.abs(la2 - la).max() < 1e-7
    assert np.abs(lo2 - lo).max() < 1e-7


def test_southern_hemisphere_false_northing():
    _, n, _ = crs.ll_to_utm(-0.001, 3.0)
    assert 9_999_000 < float(n) < 10_000_000


def test_utm_project_query_matches_oracle(ray_session, duck):
    got = (crs.utm_project_query("/root/testdata/sf0.001").to_pandas()
           .sort_values("rec_id").reset_index(drop=True))
    want = (duck.execute(crs.utm_project_sql()).df()
            .sort_values("rec_id").reset_index(drop=True))
    assert got.shape == want.shape
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
