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


def test_ellipsoid_table_lookup():
    from whitebox_geospatial_analysis_tools_ray.functions import crs
    assert crs.get_ellipsoid("wgs84") == (6378137.0, 6356752.314)
    assert crs.get_ellipsoid("Clarke 1866") == (6378206.4, 6356583.80)
    assert crs.get_ellipsoid("clarke1866") == (6378206.4, 6356583.80)
    assert len(crs.ELLIPSOIDS) == 27        # the reference enum's 27 rows
    import pytest
    with pytest.raises(KeyError):
        crs.get_ellipsoid("no such spheroid")


def test_molodensky_roundtrip_small_residual():
    """datum→WGS84 after WGS84→datum returns within ~1e-7 deg (the
    abridged-formula asymmetry bound), for every datum in the table."""
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.functions import crs
    lat = np.array([45.0, -12.5, 60.25, 3.0])
    lon = np.array([-75.0, 30.5, -120.0, 150.75])
    h = np.zeros(4)
    for datum in crs.DATUMS:
        la, lo, hh = crs.wgs84_to_datum(lat, lon, h, datum)
        la2, lo2, h2 = crs.datum_to_wgs84(la, lo, hh, datum)
        assert np.abs(la2 - lat).max() < 5e-6   # abridged-formula asymmetry
        assert np.abs(lo2 - lon).max() < 5e-6
        assert np.abs(h2 - h).max() < 0.5


def test_nad27_shift_magnitude_is_physical():
    """NAD27 CONUS shift at a CONUS point moves coordinates by tens of
    metres (the well-known ~10–100 m NAD27/WGS84 separation), not 0 and
    not kilometres."""
    import numpy as np

    from whitebox_geospatial_analysis_tools_ray.functions import crs
    la, lo, _ = crs.wgs84_to_datum(np.array([39.0]), np.array([-98.0]),
                                   np.zeros(1), "NAD27 (CONUS)")
    dm = np.hypot((la[0] - 39.0) * 111_000.0,
                  (lo[0] + 98.0) * 111_000.0 * np.cos(np.radians(39.0)))
    assert 5.0 < dm < 300.0


def test_utm_project_datum_matches_oracle(ray_session):
    import duckdb

    from whitebox_geospatial_analysis_tools_ray.functions import crs
    sf = "/root/testdata/sf0.001"
    got = crs.utm_project_datum_query(sf).to_pandas() \
        .sort_values("rec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(crs.utm_project_datum_sql()).fetchdf() \
        .sort_values("rec_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
