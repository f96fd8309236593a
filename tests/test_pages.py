"""Byte-identical text extraction (BASELINE.json input_hint invariant)."""

import numpy as np

from whitebox_geospatial_analysis_tools_ray.sources import pages


def test_extract_text_byte_identical():
    df = pages.make_pages(500)
    for h, t in zip(df["html"], df["text"]):
        assert pages.extract_text_bytes(h) == t  # byte-for-byte


def test_pages_deterministic():
    a = pages.make_pages(200)
    b = pages.make_pages(200)
    assert a.equals(b)
    assert a["url"].is_unique


def test_extract_stage_roundtrip(tmp_path, ray_session):
    import ray.data as rd
    path = str(tmp_path / "pages.parquet")
    pages.write_pages(300, path)
    ds = rd.read_parquet(path)
    out = pages.extract_text_stage(ds).to_pandas()
    assert (out["extracted"] == out["text"]).all()


def test_escape_roundtrip():
    tricky = 'a <b> & "c" &amp; <'
    assert pages._unescape(pages._escape(tricky)) == tricky


def test_pages_flagship_matches_naive(tmp_path, ray_session):
    """Distributed pages flagship == single-process pandas mirror."""
    import numpy as np
    import pandas as pd
    import zlib

    from whitebox_geospatial_analysis_tools_ray.core.features import seeded_polygons
    from whitebox_geospatial_analysis_tools_ray.core.rng import (
        EAST, NORTH, SOUTH, WEST, geocode_xy)
    from whitebox_geospatial_analysis_tools_ray.core.tiles import RectGrid
    from whitebox_geospatial_analysis_tools_ray.core.geom import points_in_polygon
    from whitebox_geospatial_analysis_tools_ray.pipelines.pages_flagship import (
        pages_flagship)
    from whitebox_geospatial_analysis_tools_ray.sources.pages import (
        extract_text_bytes, generate_pages_dataset, make_pages)

    d = generate_pages_dataset(5_000, str(tmp_path / "pages"))
    got = (pages_flagship(d).to_pandas()
           .sort_values(["tile_id", "zone_id"]).reset_index(drop=True))

    df = make_pages(5_000)
    texts = [extract_text_bytes(bytes(h)) for h in df["html"]]
    ids = np.array([zlib.crc32(u.encode()) for u in df["url"]], dtype=np.int64)
    x, y = geocode_xy(ids)
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    grid = RectGrid.from_extent(WEST, SOUTH, EAST, NORTH,
                                width_x=250.0, width_y=250.0)
    rows = []
    for z in seeded_polygons():
        hit = points_in_polygon(x, y, z["polygon"])
        if hit.any():
            rows.append(pd.DataFrame({
                "tile_id": grid.tile_of(x[hit], y[hit]),
                "zone_id": z["zone_id"], "chars": n_chars[hit]}))
    want = (pd.concat(rows).groupby(["tile_id", "zone_id"], as_index=False)
            .agg(n_pages=("chars", "size"), sum_chars=("chars", "sum"))
            .sort_values(["tile_id", "zone_id"]).reset_index(drop=True))
    want["n_pages"] = want["n_pages"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_pages_flagship_skewed_matches_naive(tmp_path, ray_session):
    """Skewed corpus (50% of rows collapsed onto ONE duplicate page →
    one mega-hot tile/zone) still aggregates exactly: the hot key's
    n_pages equals the collapsed-row count and the distributed result
    matches the single-process mirror."""
    import numpy as np
    import pandas as pd
    import zlib

    from whitebox_geospatial_analysis_tools_ray.core.features import seeded_polygons
    from whitebox_geospatial_analysis_tools_ray.core.rng import (
        EAST, NORTH, SOUTH, WEST, geocode_xy)
    from whitebox_geospatial_analysis_tools_ray.core.tiles import RectGrid
    from whitebox_geospatial_analysis_tools_ray.core.geom import points_in_polygon
    from whitebox_geospatial_analysis_tools_ray.pipelines.pages_flagship import (
        pages_flagship)
    from whitebox_geospatial_analysis_tools_ray.sources.pages import (
        extract_text_bytes, generate_pages_dataset, make_pages_ids, skew_ids)

    n = 5_000
    d = generate_pages_dataset(n, str(tmp_path / "pages_skew"), hot_frac=0.5)
    got = (pages_flagship(d).to_pandas()
           .sort_values(["tile_id", "zone_id"]).reset_index(drop=True))

    ids0 = skew_ids(np.arange(n, dtype=np.int64), 0.5)
    assert 0.4 < (ids0 == 42).mean() < 0.6  # the skew is actually there
    df = make_pages_ids(ids0)
    texts = [extract_text_bytes(bytes(h)) for h in df["html"]]
    ids = np.array([zlib.crc32(u.encode()) for u in df["url"]], dtype=np.int64)
    x, y = geocode_xy(ids)
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    grid = RectGrid.from_extent(WEST, SOUTH, EAST, NORTH,
                                width_x=250.0, width_y=250.0)
    rows = []
    for z in seeded_polygons():
        hit = points_in_polygon(x, y, z["polygon"])
        if hit.any():
            rows.append(pd.DataFrame({
                "tile_id": grid.tile_of(x[hit], y[hit]),
                "zone_id": z["zone_id"], "chars": n_chars[hit]}))
    want = (pd.concat(rows).groupby(["tile_id", "zone_id"], as_index=False)
            .agg(n_pages=("chars", "size"), sum_chars=("chars", "sum"))
            .sort_values(["tile_id", "zone_id"]).reset_index(drop=True))
    want["n_pages"] = want["n_pages"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
