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
