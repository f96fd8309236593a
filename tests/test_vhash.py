"""stages/vhash: the vectorized table-driven CRC32 must be
bit-identical to zlib.crc32 over arbitrary bytes (the DuckDB oracles
replay the zlib-exact fold, so any divergence is a correctness break,
not a perf nit) — round-4 verdict item 4."""

import zlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from whitebox_geospatial_analysis_tools_ray.stages.vhash import (
    crc32_arrow_strings, crc32_rows)


def _pack(rows):
    buf = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offs = np.concatenate(
        [[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    return buf, offs


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=0,
                max_size=40))
def test_crc32_rows_matches_zlib_on_arbitrary_bytes(rows):
    buf, offs = _pack(rows)
    got = crc32_rows(buf, offs)
    want = np.array([zlib.crc32(r) for r in rows], dtype=np.int64)
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=120), min_size=0,
                max_size=30))
def test_crc32_arrow_strings_matches_zlib_utf8(strings):
    col = pa.chunked_array([pa.array(strings, pa.string())])
    got = crc32_arrow_strings(col)
    want = np.array([zlib.crc32(s.encode("utf-8")) for s in strings],
                    dtype=np.int64)
    assert np.array_equal(got, want)


def test_crc32_arrow_slices_chunks_and_large_string():
    urls = ["https://example.com/%d/ünïcode-%d" % (i, i * 7)
            for i in range(3000)]
    want = np.array([zlib.crc32(u.encode("utf-8")) for u in urls],
                    dtype=np.int64)
    # multi-chunk
    col = pa.chunked_array([pa.array(urls[:1700]), pa.array(urls[1700:])])
    assert np.array_equal(crc32_arrow_strings(col), want)
    # non-zero array offset (sliced child keeps the parent buffer)
    sl = pa.array(urls).slice(137, 500)
    assert np.array_equal(crc32_arrow_strings(sl), want[137:637])
    # large_string (8-byte offsets)
    big = pa.array(urls, pa.large_string())
    assert np.array_equal(crc32_arrow_strings(big), want)
    # empty
    assert len(crc32_arrow_strings(pa.array([], pa.string()))) == 0


def test_url_ids_arrow_delegates_to_vectorized_crc():
    from whitebox_geospatial_analysis_tools_ray.pipelines.pages_flagship import (
        url_ids, url_ids_arrow)

    urls = ["https://w%d.example.org/p?q=%d" % (i, i) for i in range(500)]
    got = url_ids_arrow(pa.chunked_array([pa.array(urls)]))
    assert np.array_equal(got, url_ids(urls))
