"""Round-4 verdict item 6: hypothesis property suite pinning the
vectorized page extractor to the scalar first-occurrence extractor on
ARBITRARY bytes — nested/unclosed tags, NULs, non-UTF8 bytes, multiple
template-marker occurrences, sliced/chunked Arrow layouts. Equivalence
means: identical extracted string, or the identical exception class
(ValueError when a marker is missing, UnicodeDecodeError when the span
is not UTF-8) — the vectorized path must never turn one into the
other, nor succeed where the scalar path raises."""

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from whitebox_geospatial_analysis_tools_ray.sources import pages


def _scalar_outcome(h: bytes):
    try:
        return ("ok", pages.extract_text_bytes(h))
    except Exception as ex:
        return ("err", type(ex).__name__)


def _vector_outcome(h: bytes):
    arr = pa.array([h], type=pa.binary())
    try:
        return ("ok", pages.extract_texts(arr)[0])
    except Exception as ex:
        return ("err", type(ex).__name__)


junk = st.binary(max_size=60)
payload_text = st.text(max_size=80)   # arbitrary unicode incl. NUL/controls


@settings(max_examples=250, deadline=None)
@given(junk1=junk, junk2=junk, junk3=junk)
def test_injected_markers_arbitrary_junk(junk1, junk2, junk3):
    """MID and SUFFIX injected between arbitrary byte junk (which may
    itself contain more markers, NULs, invalid UTF-8): per-row outcome
    identity with the scalar extractor."""
    h = junk1 + pages.HTML_MID + junk2 + pages.HTML_SUFFIX + junk3
    assert _vector_outcome(h) == _scalar_outcome(h)


@settings(max_examples=250, deadline=None)
@given(h=st.binary(max_size=200))
def test_totally_arbitrary_bytes(h):
    """Raw arbitrary bytes — usually missing the template markers, so
    both paths must raise the same exception class."""
    assert _vector_outcome(h) == _scalar_outcome(h)


@settings(max_examples=200, deadline=None)
@given(url=st.binary(max_size=40), text=payload_text)
def test_templated_pages_with_adversarial_payload(url, text):
    """Well-formed template rows whose url/text regions carry
    adversarial content (unclosed tags survive escaping of < >, NULs
    and controls pass through raw)."""
    h = (pages.HTML_PREFIX + url + pages.HTML_MID
         + pages._escape(text).encode("utf-8") + pages.HTML_SUFFIX)
    assert _vector_outcome(h) == _scalar_outcome(h)


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(
    st.tuples(st.binary(max_size=30), payload_text), min_size=1,
    max_size=12),
    start=st.integers(min_value=0, max_value=5),
    split=st.integers(min_value=0, max_value=12))
def test_batch_layouts_match_scalar(rows, start, split):
    """Multi-row arrays under slice offsets and chunking: every
    extractable row equals the scalar result regardless of Arrow
    buffer layout."""
    htmls = [pages.HTML_PREFIX + u + pages.HTML_MID
             + pages._escape(t).encode("utf-8") + pages.HTML_SUFFIX
             for u, t in rows]
    want = [pages.extract_text_bytes(h) for h in htmls]
    arr = pa.array(htmls, type=pa.binary())
    assert pages.extract_texts(arr) == want
    s = min(start, len(htmls))
    assert pages.extract_texts(arr.slice(s)) == want[s:]
    sp = min(split, len(htmls))
    chunked = pa.chunked_array([arr.slice(0, sp), arr.slice(sp)])
    assert pages.extract_texts(chunked) == want


def test_null_cell_raises_like_scalar():
    arr = pa.array([None], type=pa.binary())
    with pytest.raises(TypeError):
        pages.extract_texts(arr)
