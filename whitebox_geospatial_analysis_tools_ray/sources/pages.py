"""Synthetic Common-Crawl-style ``pages`` table + byte-identical extractor.

BASELINE.json input_hint: Parquet pages(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string); per-row invariant: extracted
text must be BYTE-IDENTICAL to the ``text`` column per url.

Generation (FIXTURES.md §1, seed embedded in the arithmetic — no RNG
state): tokens drawn by LCG per (doc, position), url from the doc id,
html = fixed template embedding the escaped text. The extractor
(:func:`extract_text`) inverts the template exactly; the pair is frozen
and the byte-equality is pytest-gated (tests/test_pages.py).

Zipf-style clustering of a fraction of rows into hot cells (skew case)
comes from the geocode rule applied to a truncated id space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_WORDS = (
    "the of and to in is that it was for on are as with his they at be this "
    "have from or had by word but not what all were we when your can said "
    "there use an each which she do how their if will up other about out many "
    "then them these so some her would make like him into time has look two "
    "more write go see number no way could people my than first water been "
    "call who oil its now find long down day did get come made may part over").split()

_LANGS = ["en", "de", "fr", "es", "it"]

_M = 4294967296
_A = 2654435761
_B = 2246822519

HTML_PREFIX = b"<html><head><title>"
HTML_MID = b"</title></head><body><nav>site navigation | home | about</nav><p>"
HTML_SUFFIX = b"</p><footer>copyright notice - generated page</footer></body></html>"


def _escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(t: str) -> str:
    return t.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def make_pages(n: int, skew_frac: float = 0.2, n_hosts: int = 50) -> pd.DataFrame:
    return make_pages_ids(np.arange(n, dtype=np.int64), n_hosts=n_hosts)


def make_pages_ids(ids: np.ndarray, n_hosts: int = 50) -> pd.DataFrame:
    """Pages for an explicit id range — the task-parallel generation unit
    (rd.range(n) → map_batches(make_pages_ids) for the scaled corpus)."""
    ids = np.asarray(ids, dtype=np.int64)
    host = ids % n_hosts
    path_hash = (ids * _A + 17) % _M
    urls = [f"https://site{h}.example/{p:08x}" for h, p in zip(host, path_hash)]
    # warc_ts: fixed epoch + i*Δ with deterministic jitter
    base = np.int64(1_600_000_000_000_000)  # µs
    jitter = (ids * _B + 101) % 1_000_000
    ts = pd.to_datetime(base + ids * 60_000_000 + jitter, unit="us")
    lang = [(_LANGS[int(v)]) for v in (ids * _B + 7) % len(_LANGS)]
    texts = []
    for i in ids:
        ntok = 20 + int((i * _A + 31) % 180)
        idx = (i * 7919 + np.arange(ntok, dtype=np.int64) * 104729 + 13) % len(_WORDS)
        texts.append(" ".join(_WORDS[j] for j in idx))
    htmls = [HTML_PREFIX + u.encode() + HTML_MID + _escape(t).encode()
             + HTML_SUFFIX for u, t in zip(urls, texts)]
    return pd.DataFrame({"url": urls, "warc_ts": ts, "html": htmls,
                         "text": texts, "lang": lang})


def skew_ids(ids: np.ndarray, hot_frac: float, hot_id: int = 42) -> np.ndarray:
    """Collapse a deterministic ``hot_frac`` of ids onto ``hot_id`` —
    the worst-case web-corpus skew shape (templated duplicate pages):
    every collapsed row gets the SAME url, so the SAME geocode point,
    tile and zone. Used by the skew bench to show the flagship's
    per-batch partial aggregation absorbs a mega-hot key."""
    ids = np.asarray(ids, dtype=np.int64)
    if hot_frac <= 0.0:
        return ids
    hot = (ids * _B + 3) % 1000 < int(round(hot_frac * 1000))
    return np.where(hot, np.int64(hot_id), ids)


def generate_pages_dataset(n: int, out_dir: str,
                           rows_per_shard: int = 15_625,
                           hot_frac: float = 0.0) -> str:
    """Generate the scaled deterministic pages corpus as sharded Parquet
    under ``out_dir`` using Ray tasks (one shard per task). Idempotent:
    a ``_GENED`` marker with matching (n, hot_frac) short-circuits.
    ``hot_frac`` > 0 collapses that fraction of rows onto one duplicate
    page (one hot tile/zone — see :func:`skew_ids`). Returns out_dir."""
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    marker = os.path.join(out_dir, "_GENED")
    if os.path.exists(marker):
        m = json.load(open(marker))
        if m.get("n") == n and m.get("hot_frac", 0.0) == hot_frac:
            return out_dir
    # regenerating at a different n: wipe the directory first —
    # write_parquet APPENDS shard files, so stale shards from a previous
    # size would silently pollute the corpus
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    n_shards = (n + rows_per_shard - 1) // rows_per_shard

    def gen(batch) -> pd.DataFrame:
        frames = []
        for sid in batch["id"]:
            lo = int(sid) * rows_per_shard
            hi = min(lo + rows_per_shard, n)
            ids = skew_ids(np.arange(lo, hi, dtype=np.int64), hot_frac)
            frames.append(make_pages_ids(ids))
        return pd.concat(frames, ignore_index=True)

    # one block per shard (rd.range alone coalesces to ~2×CPUs blocks,
    # which would collapse the corpus into too few files to read in parallel)
    (rd.range(n_shards, override_num_blocks=n_shards)
     .map_batches(gen, batch_format="numpy", batch_size=1)
     .write_parquet(out_dir))
    with open(marker, "w") as f:
        json.dump({"n": n, "hot_frac": hot_frac}, f)
    return out_dir


def write_pages(n: int, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = make_pages(n)
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary()), ("text", pa.string()),
                        ("lang", pa.string())])
    pq.write_table(pa.Table.from_pandas(df, schema=schema,
                                        preserve_index=False), path)


def extract_text_bytes(html: bytes) -> str:
    """The frozen extractor: inverse of the page template, byte-exact."""
    start = html.index(HTML_MID) + len(HTML_MID)
    end = html.index(HTML_SUFFIX, start)
    return _unescape(html[start:end].decode("utf-8"))


# --- vectorized batch extractor ------------------------------------------
# Byte-identical to extract_text_bytes per row (property-tested in
# tests/test_pages.py): a numpy template-verification pass PROVES the
# first-occurrence searches resolve to the fixed template positions, and
# any row failing a check falls back to the scalar extractor. Proof
# sketch for the fast path (all checks vectorized):
#   * row prefix == HTML_PREFIX, and HTML_PREFIX contains no "/", so no
#     HTML_MID occurrence can start inside the prefix;
#   * HTML_MID starts with "<" and the first "<" at/after the prefix end
#     is where we verify HTML_MID — so it is the FIRST occurrence, and
#     the url region before it is "<"-free by construction of the search;
#   * HTML_SUFFIX starts with "<" and the text span [start, end) contains
#     no "<", so the verified row-tail HTML_SUFFIX is the first
#     occurrence at/after start — exactly html.index(HTML_SUFFIX, start).

_PRE_A = np.frombuffer(HTML_PREFIX, dtype=np.uint8)
_MID_A = np.frombuffer(HTML_MID, dtype=np.uint8)
_SUF_A = np.frombuffer(HTML_SUFFIX, dtype=np.uint8)
_LT = ord("<")
_AMP = ord("&")


def _template_spans(data: np.ndarray, offs: np.ndarray):
    """Per-row (start, end, n_amp, ok) over a concatenated binary buffer.

    ``ok`` rows are proven equivalent to the scalar first-occurrence
    extractor; ``n_amp`` counts '&' bytes in the text span so unescape
    can be skipped when zero (the common web-template case)."""
    n = len(offs) - 1
    npre, nmid, nsuf = len(_PRE_A), len(_MID_A), len(_SUF_A)
    base = offs[:-1]
    row_end = offs[1:]
    ok = (row_end - base) >= (npre + nmid + nsuf)
    nd = len(data)

    def _match_at(pos: np.ndarray, pat: np.ndarray) -> np.ndarray:
        if nd < len(pat):
            return np.zeros(len(pos), dtype=bool)
        # clamp the POSITION vector (n) instead of the gather matrix
        # (n × len(pat)); clamped rows were already ok=False from the
        # row-length check, so their compare result is discarded
        p = np.minimum(np.maximum(pos, 0), nd - len(pat))
        return (data[p[:, None] + np.arange(len(pat))] == pat).all(axis=1)

    ok &= _match_at(base, _PRE_A)
    ok &= _match_at(row_end - nsuf, _SUF_A)
    # first '<' at/after the prefix end = the HTML_MID candidate
    lt_pos = np.flatnonzero(data == _LT)
    j = np.searchsorted(lt_pos, base + npre)
    has = j < len(lt_pos)
    mid_start = (lt_pos[np.minimum(j, len(lt_pos) - 1)]
                 if len(lt_pos) else np.zeros(n, dtype=np.int64))
    mid_start = np.where(has, mid_start, 0)
    ok &= has & (mid_start + nmid <= row_end - nsuf)
    ok &= _match_at(mid_start, _MID_A)
    starts = np.where(ok, mid_start + nmid, base)
    ends = np.where(ok, row_end - nsuf, base)
    # no '<' inside the text span ⇒ the verified MID/SUFFIX hits are the
    # first occurrences (counts via searchsorted on the sparse '<' list,
    # NOT a full-buffer cumsum — '<' is ~18 bytes/KB in the template)
    ok &= (np.searchsorted(lt_pos, ends)
           - np.searchsorted(lt_pos, starts)) == 0
    amp_pos = np.flatnonzero(data == _AMP)
    n_amp = (np.searchsorted(amp_pos, ends)
             - np.searchsorted(amp_pos, starts))
    return starts, ends, n_amp, ok


def _chunk_np(arr) -> tuple[np.ndarray, np.ndarray, "memoryview | None"]:
    """(data_u8, absolute offsets, data memoryview) for a Binary chunk."""
    import pyarrow as pa
    off_w = 8 if pa.types.is_large_binary(arr.type) else 4
    off_t = np.int64 if off_w == 8 else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_t, count=len(arr) + 1,
                         offset=arr.offset * off_w).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.zeros(0, dtype=np.uint8)
    mv = memoryview(bufs[2]) if bufs[2] is not None else None
    return data, offs, mv


def extract_texts(html_col) -> list[str]:
    """Batch extractor over an Arrow binary column (Array / ChunkedArray /
    any bytes sequence) — byte-identical to ``extract_text_bytes`` per
    row; non-template rows fall back to the scalar extractor."""
    import pyarrow as pa
    if isinstance(html_col, pa.ChunkedArray):
        chunks = html_col.chunks
    elif isinstance(html_col, pa.Array):
        chunks = [html_col]
    else:
        chunks = [pa.array(list(html_col), type=pa.binary())]
    out: list[str] = []
    for arr in chunks:
        if len(arr) == 0:
            continue
        data, offs, mv = _chunk_np(arr)
        starts, ends, n_amp, ok = _template_spans(data, offs)
        if arr.null_count > 0:   # scalar path raises on None — keep that
            ok = ok & np.array([v.is_valid for v in arr], dtype=bool)
        if ok.all():
            for s, e, na in zip(starts.tolist(), ends.tolist(),
                                n_amp.tolist()):
                t = str(mv[s:e], "utf-8")
                out.append(_unescape(t) if na else t)
        else:
            okl = ok.tolist()
            sl, el, nal = starts.tolist(), ends.tolist(), n_amp.tolist()
            ol, rl = offs[:-1].tolist(), offs[1:].tolist()
            for i in range(len(arr)):
                if okl[i]:
                    t = str(mv[sl[i]:el[i]], "utf-8")
                    out.append(_unescape(t) if nal[i] else t)
                else:
                    # bytes(None) raises TypeError exactly like the old
                    # per-row path did on a null html cell
                    out.append(extract_text_bytes(bytes(arr[i].as_py())))
    return out


def extract_text_stage(ds):
    """map_batches stage: html:binary → extracted:string (pass-through of
    all other columns). If a non-null `text` column exists the reference
    behaviour is pass-through unchanged (SURVEY.md §7.1)."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "extracted", pa.array(extract_texts(batch.column("html")),
                                  type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
