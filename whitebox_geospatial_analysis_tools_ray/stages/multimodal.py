"""Multimodal (image/audio) columns as opaque binary + typed metadata.

The reference imports images as rasters through ImageIO
(ImportImage.java:528); a 100 TB training-data pipeline needs the same
shape over Arrow: media as an opaque ``binary`` column with typed
metadata, decoded/feature-extracted inside an ACTOR-POOL ``map_batches``
stage (decoder state loaded once per actor, SURVEY.md §2.3 pattern).

The real decoders (PIL / libav) are NOT in this container, so the decode
kernel is STUBBED: a deterministic FAKEIMG container format
(``b"FAKEIMG" + u32 width + u32 height + payload``) stands in for JPEG.
Everything around it — schema, batch flow, actor signature, per-actor
init, output layout — is the real production plumbing; swapping
``_decode_fake`` for a PIL call is the only change needed.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import ray.data as rd

_MAGIC = b"FAKEIMG"


def encode_fake_image(doc_id: int, payload: bytes) -> bytes:
    """Deterministic container: width/height derive from doc_id (SQL
    mirror: width = 16 + doc_id % 64, height = 16 + (doc_id * 7) % 48)."""
    w = 16 + doc_id % 64
    h = 16 + (doc_id * 7) % 48
    return _MAGIC + struct.pack(">II", w, h) + payload


def media_table(sf_dir: str) -> "rd.Dataset":
    """documents → media rows (doc_id, media_type, payload:binary).
    The text bytes stand in for the image payload."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "media_type": "image/fake",
            "payload": [encode_fake_image(int(i), t.encode("utf-8"))
                        for i, t in zip(batch["doc_id"], batch["text"])],
        })

    return ds.map_batches(pack, batch_format="pandas")


class ImageDecoder:
    """Actor-pool decode stage. ``__init__`` loads the decoder ONCE per
    actor (here: tries PIL, falls back to the FAKEIMG parser); ``__call__``
    decodes a whole batch. With real images this is where model weights /
    codec contexts live."""

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_fake(self, buf: bytes) -> tuple[int, int, int]:
        if not buf.startswith(_MAGIC):
            raise NotImplementedError(
                "real image decoding requires PIL; only FAKEIMG payloads "
                "are supported in this environment")
        w, h = struct.unpack(">II", buf[7:15])
        return w, h, len(buf) - 15

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dims = [self._decode_fake(b) for b in batch["payload"]]
        w, h, nb = (np.array(x, dtype=np.int64) for x in zip(*dims))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "width": w, "height": h, "n_payload_bytes": nb,
            "aspect_milli": (w * 1000) // h,
        })


def image_features(sf_dir: str, batch_size: int = 256) -> "rd.Dataset":
    """media → per-image features via the actor-pool decode stage.
    Output: (doc_id, width, height, n_payload_bytes, aspect_milli)."""
    from .util import pool_size
    return media_table(sf_dir).map_batches(
        ImageDecoder, batch_format="pandas",
        concurrency=pool_size(), batch_size=batch_size)


def resize_stub(ds: "rd.Dataset", width: int, height: int) -> "rd.Dataset":
    """Resize stage placeholder: raises on execution — real kernels need
    an image library. The stage SIGNATURE (Dataset→Dataset, actor pool)
    is the production interface."""

    class Resizer:
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            raise NotImplementedError(
                "resize requires an image library (PIL) not present here")

    from .util import pool_size
    return ds.map_batches(Resizer, batch_format="pandas",
                          concurrency=pool_size())


# ---------------------------------------------------------------------------
# Video frame sampling: opaque FAKEVID container (deterministic stand-in
# for an MP4 — b"FAKEVID" + u32 n_frames + u32 fps + per-frame u32
# checksums). The actor-pool stage samples every k-th frame and emits
# one row per sampled frame — the schema/fan-out a real libav sampler
# produces; swapping the parser for av.open is the only change.
# ---------------------------------------------------------------------------

_VMAGIC = b"FAKEVID"


def encode_fake_video(doc_id: int) -> bytes:
    n_frames = 8 + doc_id % 120
    fps = 24 + (doc_id % 3) * 6
    frames = [(doc_id * 2654435761 + f * 97) % 4294967296
              for f in range(n_frames)]
    return (_VMAGIC + struct.pack(">II", n_frames, fps)
            + struct.pack(f">{n_frames}I", *frames))


class FrameSampler:
    """Actor-pool stage: parse the container once per batch row, emit
    every ``stride``-th frame (one output row per sampled frame)."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "frame_idx": [], "t_ms": [], "checksum": []}
        for doc_id, buf in zip(batch["doc_id"], batch["payload"]):
            buf = bytes(buf)
            assert buf[:7] == _VMAGIC
            n, fps = struct.unpack(">II", buf[7:15])
            frames = struct.unpack(f">{n}I", buf[15:15 + 4 * n])
            for f in range(0, n, self.stride):
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(f)
                out["t_ms"].append(f * 1000 // fps)
                out["checksum"].append(frames[f])
        return pd.DataFrame(out)


def video_frame_sample(sf_dir: str, stride: int = 10,
                       batch_size: int = 256) -> "rd.Dataset":
    """documents → fake videos → sampled frames
    (doc_id, frame_idx, t_ms, checksum)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "payload": [encode_fake_video(int(i)) for i in batch["doc_id"]]})

    from .util import pool_size
    return (ds.map_batches(pack, batch_format="pandas")
            .map_batches(FrameSampler, batch_format="pandas",
                         concurrency=pool_size(), batch_size=batch_size))


def video_frame_sample_sql(stride: int = 10) -> str:
    """Exact mirror: frame grid + checksum hash rule from doc_id."""
    return f"""
WITH v AS (SELECT doc_id, 8 + doc_id % 120 AS n_frames,
                  24 + (doc_id % 3) * 6 AS fps
           FROM documents),
f AS (SELECT v.doc_id, g.f AS frame_idx, v.fps
      FROM v, LATERAL (SELECT unnest(range(0, v.n_frames, {stride})) AS f)
           g(f))
SELECT doc_id, frame_idx,
       frame_idx * 1000 // fps AS t_ms,
       (doc_id * 2654435761 + frame_idx * 97) % 4294967296 AS checksum
FROM f
"""
