"""Legacy TAS vector (.vtr) importer
(ImportExport/src/plugins/ImportTASVector.java:215-300).

Format (little-endian): 40-byte header — min/max value (f32×2), two
(north/south, east/west) double pairs — then variable-length records:
``int32 n_vertices, f32 value, n_vertices × (f32 x_off, f32 y_off)``
with offsets relative to (west, south); 1 vertex → POINT else POLYLINE.

Records are variable-length, so the driver makes one cheap index pass
over the record headers (8 bytes each, seek-forward) and hands each Ray
task a contiguous byte range of whole records — the same
index-then-range-read pattern as the LAS source.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd


def write_tas_vector(path: str, features: list[dict],
                     west: float, south: float,
                     north: float, east: float) -> None:
    """features: [{value, xs, ys}] in world coords (test fixtures)."""
    vals = [f["value"] for f in features] or [0.0]
    with open(path, "wb") as f:
        f.write(struct.pack("<ff", min(vals), max(vals)))
        f.write(struct.pack("<dddd", north, south, east, west))
        for feat in features:
            xs = np.asarray(feat["xs"], dtype=np.float32) - west
            ys = np.asarray(feat["ys"], dtype=np.float32) - south
            f.write(struct.pack("<if", len(xs), feat["value"]))
            f.write(np.column_stack([xs, ys]).astype("<f4").tobytes())


def index_tas_vector(path: str):
    """(header dict, [(offset, n_vertices, value), ...]) — one driver
    seek-forward pass over the 8-byte record headers."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(40)
        vmin, vmax = struct.unpack("<ff", head[:8])
        n1, n2, e1, e2 = struct.unpack("<dddd", head[8:40])
        hdr = {"vmin": vmin, "vmax": vmax,
               "north": max(n1, n2), "south": min(n1, n2),
               "east": max(e1, e2), "west": min(e1, e2)}
        recs = []
        loc = 40
        while loc + 8 <= size:
            f.seek(loc)
            nv, val = struct.unpack("<if", f.read(8))
            recs.append((loc, nv, val))
            loc += 8 + nv * 8
    return hdr, recs


def read_tas_vector(path: str, records_per_task: int = 4096):
    """Features as a Ray Dataset (rec_id, value, n_vertices, length,
    first_x, first_y) — geometry decoded per task from its byte range."""
    import ray.data as rd

    hdr, recs = index_tas_vector(path)
    west, south = hdr["west"], hdr["south"]
    chunks = [recs[i:i + records_per_task]
              for i in range(0, len(recs), records_per_task)] or [[]]

    def load(batch) -> pd.DataFrame:
        out = {"rec_id": [], "value": [], "n_vertices": [],
               "length": [], "first_x": [], "first_y": []}
        with open(path, "rb") as f:
            for cid in batch["id"]:
                chunk = chunks[int(cid)]
                if not chunk:
                    continue
                lo = chunk[0][0]
                hi = chunk[-1][0] + 8 + chunk[-1][1] * 8
                f.seek(lo)
                raw = f.read(hi - lo)
                base = chunk[0][0]
                for k, (off, nv, val) in enumerate(chunk):
                    p = off - base + 8
                    xy = (np.frombuffer(raw[p:p + nv * 8], dtype="<f4")
                          .reshape(nv, 2).astype(np.float64))
                    xs = xy[:, 0] + west
                    ys = xy[:, 1] + south
                    seg = (np.sqrt(np.diff(xs) ** 2 + np.diff(ys) ** 2).sum()
                           if nv > 1 else 0.0)
                    idx = int(cid) * records_per_task + k
                    out["rec_id"].append(idx + 1)  # 1-based record numbers
                    out["value"].append(float(val))
                    out["n_vertices"].append(nv)
                    out["length"].append(float(seg))
                    out["first_x"].append(float(xs[0]))
                    out["first_y"].append(float(ys[0]))
        return pd.DataFrame(out)

    return rd.range(len(chunks)).map_batches(load, batch_format="numpy")
