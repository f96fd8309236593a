"""Stream-network analysis over the D8 pointer grid.

Reference semantics (StreamNetworkAnalysisTools/src/plugins/, studied for
behavior only):

- StreamOrder.java (364 LoC): Strahler order over stream cells —
  headwater cells are order 1; at a junction the order is max(inflowing
  orders), +1 when two or more tributaries tie at that max.
- StreamMagnitude.java (365 LoC): Shreve magnitude — number of upstream
  headwater links; additive at junctions.
- StreamLinkID.java (357 LoC): unique id per link (maximal stream chain
  between junctions). Our id = the global cell index of the link's most
  upstream cell (deterministic, order-free).
- StreamLinkLength.java (370 LoC): cells (length) per link.

All of these are downstream propagations along the D8 flow forest,
restricted to stream cells (flow accumulation ≥ threshold, per
ExtractStreams.java). The reference walks the whole raster sequentially;
distributed plan = the flow-accumulation pattern (hydro.py):

1. per row-band tile, resolve stream cells in DESCENDING elevation order
   (a D8 receiver is strictly lower, so all of a cell's in-tile inflow
   neighbours are resolved first), combining in-tile inflows with
   EXTERNAL inflow messages;
2. cells whose pointer crosses the tile edge emit
   (target_global_cell, order, magnitude, label) messages — O(cols) per
   tile per round;
3. iterate to a fixed point of the message map (rounds ≤ tile-boundary
   crossings of the longest stream path).

Because every combine is recomputed from the cell's FULL inflow multiset
each round, the fixed point is independent of message arrival order and
of the tiling — asserted by the tiling-invariance test.

At 100 TB scale the driver merge only ever touches edge-row messages
(O(cols × tiles) of them), never cell data; per-tile state stays in the
object store between rounds.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .hydro import _tile_pointers, flow_accumulation_frames
from .raster import RasterSpec
from .terrain import _DX, _DY


def _solve_tile(z: np.ndarray, ptr: np.ndarray, stream: np.ndarray,
                r0: int, cols: int, ext: dict, nodata: float):
    """Resolve one tile. ext maps global cell -> list[(order, mag, label)].

    Returns (order, mag, label arrays, emits) where emits is a list of
    (target_global_cell, order, mag, label) for pointer exits."""
    H, W = z.shape
    order = np.zeros((H, W), dtype=np.int32)
    mag = np.zeros((H, W), dtype=np.int64)
    label = np.zeros((H, W), dtype=np.int64)
    emits = []
    idx = np.argsort(-z, axis=None, kind="stable")
    for lin in idx:
        r, c = divmod(int(lin), W)
        if not stream[r, c]:
            continue
        inflows = []
        for i in range(8):
            rn, cn = r + _DY[i], c + _DX[i]
            if 0 <= rn < H and 0 <= cn < W and stream[rn, cn]:
                back = float(1 << ((i + 4) % 8))
                if ptr[rn, cn] == back:
                    inflows.append((int(order[rn, cn]), int(mag[rn, cn]),
                                    int(label[rn, cn])))
        inflows += ext.get((r0 + r) * cols + c, [])
        gcell = (r0 + r) * cols + c
        if not inflows:
            order[r, c], mag[r, c], label[r, c] = 1, 1, gcell
        else:
            m = max(o for o, _, _ in inflows)
            ties = sum(1 for o, _, _ in inflows if o == m)
            order[r, c] = m + 1 if ties >= 2 else m
            mag[r, c] = sum(g for _, g, _ in inflows)
            label[r, c] = inflows[0][2] if len(inflows) == 1 else gcell
        code = ptr[r, c]
        if code != nodata and code > 0:
            i = int(code).bit_length() - 1
            r2, c2 = r + _DY[i], c + _DX[i]
            if 0 <= c2 < W and not (0 <= r2 < H):
                emits.append(((r0 + r2) * cols + c2, int(order[r, c]),
                              int(mag[r, c]), int(label[r, c])))
    return order, mag, label, emits


def stream_topology_frames(spec: RasterSpec, threshold: float = 5.0,
                           max_rounds: int = 64) -> pd.DataFrame:
    """Converged per-tile (order, mag, label) arrays + stream masks."""
    cols = spec.cols
    acc_frames = flow_accumulation_frames(spec)
    acc = {int(r.tile_id): np.frombuffer(r.acc).reshape(r.shape0, cols)
           for r in acc_frames.itertuples()}
    acc_ref = ray.put(acc)

    # ext[tid] = {global_cell: [(order, mag, label), ...]}
    ext = {t: {} for t in range(spec.n_tiles)}

    def solve(batch, ext_ref, acc_ref=acc_ref) -> pd.DataFrame:
        ext_all = ray.get(ext_ref) if isinstance(ext_ref, ray.ObjectRef) \
            else ext_ref
        acc_all = ray.get(acc_ref) if isinstance(acc_ref, ray.ObjectRef) \
            else acc_ref
        rows = []
        for tid in batch["id"]:
            tid = int(tid)
            z, ptr = _tile_pointers(spec, tid)
            stream = (z != spec.nodata) & (acc_all[tid] >= threshold)
            r0 = tid * spec.tile_rows
            order, mag, label, emits = _solve_tile(
                z, ptr, stream, r0, cols, ext_all[tid], spec.nodata)
            rows.append({"tile_id": tid, "shape0": z.shape[0],
                         "order": order.tobytes(), "mag": mag.tobytes(),
                         "label": label.tobytes(),
                         "stream": stream.astype(np.int8).tobytes(),
                         "emits": json.dumps(emits)})
        return pd.DataFrame(rows)

    last = None
    for _ in range(max_rounds):
        ref = ray.put(ext)
        res = (rd.range(spec.n_tiles)
               .map_batches(lambda b, _r=ref: solve(b, _r),
                            batch_format="numpy").to_pandas())
        new_ext = {t: {} for t in range(spec.n_tiles)}
        for r in res.itertuples():
            for gcell, o, g, lab in json.loads(r.emits):
                target_tid = (gcell // cols) // spec.tile_rows
                if 0 <= target_tid < spec.n_tiles:
                    new_ext[target_tid].setdefault(gcell, []).append(
                        (o, g, lab))
        for t in new_ext:  # canonical order → comparable fixed point
            for k in new_ext[t]:
                new_ext[t][k].sort()
        if new_ext == ext:
            last = res
            break
        ext = new_ext
        last = res
    else:  # pragma: no cover - cap reached
        raise RuntimeError("stream topology did not converge")
    return last


def _row_aggregates(frames: pd.DataFrame, spec: RasterSpec) -> pd.DataFrame:
    cols = spec.cols
    out = []
    for r in frames.sort_values("tile_id").itertuples():
        h = int(r.shape0)
        order = np.frombuffer(r.order, dtype=np.int32).reshape(h, cols)
        mag = np.frombuffer(r.mag, dtype=np.int64).reshape(h, cols)
        label = np.frombuffer(r.label, dtype=np.int64).reshape(h, cols)
        stream = np.frombuffer(r.stream, dtype=np.int8).reshape(
            h, cols).astype(bool)
        r0 = int(r.tile_id) * spec.tile_rows
        gcell = (np.arange(r0, r0 + h)[:, None] * cols
                 + np.arange(cols)[None, :])
        heads = stream & (label == gcell)
        out.append(pd.DataFrame({
            "row_id": np.arange(r0, r0 + h),
            "n_stream": stream.sum(axis=1).astype(np.int64),
            "max_order": order.max(axis=1).astype(np.int64),
            "sum_order": order.sum(axis=1).astype(np.int64),
            "sum_magnitude": mag.sum(axis=1),
            "n_heads": heads.sum(axis=1).astype(np.int64),
            "sum_label": np.where(stream, label, 0).sum(axis=1)}))
    return (pd.concat(out, ignore_index=True)
            .sort_values("row_id").reset_index(drop=True))


def stream_order(spec: RasterSpec | None = None,
                 threshold: float = 5.0) -> pd.DataFrame:
    """Strahler order + Shreve magnitude per raster row."""
    spec = spec or RasterSpec()
    frames = stream_topology_frames(spec, threshold)
    agg = _row_aggregates(frames, spec)
    return agg[["row_id", "n_stream", "max_order", "sum_order",
                "sum_magnitude"]]


def stream_link_id(spec: RasterSpec | None = None,
                   threshold: float = 5.0) -> pd.DataFrame:
    """Link ids per raster row (n_heads = links starting in the row)."""
    spec = spec or RasterSpec()
    frames = stream_topology_frames(spec, threshold)
    agg = _row_aggregates(frames, spec)
    return agg[["row_id", "n_stream", "n_heads", "sum_label"]]


def stream_link_lengths(spec: RasterSpec | None = None,
                        threshold: float = 5.0) -> pd.DataFrame:
    """Per-link cell counts via a Ray groupby over per-tile partial
    counts (the wide step — labels are the shuffle key), then a global
    summary row: (n_links, total_stream_cells, max_link_len)."""
    spec = spec or RasterSpec()
    cols = spec.cols
    frames = stream_topology_frames(spec, threshold)

    def partial(batch) -> pd.DataFrame:
        parts = []
        for lab_buf, st_buf, h in zip(batch["label"], batch["stream"],
                                      batch["shape0"]):
            label = np.frombuffer(lab_buf, dtype=np.int64).reshape(
                int(h), cols)
            stream = np.frombuffer(st_buf, dtype=np.int8).reshape(
                int(h), cols).astype(bool)
            labs, counts = np.unique(label[stream], return_counts=True)
            parts.append(pd.DataFrame({"label": labs, "n": counts}))
        return pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"label": [], "n": []})

    per_link = (rd.from_pandas(frames[["label", "stream", "shape0"]])
                .map_batches(partial, batch_format="pandas")
                .groupby("label").sum("n").to_pandas())
    n = per_link["sum(n)"]
    return pd.DataFrame({"n_links": [len(per_link)],
                         "total_stream_cells": [int(n.sum())],
                         "max_link_len": [int(n.max()) if len(n) else 0]})


def stream_topology_naive(spec: RasterSpec, threshold: float = 5.0):
    """Single-process whole-grid mirror (one tile, no exits)."""
    from .hydro import flow_accumulation_naive  # noqa: F401 (same family)
    from .raster import synth_value
    from .terrain import d8_kernel
    from .hydro import _accumulate_tile

    cols = spec.cols
    cell = np.arange(spec.rows * cols, dtype=np.int64)
    z = synth_value(cell).reshape(spec.rows, cols)
    pad = np.full((spec.rows + 2, cols + 2), spec.nodata)
    pad[1:-1, 1:-1] = z
    ptr = d8_kernel(pad, spec.nodata)[1:-1, 1:-1]
    acc, _, _ = _accumulate_tile(z, ptr, np.zeros_like(z), spec.nodata)
    stream = (z != spec.nodata) & (acc >= threshold)
    order, mag, label, _ = _solve_tile(z, ptr, stream, 0, cols, {},
                                       spec.nodata)
    return order, mag, label, stream
