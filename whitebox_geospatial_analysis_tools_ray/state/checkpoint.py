"""Resumable partitioned output with per-partition lineage + row counts.

The north rule requires: "resumable from per-partition checkpoints with
lineage and row-count metrics". Design (SURVEY.md §4):

- output = one Parquet file per partition key, written ATOMICALLY
  (tmp file + os.replace) inside ``groupby(key).map_groups`` tasks;
- each completed partition appends a manifest row
  ``{partition, rows, path, stage, lineage}`` (lineage = input
  fingerprint + stage name), collected into ``_MANIFEST.jsonl`` plus a
  final ``_SUCCESS`` marker;
- resume = load the manifest, drop committed partition keys from the
  input with a vectorized ``map_batches`` filter, run the remainder.

A failed run therefore reprocesses only missing partitions; a completed
manifest makes the rerun a no-op (resume-equals-fresh-run is tested).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_MANIFEST.jsonl")


def load_manifest(out_dir: str) -> dict[int, dict]:
    """partition key → manifest row for committed partitions."""
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return {}
    out = {}
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            out[row["partition"]] = row
    return out


def is_complete(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, "_SUCCESS"))


def checkpointed_write(ds, out_dir: str, key: str, stage: str,
                       lineage: str = "") -> pd.DataFrame:
    """Write `ds` partitioned by `key` with per-partition checkpoints.

    Returns the manifest as a DataFrame (partition, rows, path).
    """
    os.makedirs(out_dir, exist_ok=True)
    committed = load_manifest(out_dir)
    if committed:
        done = np.array(sorted(committed), dtype=np.int64)

        def drop_done(batch):
            k = np.asarray(batch[key], dtype=np.int64)
            m = ~np.isin(k, done)
            return {c: np.asarray(v)[m] for c, v in batch.items()}

        ds = ds.map_batches(drop_done, batch_format="numpy")

    def write_partition(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq
        pid = int(g[key].iloc[0])
        final = os.path.join(out_dir, f"part-{pid}.parquet")
        tmp = os.path.join(out_dir, f".tmp-{pid}-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, final)  # atomic commit
        return pd.DataFrame({"partition": [pid], "rows": [len(g)],
                             "path": [final]})

    new_rows = ds.groupby(key).map_groups(
        write_partition, batch_format="pandas").to_pandas()

    with open(_manifest_path(out_dir), "a") as f:
        for r in new_rows.itertuples():
            f.write(json.dumps({"partition": int(r.partition),
                                "rows": int(r.rows), "path": r.path,
                                "stage": stage, "lineage": lineage}) + "\n")

    manifest = load_manifest(out_dir)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        json.dump({"stage": stage, "partitions": len(manifest),
                   "total_rows": int(sum(m["rows"] for m in manifest.values()))},
                  f)
    return pd.DataFrame(
        [{"partition": p, "rows": m["rows"], "path": m["path"]}
         for p, m in sorted(manifest.items())])


def read_checkpointed(out_dir: str):
    """Read a checkpointed output back as a Ray Dataset."""
    import ray.data as rd
    manifest = load_manifest(out_dir)
    return rd.read_parquet([m["path"] for m in manifest.values()])
