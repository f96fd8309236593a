"""Job driver — the ``ray job submit`` entry point for the flagship
pipeline with resumable checkpointed output (north rule: "resumable from
per-partition checkpoints with lineage and row-count metrics, submitted
via ray job submit").

Usage (cluster):
    ray job submit --working-dir . -- python -m \
        whitebox_geospatial_analysis_tools_ray.pipelines.job \
        --sf-dir /data/sf0.1 --out /data/out/flagship

Usage (local): same module run directly; Ray auto-inits (guarded).

The job:
1. runs the flagship geocode→tile→PIP-join→aggregate pipeline;
2. writes one Parquet file per tile partition atomically with a
   ``_MANIFEST.jsonl`` row (partition, rows, path, stage, lineage) per
   commit and a final ``_SUCCESS`` marker;
3. a rerun after failure skips committed partitions (resume == fresh,
   tested in tests/test_sources_state.py);
4. prints a one-line JSON metrics report (rows, partitions, pages/sec).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time


def _table_rows(path: str) -> int:
    """Row count from parquet metadata; a sharded table is a DIRECTORY
    of parquet files (the 100-TB layout) — sum the shard footers."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                   for f in sorted(os.listdir(path))
                   if f.endswith(".parquet"))
    return pq.ParquetFile(path).metadata.num_rows


def run_flagship_job(sf_dir: str, out_dir: str,
                     tile_width: float = 250.0) -> dict:
    import pyarrow.parquet as pq

    from ..state.checkpoint import checkpointed_write, load_manifest
    from .flagship import flagship

    t0 = time.perf_counter()
    lineage = json.dumps({
        "input": f"{sf_dir}/documents.parquet",
        "input_rows": _table_rows(f"{sf_dir}/documents.parquet"),
        "stage_chain": ["read_parquet", "geocode", "tile_assign",
                        "broadcast_pip_join", "partial_count",
                        "groupby(tile,zone)"],
        "params": {"tile_width": tile_width},
    }, sort_keys=True)
    lineage_id = hashlib.md5(lineage.encode()).hexdigest()[:12]

    ds = flagship(sf_dir, tile_width=tile_width)
    manifest = checkpointed_write(ds, out_dir, key="tile_id",
                                  stage="flagship", lineage=lineage_id)
    elapsed = time.perf_counter() - t0
    pages = _table_rows(f"{sf_dir}/documents.parquet")
    with open(os.path.join(out_dir, "_LINEAGE.json"), "w") as f:
        f.write(lineage)
    return {
        "stage": "flagship",
        "partitions": int(len(manifest)),
        "rows": int(manifest["rows"].sum()) if len(manifest) else 0,
        "pages": pages,
        "sec": round(elapsed, 3),
        "pages_per_sec": round(pages / elapsed, 1),
        "lineage": lineage_id,
        "out_dir": out_dir,
        "resumed_partitions": int(len(load_manifest(out_dir))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--out", default="/tmp/whitebox_ray_job/flagship")
    ap.add_argument("--tile-width", type=float, default=250.0)
    args = ap.parse_args()

    import ray
    owns = not ray.is_initialized()
    if owns:
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    try:
        print(json.dumps(run_flagship_job(args.sf_dir, args.out,
                                          args.tile_width)))
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()


def job_manifest(sf_dir: str) -> "pd.DataFrame":
    """Run the checkpointed flagship write to a CONTENT-KEYED /tmp dir
    and return the manifest (partition, n_rows) — this puts the
    resumable writer itself under the exact-oracle gate: a rerun
    resumes from the committed partitions and must produce the
    identical manifest (oracle = the flagship SQL grouped per tile)."""
    import pandas as pd

    from ..state.checkpoint import commit_cache_key, content_cache_dir

    # content-fingerprinted (size + parquet footer), ONE dir per source:
    # survives cp -p fixture regeneration and bounds /tmp growth
    src = f"{sf_dir}/documents.parquet"
    out, valid = content_cache_dir(src, "graft_job", "v2")
    if not valid:
        commit_cache_key(out, src, "v2")
    run_flagship_job(sf_dir, out)
    from ..state.checkpoint import load_manifest
    mf = load_manifest(out)
    parts = sorted(mf)
    return pd.DataFrame({
        "partition": pd.Series(parts, dtype="int64"),
        "n_rows": pd.Series([mf[p]["rows"] for p in parts], dtype="int64")})
