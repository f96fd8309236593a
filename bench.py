"""Benchmark driver — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...}

``--scaling``: runs the headline pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency T8/(4*T32)... (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _consume(result) -> int:
    """Execute a pipeline to completion; return row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        n = 0
        for b in result.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    return 0


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as e
    qs = e.queries()

    n_pages = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows

    # warm the page cache (untimed single read)
    import ray.data as rd
    rd.read_parquet(f"{SF_DIR}/documents.parquet",
                    columns=["doc_id"]).count()

    bench_queries = ["flagship", "tile_assign", "pip_rect_join", "knn_idw",
                     "cell_aggregates", "exact_dedup", "token_stats",
                     "ann_cosine_topk", "q1_pricing", "events_window"]
    times: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.perf_counter()
        _consume(qs[name](SF_DIR))
        times[name] = round(time.perf_counter() - t0, 3)

    headline = times["flagship"]
    out = {
        "metric": "spatial-join + tile-assignment throughput (flagship pipeline)",
        "value": headline,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / headline, 1) if headline > 0 else None,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    # efficiency = speedup achieved / speedup possible (4×)
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "sec_8cpu": t_lo, "sec_32cpu": t_hi,
        "pages_per_sec_8cpu": lo["pages_per_sec"],
        "pages_per_sec_32cpu": hi["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
