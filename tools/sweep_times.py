"""Time every queries() entry at sf0.01; dump JSON {name: sec}."""
import json
import sys
import time

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e

SF = __import__("os").environ.get("SWEEP_SF", "/root/testdata/sf0.01")
qs = e.queries()
times = {}
errs = {}
for i, name in enumerate(sorted(qs)):
    t0 = time.perf_counter()
    try:
        r = qs[name](SF)
        import ray.data as rd
        if isinstance(r, rd.Dataset):
            n = 0
            for b in r.iter_batches(batch_size=65536, batch_format="pyarrow"):
                n += b.num_rows
        times[name] = round(time.perf_counter() - t0, 2)
    except Exception as ex:
        errs[name] = repr(ex)[:200]
        times[name] = round(time.perf_counter() - t0, 2)
    print(f"{i+1}/{len(qs)} {name} {times[name]}s", flush=True)

json.dump({"times": times, "errs": errs}, open("/tmp/sweep_times.json", "w"))
print("TOTAL", round(sum(times.values()), 1))
print("ERRS", errs)
ray.shutdown()
