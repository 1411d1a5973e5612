"""Full-catalog robustness sweep: run EVERY queries() entry end-to-end
at a given sf dir (default /root/testdata/sf0.1) and report per-query
wall time + row count — the scale-robustness axis the oracle gate
(sf0.001/sf0.01) doesn't cover.  No oracle compare here; failures are
exceptions.  Usage: python tools/sweep_sf.py [sf_dir] [query ...]"""

import os
import sys
import time

sys.path.insert(0, ".")

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from goto_eater_crawler_ray.pipelines.queries import QUERIES  # noqa: E402

args = sys.argv[1:]
sf_dir = next((a for a in args if os.path.isdir(a)), "/root/testdata/sf0.1")
only = {a for a in args if not os.path.isdir(a)}

t_all = time.time()
fails, times = [], {}
for name, fn in QUERIES.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = fn(sf_dir)
        try:
            n = res.count()
        except AttributeError:
            n = len(res)
        dt = time.time() - t0
        times[name] = dt
        print(f"ok   {name}: {n} rows ({dt:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)

n_run = len(times) + len(fails)
print(f"\n{n_run - len(fails)}/{n_run} ok in {time.time() - t_all:.1f}s total")
for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:8]:
    print(f"  slow: {name} {dt:.1f}s")
if fails:
    print("FAILURES:", fails)
    sys.exit(1)
ray.shutdown()
