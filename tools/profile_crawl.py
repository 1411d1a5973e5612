"""Data-plane scaling profiler: run ONLY the bench crawl at a given width
with per-wave debug timing and per-wave parsed-store byte counts, so the
8-vs-32-CPU efficiency gap can be attributed to a specific stage
(fetch+parse execution vs admit/schedule vs finalize vs parquet bytes).

  python tools/profile_crawl.py [num_cpus] [--hosts N] [--mesh N] [--batch N]

Prints one JSON line: total sec, fetch_parse sec, finalize sec, per-wave
rows/bytes, parsed-store total bytes.  Everything else goes to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    args = sys.argv[1:]
    ncpu = int(args[0]) if args and not args[0].startswith("--") else 32

    def opt(name: str, default: int) -> int:
        return int(args[args.index(name) + 1]) if name in args else default

    hosts = opt("--hosts", 24576)
    mesh = opt("--mesh", 16000)
    batch = opt("--batch", 0)  # 0 = engine width-aware auto-size
    seen_shards = opt("--seen", 8)
    sched_shards = opt("--sched", 4)

    sys.path.insert(0, ".")  # run from /root/repo; workers inherit cwd
    os.environ["CRAWL_DEBUG_TIMING"] = "1"
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from goto_eater_crawler_ray.pipelines.crawl import CrawlEngine
    from goto_eater_crawler_ray.sources.pagestore import ScaleSpec

    # same warm-up as bench.py: full worker pool before timing
    import ray.data as rd

    rd.range(ncpu * 8, override_num_blocks=ncpu * 8).map_batches(lambda b: b, batch_size=1).materialize()

    out_dir = f"/dev/shm/profile_crawl_cpu{ncpu}"
    shutil.rmtree(out_dir, ignore_errors=True)
    spec = ScaleSpec.bench(paginated_hosts=hosts, mesh_count=mesh)
    t0 = time.time()
    eng = CrawlEngine(
        spec,
        out_dir,
        n_seen_shards=seen_shards,
        n_sched_shards=sched_shards,
        n_parts=max(8, ncpu),
        seen_capacity=2_000_000,
        fetch_batch_size=batch or None,
        checkpoint_interval=8,
    )
    totals = eng.run()
    crawl_sec = time.time() - t0

    waves = []
    parsed_root = os.path.join(out_dir, "parsed")
    if os.path.isdir(parsed_root):
        import pyarrow.dataset as pads

        for w in sorted(os.listdir(parsed_root)):
            p = os.path.join(parsed_root, w)
            waves.append({"wave": w, "rows": pads.dataset(p).count_rows(), "bytes": dir_bytes(p)})
    out_bytes = {d: dir_bytes(os.path.join(out_dir, d)) for d in ("parsed", "items", "documents", "lineage", "frontier") if os.path.isdir(os.path.join(out_dir, d))}
    eng.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "num_cpus": ncpu,
                "crawl_sec": round(crawl_sec, 2),
                "fetch_parse_sec": round(totals.get("fetch_parse_sec", 0.0), 2),
                "pages": totals["pages"],
                "pages_per_sec": round(totals["pages"] / crawl_sec, 1),
                "fetch_parse_pages_per_sec": round(totals["pages"] / max(totals.get("fetch_parse_sec", 1e-9), 1e-9), 1),
                "fetch_batch_size": batch,
                "seen_shards": seen_shards,
                "sched_shards": sched_shards,
                "store_bytes": out_bytes,
                "waves": waves,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
