"""CLI entrypoints — the `ray job submit` surface (BASELINE.json north_rule).

    python -m goto_eater_crawler_ray crawl  --out DIR [--scale golden|e2e|bench] [--resume]
    python -m goto_eater_crawler_ray export --items DIR --out DIR [--format csv|parquet]
    python -m goto_eater_crawler_ray query  NAME [--sf-dir DIR]

A CLI run owns its Ray session (guarded init; the driver/test contract
paths never reach this module).  On a multi-node cluster, submit with
``ray job submit -- python -m goto_eater_crawler_ray crawl --out /mnt/out``
— resume after interruption with ``--resume`` (checkpoint manifest + wave
frontiers are on shared storage).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args) -> int:
    _ensure_ray()
    from .pipelines.crawl import CrawlEngine
    from .sources.pagestore import ScaleSpec

    spec = {"golden": ScaleSpec.golden, "e2e": ScaleSpec.e2e, "bench": ScaleSpec.bench}[args.scale]()
    eng = CrawlEngine(
        spec,
        args.out,
        n_seen_shards=args.seen_shards,
        n_sched_shards=args.sched_shards,
        checkpoint_interval=args.checkpoint_interval,
    )
    t0 = time.time()
    totals = eng.run(resume=args.resume)
    totals["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(totals))
    return 0


def cmd_export(args) -> int:
    _ensure_ray()
    from .pipelines.export import export_sorted

    parts = export_sorted(args.items, args.out, file_format=args.format)
    print(json.dumps({"partitions": parts}))
    return 0


def cmd_query(args) -> int:
    _ensure_ray()
    from .pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name}; available: {sorted(QUERIES)}", file=sys.stderr)
        return 2
    res = QUERIES[args.name](args.sf_dir)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = res.count()
    else:
        n = len(res)
    print(json.dumps({"query": args.name, "rows": n}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="goto_eater_crawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the crawl engine")
    c.add_argument("--out", required=True)
    c.add_argument("--scale", default="golden", choices=["golden", "e2e", "bench"])
    c.add_argument("--resume", action="store_true")
    c.add_argument("--seen-shards", type=int, default=4)
    c.add_argument("--sched-shards", type=int, default=2)
    c.add_argument("--checkpoint-interval", type=int, default=1)
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("export", help="sorted per-prefecture export")
    e.add_argument("--items", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--format", default="csv", choices=["csv", "parquet"])
    e.set_defaults(fn=cmd_export)

    q = sub.add_parser("query", help="run one named pipeline")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
