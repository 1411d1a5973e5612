"""CLI entrypoints — the `ray job submit` surface (BASELINE.json north_rule).

    python -m goto_eater_crawler_ray crawl  --out DIR [--scale golden|e2e|bench] [--resume]
    python -m goto_eater_crawler_ray crawl  --out DIR --sites tochigi,miyagi   (or --sites default)
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
    if args.sites is not None:
        return _run_site_crawlers(args)
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


def _run_site_crawlers(args) -> int:
    """Reference ``main.py`` CLI parity (main.py:25-74): ``--sites a,b``
    runs exactly those crawlers; ``--sites default`` runs every registered
    crawler minus the reference's default-exclusion table
    (sites.DEFAULT_IGNORES — tokyo_gnavi/tokushima/kochi + campaign-end
    retirements).  Output mirrors the reference run shape: one
    ``csvs/{name}.csv`` per site in the reference's fixed 12-column order,
    csvsort-sorted, old file replaced (main.py:96-103 unlink-then-write).
    Sites run over their reference-DOM fixture pages (no live network in
    this environment); the real-network path is the engine's
    ``fetch_kind='http'`` seam."""
    import os

    from .pipelines.export import CSV_COLUMN_ORDER
    from .pipelines.queries import site_items_dataset
    from .sites import select_sites

    names = select_sites(None if args.sites == "default" else args.sites)
    csv_dir = os.path.join(args.out, "csvs")
    os.makedirs(csv_dir, exist_ok=True)
    # fixture-scale data (a few rows per site) -> driver-side per-site write
    # is fine here; the at-scale export path is pipelines.export.export_sorted
    df = site_items_dataset(names).to_pandas()
    written = {}
    for name in names:
        body = df[df["prefecture"] == name]
        body = body.sort_values(["shop_name", "address", "genre_name"])[CSV_COLUMN_ORDER]
        path = os.path.join(csv_dir, f"{name}.csv")
        if os.path.exists(path):  # overwrite, never append (main.py:96-103)
            os.unlink(path)
        body.to_csv(path, index=False)
        written[name] = len(body)
    print(json.dumps({"sites": written, "csv_dir": csv_dir}))
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
    c.add_argument(
        "--sites",
        default=None,
        help="comma list of concrete site crawlers to run (reference main.py --target), "
        "or 'default' for all minus the reference's exclusion table",
    )
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
    import ray

    owned = not ray.is_initialized()  # only shut down a session WE started
    rc = args.fn(args)
    if owned and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
