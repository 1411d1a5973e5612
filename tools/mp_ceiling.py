"""Single-box weak-scaling ceiling probe (no Ray, no framework).

Measures THIS VM's hardware ceiling for the scaling criterion: the same
fixed CPU work per process (a parse-shaped loop: regex findall + string
splits over synthetic shop-card HTML) run with N=8 and N=32 concurrent
processes.  Per-process throughput at 32 / per-process throughput at 8 is
the best ANY framework can do when going 8 -> 32 on this box (shared
memory bus + host vCPU contention); `bench.py --scaling` efficiencies
should be read against this number, not against 1.0.

Usage: python tools/mp_ceiling.py [seconds_per_run]   (default 10)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import re
import sys
import time

_CARD = (
    '<div class="shop"><h3>店舗%d</h3><p class="place">〒123-456%d 市区町村%d丁目</p>'
    '<p class="tel">012-345-678%d</p><p class="genre">和食|カフェ</p>'
    '<p class="hours">営業時間: 10-2%d</p><p class="closed">定休日: 月</p></div>'
)
_PAGE = "".join(_CARD % (i, i % 10, i, i % 10, i % 5) for i in range(40))
_RE = re.compile(r'<div class="shop"><h3>(.*?)</h3><p class="place">(.*?)</p><p class="tel">(.*?)</p>', re.S)


def _worker(seconds: float, out):
    t_end = time.time() + seconds
    pages = 0
    while time.time() < t_end:
        for m in _RE.finditer(_PAGE):
            _ = m.group(1).strip(), m.group(2).split("　"), m.group(3).replace("-", "")
        pages += 1
    out.put(pages)


def run(n_procs: int, seconds: float, cpuset: set[int] | None = None) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(seconds, q)) for _ in range(n_procs)]
    t0 = time.time()
    for p in procs:
        p.start()
        if cpuset is not None:  # mirror bench --isolate: pin the narrow leg
            import os

            os.sched_setaffinity(p.pid, cpuset)
    for p in procs:
        p.join()
    wall = time.time() - t0
    total = sum(q.get() for _ in procs)
    return total / wall / n_procs  # pages/s per process


def main():
    import os

    args = [a for a in sys.argv[1:] if a != "--isolate"]
    isolate = "--isolate" in sys.argv  # pin the narrow leg to a fixed cpuset
    seconds = float(args[0]) if args else 10.0
    # MP_CEILING_PROCS="2,8" probes a different N→4N pair (matches
    # bench.py's GRAFT_SCALING_CPUS); default is the 8→32 headline pair
    narrow, wide = (int(x) for x in os.environ.get("MP_CEILING_PROCS", "8,32").split(","))
    n_box = os.cpu_count() or wide
    r8 = run(narrow, seconds, cpuset=set(range(narrow)) if isolate and narrow < n_box else None)
    time.sleep(3)
    r32 = run(wide, seconds, cpuset=set(range(wide)) if isolate and wide < n_box else None)
    print(
        json.dumps(
            {
                "metric": f"mp_weak_scaling_ceiling_{narrow}_to_{wide}",
                "value": round(r32 / r8, 3),
                "unit": "ratio",
                f"pages_per_sec_per_proc_{narrow}": round(r8, 1),
                f"pages_per_sec_per_proc_{wide}": round(r32, 1),
                "seconds_per_run": seconds,
                "isolated_narrow_leg": isolate,
            }
        )
    )


if __name__ == "__main__":
    main()
