"""Independent reference-semantics crawl simulator (no Ray, no engine code).

Implements the reference crawler's scheduling semantics directly
(SURVEY.md §2.2/§4.1): per-host strict serialization with crawl-delay,
robots gate, first-discovery-wins dedup, and the north-rule priority heap
(depth, host-budget-at-admission, discovery-time) — as a plain-Python
event loop over the same deterministic page store.

Purpose: the e2e test asserts the ENGINE's per-host visit order equals
THIS simulator's output exactly (SURVEY.md §5 'End-to-end' plan). The
simulator shares only the corpus and the parsers (the WHAT); none of the
engine's scheduling/admission/actor machinery (the HOW).
"""

from __future__ import annotations

import heapq
import json
from urllib.parse import urlencode, urlsplit

from goto_eater_crawler_ray.sources.pagestore import PageStore
from goto_eater_crawler_ray.stages.fetch import SimBrowser, fetch_simulated
from goto_eater_crawler_ray.stages.parse import parse_page
from goto_eater_crawler_ray.state.canonical import canonicalize
from goto_eater_crawler_ray.state.politeness import parse_robots, robots_allowed


def _request_key(method: str, canon: str, form: dict) -> bytes:
    import hashlib

    return hashlib.sha1(f"{method}|{canon}|{urlencode(sorted(form.items()))}".encode()).digest()


def simulate(store: PageStore, max_retries: int = 8) -> dict[bytes, dict]:
    """-> {url_key: {url, host, depth, visit_seq}} for every fetched page."""
    pol = {r["host"]: r for r in store.politeness_rows()}
    robots = {h: parse_robots(r.get("robots_txt") or "")[0] for h, r in pol.items()}
    delays = {h: float(r.get("crawl_delay_s") or 3.0) for h, r in pol.items()}
    browser = SimBrowser(store.spec)

    seen: set[bytes] = set()
    clocks: dict[str, float] = {}
    counters: dict[str, int] = {}
    out: dict[bytes, dict] = {}
    tie = 0
    heap: list = []

    def admit(url, method, form, meta, callback, prefecture, depth, disc):
        nonlocal tie
        canon = canonicalize(url)
        key = _request_key(method, canon, form)
        if key in seen:
            return
        seen.add(key)
        host = urlsplit(canon).netloc
        if not robots_allowed(urlsplit(canon).path or "/", robots.get(host, [])):
            return
        budget = clocks.get(host, 0.0)
        tie += 1
        heapq.heappush(heap, (depth, budget, disc, tie, canon, key, host, method, form, meta, callback, prefecture))

    for i, s in enumerate(store.seeds()):
        admit(s["url"], s["method"], s["form"], s["meta"], s["callback"], s["prefecture"], 0, i * 1e-6)

    while heap:
        depth, _, disc, _, url, key, host, method, form, meta, callback, prefecture = heapq.heappop(heap)
        delay = delays.get(host, 3.0)
        seq = counters.get(host, 0)
        ts = clocks.get(host, 0.0)
        counters[host] = seq + 1
        clocks[host] = ts + delay
        # fetch (browser rows render; retryable failures back off virtually)
        _status, _ct, body, _lat, _att, fetched_at = fetch_simulated(
            store, url, method, form, ts, meta, browser_factory=lambda: browser, max_retries=max_retries
        )
        out[key] = {"url": url, "host": host, "depth": depth, "visit_seq": seq}
        res = parse_page(prefecture, callback, url, body, meta, depth)
        for i, lk in enumerate(res.links):
            child_url = canonicalize(lk["url"], base=url)
            admit(child_url, lk["method"], lk["form"], lk["meta"], lk["callback"], prefecture, depth + 1, fetched_at + i * 1e-6)
    return out
