"""Simulated-fetch actor stage: politeness-aware retry + deterministic corpus.

The reference's downloader = Scrapy engine + CustomRetryMiddleware
(reference: goto_eat_scrapy/middlewares.py:109-130 — exponential backoff
``2**n + rand(0,1)`` seconds, RETRY_TIMES=8, settings.py:119).  Here the
fetch stage is a ``map_batches`` CALLABLE CLASS — one PageStore + retry
policy per actor, built once in ``__init__`` (SURVEY.md §7.2) — that:

  * synthesizes the page for each frontier row from the deterministic
    corpus (zero-copy in: ``batch_format="pyarrow"``),
  * retries retryable statuses in-line with a *virtual-time* backoff
    (blind Ray task retries would re-hammer a host, SURVEY.md §4.2 —
    retry must stay politeness-aware inside the worker),
  * emits terminal failures as error rows (status kept), never exceptions,
  * optionally sleeps ``latency_ms * time_scale`` to emulate network for
    scheduling realism (0 by default: the bench measures engine, not
    sleeps — BASELINE.md).

Fetch completion time is virtual: ``fetched_at = sched_ts + latency +
backoff``; downstream discovery times derive from it, which is what makes
visit ordering reproducible across parallelism levels.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..sources.pagestore import PageStore, ScaleSpec

RETRY_TIMES = 8  # reference settings.py:119


def fetch_simulated(store: PageStore, url: str, method: str, form: dict, sched_ts: float, meta: dict, browser_factory=None, max_retries: int = RETRY_TIMES):
    """THE single simulated-fetch implementation: retry/backoff on the
    virtual clock, browser-kind dispatch, terminal failures as 503 rows.
    All three fetch surfaces (FetchWorker actor, stateless fetch_batch,
    chain-follower fetch_one) and the reference simulator call this —
    retry semantics live in exactly one place.

    -> (status, content_type, body, latency_ms, attempts, fetched_at)"""
    if meta.get("fetch_kind") == "browser" and browser_factory is not None:
        body = browser_factory().render(url)
        return 200, "text/html", body, 500, 1, sched_ts + 0.5
    page = store.get(url, method, form)
    t, att = sched_ts, 1
    while att <= page.retryable_failures and att <= max_retries:
        t += _backoff_s(att, url)
        att += 1
    ok = att > page.retryable_failures
    return (page.status if ok else 503), page.content_type, (page.body if ok else b""), page.latency_ms, att, t + page.latency_ms / 1000.0


def _backoff_s(attempt: int, url: str) -> float:
    """Deterministic stand-in for `2**n + random()` (middlewares.py:123-127).
    crc32, NOT builtins.hash: str hash is randomized per process
    (PYTHONHASHSEED), which would make fetched_at — and everything
    downstream of it (discovery times, dedup tie-breaks, visit order) —
    differ between worker processes."""
    import zlib

    frac = (zlib.crc32(f"{url}|{attempt}".encode()) & 0xFFFF) / 0xFFFF
    return (2**attempt) + frac


class FetchWorker:
    """Actor-pool fetch stage: frontier batch -> page batch."""

    def __init__(self, scale_spec: ScaleSpec, time_scale: float = 0.0, max_retries: int = RETRY_TIMES):
        self.store = PageStore(scale_spec)  # per-actor, once
        self.time_scale = time_scale
        self.max_retries = max_retries
        self._browser = None  # lazily launched per actor (expensive init)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        urls = batch.column("url").to_pylist()
        methods = batch.column("method").to_pylist()
        forms = batch.column("form_json").to_pylist()
        scheds = batch.column("sched_ts").to_pylist()
        metas = batch.column("meta_json").to_pylist() if "meta_json" in batch.column_names else [""] * len(urls)
        n = len(urls)
        status, ctype, body, latency, attempts, fetched_at = [0] * n, [""] * n, [b""] * n, [0] * n, [0] * n, [0.0] * n

        def browser():
            if self._browser is None:
                self._browser = SimBrowser(self.store.spec)
            return self._browser

        for i in range(n):
            form = json.loads(forms[i]) if forms[i] else {}
            meta = json.loads(metas[i]) if metas[i] else {}
            status[i], ctype[i], body[i], latency[i], attempts[i], fetched_at[i] = fetch_simulated(
                self.store, urls[i], methods[i], form, scheds[i], meta, browser_factory=browser, max_retries=self.max_retries
            )
            if self.time_scale > 0:
                time.sleep(latency[i] * self.time_scale / 1000.0)
        return batch.append_column("status", pa.array(status, pa.int32())) \
            .append_column("content_type", pa.array(ctype, pa.string())) \
            .append_column("body", pa.array(body, pa.binary())) \
            .append_column("latency_ms", pa.array(latency, pa.int32())) \
            .append_column("attempts", pa.array(attempts, pa.int32())) \
            .append_column("fetched_at", pa.array(fetched_at, pa.float64()))


class SimBrowser:
    """Headless-browser fetch actor (reference: oita.py:19-46 playwright
    infinite scroll).  Expensive per-actor init (a real impl launches a
    browser here -> small ``concurrency``, one task in flight); ``render``
    drives the scroll loop: fetch /app, then content chunks until an empty
    chunk, concatenate into the final DOM — the page the parser sees."""

    def __init__(self, scale_spec: ScaleSpec):
        self.store = PageStore(scale_spec)  # real impl: playwright.launch()
        self.scrolls = 0

    def render(self, url: str) -> bytes:
        shell = self.store.get(url)
        if shell.status != 200:
            return shell.body
        parts = []
        n = 0
        while True:
            chunk = self.store.get(f"{url}/chunk/{n}")
            if chunk.status != 200 or not chunk.body:
                break  # scroll exhausted (oita stops on exception)
            parts.append(chunk.body.decode("utf-8", "replace"))
            self.scrolls += 1
            n += 1
        return ("<html><body>\n" + "\n".join(parts) + "\n</body></html>").encode()
