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


# Scrapy's default RETRY_HTTP_CODES (public docs) — the reference relies on
# them via CustomRetryMiddleware (middlewares.py:109-130)
RETRY_HTTP_CODES = frozenset({500, 502, 503, 504, 522, 524, 408, 429})
DEFAULT_USER_AGENT = "goto-eater-crawler-ray (+politeness-aware; requests)"


class HttpFetcher:
    """Real-network fetch over ``requests`` — the same result contract as
    :func:`fetch_simulated` (``(status, content_type, body, latency_ms,
    attempts, fetched_at)``), usable wherever the simulated fetcher is.

    Semantics mirrored from the reference's downloader stack:
      * in-worker retry with exponential backoff ``2**n + rand(0,1)``
        seconds on RETRY_HTTP_CODES and connection errors
        (middlewares.py:109-130, RETRY_TIMES settings.py:119);
        ``backoff_scale`` shrinks the real sleeps for tests;
      * per-host wall-clock crawl delay: consecutive requests to one host
        are spaced >= ``delay_s`` apart (DOWNLOAD_DELAY settings.py:32).
        The caller must route one host's rows through one fetcher — which
        the engine's chain-following fetch does by construction;
      * UA header on every request (settings.py:17-20 shape);
      * terminal failures are status rows (status 503 and empty body for
        exhausted retries / network errors), never exceptions;
      * per-cookiejar session isolation: ``meta={"cookiejar": key}``
        routes the request through a dedicated ``requests.Session`` —
        the reference crawls one host's areas through INDEPENDENT jars
        (yamaguchi.py:29 ``meta={"cookiejar": area}``), so two areas
        sharing one actor must not share cookies.

    Stateful -> built once per actor/task (sessions + host clocks), used
    per batch.  robots gating stays the scheduler's job, as in the
    simulated path.
    """

    def __init__(
        self,
        delay_s: float = 0.0,
        max_retries: int = RETRY_TIMES,
        timeout_s: float = 20.0,
        backoff_scale: float = 1.0,
        user_agent: str = DEFAULT_USER_AGENT,
    ):
        self.user_agent = user_agent
        self._sessions: dict[str, object] = {}  # cookiejar key -> Session
        self.session = self._session("")  # default jar (back-compat attr)
        self.delay_s = delay_s
        self.max_retries = max_retries
        self.timeout_s = timeout_s
        self.backoff_scale = backoff_scale
        self._next_free: dict[str, float] = {}  # host -> wall-clock next slot

    def _session(self, jar: str):
        """One pooled keep-alive Session per cookiejar key, built once per
        actor (Scrapy's CookiesMiddleware jar semantics)."""
        s = self._sessions.get(jar)
        if s is None:
            import requests

            s = self._sessions[jar] = requests.Session()
            s.headers["User-Agent"] = self.user_agent
        return s

    def _polite_wait(self, host: str):
        now = time.time()
        nxt = self._next_free.get(host, 0.0)
        if nxt > now:
            time.sleep(nxt - now)
            now = nxt
        self._next_free[host] = now + self.delay_s

    def fetch(self, url: str, method: str = "GET", form: dict | None = None, sched_ts: float = 0.0, meta: dict | None = None):
        import random
        from urllib.parse import urlsplit

        import requests

        host = urlsplit(url).netloc
        session = self._session(str((meta or {}).get("cookiejar", "")))
        attempts = 0
        t0 = time.time()
        while True:
            attempts += 1
            self._polite_wait(host)
            try:
                if method == "POST":
                    resp = session.post(url, data=form or {}, timeout=self.timeout_s)
                else:
                    resp = session.get(url, timeout=self.timeout_s)
                status, body = resp.status_code, resp.content
                ctype = resp.headers.get("Content-Type", "")
            except requests.RequestException:  # conn error == retryable
                status, body, ctype = 503, b"", ""
            retryable = status in RETRY_HTTP_CODES
            if not retryable or attempts > self.max_retries:
                break
            # middlewares.py:123-127 backoff, scaled for tests
            time.sleep(((2**attempts) + random.random()) * self.backoff_scale)
        fetched_at = time.time()
        latency_ms = int((fetched_at - t0) * 1000)
        if status in RETRY_HTTP_CODES:  # retries exhausted -> terminal 503 row
            return 503, ctype, b"", latency_ms, attempts, fetched_at
        return status, ctype, body, latency_ms, attempts, fetched_at


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
