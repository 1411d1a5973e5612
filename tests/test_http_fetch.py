"""Real-network fetch path: HttpFetcher unit semantics (retry/backoff,
per-host politeness spacing, POST forms) and an end-to-end engine crawl
over a localhost HTTP server with visit-order invariants.

Mirrors the reference downloader contract: UA header + DOWNLOAD_DELAY
(settings.py:17-35), CustomRetryMiddleware backoff (middlewares.py:109-130).
"""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from goto_eater_crawler_ray.sites import fixtures

PAGE_TMPL = """
<html><body><div id="contents">
<ul class="serch_result">
  <li>
    <p class="name">店{n} <span class="genre">和食</span></p>
    <div class="add"><p>〒320-000{n} 宇都宮市{n}丁目</p><p><a>028-600-000{n}</a></p></div>
    <ul class="hp"></ul>
  </li>
</ul>
{next_link}
</div></body></html>
"""


class _SiteHandler(BaseHTTPRequestHandler):
    """3-page paginated mini-site; page 2 fails twice with 503 (retry
    exercise); every hit is timestamped for politeness assertions."""

    hits: list[tuple[float, str]] = []
    fail_left = {"/merchant/index.php?page=2": 2}
    lock = threading.Lock()

    def do_GET(self):
        with self.lock:
            type(self).hits.append((time.time(), self.path))
            left = self.fail_left.get(self.path, 0)
            if left > 0:
                self.fail_left[self.path] = left - 1
                self.send_response(503)
                self.end_headers()
                return
        if self.path == "/merchant/index.php":
            body = PAGE_TMPL.format(n=1, next_link='<ul><li class="next"><a href="/merchant/index.php?page=2">次</a></li></ul>')
        elif self.path == "/merchant/index.php?page=2":
            body = PAGE_TMPL.format(n=2, next_link='<ul><li class="next"><a href="/merchant/index.php?page=3">次</a></li></ul>')
        elif self.path == "/merchant/index.php?page=3":
            # links into robots-disallowed territory: the engine must fetch
            # the LIVE /robots.txt and never follow this (ROBOTSTXT_OBEY)
            body = PAGE_TMPL.format(n=3, next_link='<ul><li class="next"><a href="/private/index.php">次</a></li></ul>')
        elif self.path == "/private/index.php":
            body = PAGE_TMPL.format(n=4, next_link="")  # served if asked — robots must prevent the ask
        elif self.path == "/robots.txt":
            body = "User-agent: *\nDisallow: /private/\n"
        elif self.path.startswith("/cookie/set"):
            jar = self.path.split("=", 1)[1]
            payload = b"ok"
            self.send_response(200)
            self.send_header("Set-Cookie", f"who={jar}; Path=/")
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(payload)
            return
        elif self.path == "/cookie/echo":
            payload = (self.headers.get("Cookie") or "").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(payload)
            return
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        ln = int(self.headers.get("Content-Length", 0))
        form_raw = self.rfile.read(ln).decode()
        payload = json.dumps({"echo": form_raw}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def http_server():
    _SiteHandler.hits = []
    _SiteHandler.fail_left = {"/merchant/index.php?page=2": 2}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestHttpFetcher:
    def test_get_retry_then_ok(self, http_server):
        from goto_eater_crawler_ray.stages.fetch import HttpFetcher

        f = HttpFetcher(delay_s=0.0, backoff_scale=0.001)
        status, ctype, body, _lat, attempts, fetched_at = f.fetch(f"http://{http_server}/merchant/index.php?page=2")
        assert status == 200
        assert attempts == 3  # two 503s, then 200
        assert "店2" in body.decode()
        assert fetched_at <= time.time()

    def test_post_form(self, http_server):
        from goto_eater_crawler_ray.stages.fetch import HttpFetcher

        f = HttpFetcher(delay_s=0.0)
        status, _ctype, body, *_ = f.fetch(f"http://{http_server}/anything", method="POST", form={"page": "2", "text": ""})
        assert status == 200
        assert "page=2" in json.loads(body)["echo"]

    def test_politeness_spacing(self, http_server):
        from goto_eater_crawler_ray.stages.fetch import HttpFetcher

        f = HttpFetcher(delay_s=0.25)
        t0 = time.time()
        f.fetch(f"http://{http_server}/merchant/index.php")
        f.fetch(f"http://{http_server}/merchant/index.php?page=3")
        f.fetch(f"http://{http_server}/merchant/index.php")
        assert time.time() - t0 >= 0.5  # 3 same-host hits spaced >= delay

    def test_cookiejar_isolation(self, http_server):
        """meta={'cookiejar': key} -> independent sessions: two jars on ONE
        host must not leak cookies (reference yamaguchi.py:29 crawls areas
        through independent jars)."""
        from goto_eater_crawler_ray.stages.fetch import HttpFetcher

        f = HttpFetcher(delay_s=0.0)
        f.fetch(f"http://{http_server}/cookie/set?jar=A", meta={"cookiejar": "A"})
        f.fetch(f"http://{http_server}/cookie/set?jar=B", meta={"cookiejar": "B"})
        _, _, body_a, *_ = f.fetch(f"http://{http_server}/cookie/echo", meta={"cookiejar": "A"})
        _, _, body_b, *_ = f.fetch(f"http://{http_server}/cookie/echo", meta={"cookiejar": "B"})
        _, _, body_default, *_ = f.fetch(f"http://{http_server}/cookie/echo")
        assert body_a == b"who=A"
        assert body_b == b"who=B"
        assert body_default == b""  # default jar untouched by either

    def test_terminal_failure_is_row_not_exception(self):
        from goto_eater_crawler_ray.stages.fetch import HttpFetcher

        f = HttpFetcher(delay_s=0.0, max_retries=1, backoff_scale=0.001, timeout_s=0.5)
        status, _ctype, body, _lat, attempts, _ts = f.fetch("http://127.0.0.1:1/nope")
        assert status == 503 and body == b""
        assert attempts == 2  # initial + 1 retry


class TestHttpCrawlE2E:
    def test_engine_crawl_over_localhost(self, ray_session, http_server, tmp_path):
        """Full engine run with fetch_kind='http': chain-following fetch
        over a real socket, reference-shaped tochigi parse, in-worker
        retry, and the visit-order invariant (visit_seq == page order)."""
        import pyarrow.dataset as pads

        from goto_eater_crawler_ray.pipelines.crawl import CrawlEngine
        from goto_eater_crawler_ray.sites import reference_sites_registry
        from goto_eater_crawler_ray.sources.pagestore import ScaleSpec

        host = http_server
        with _SiteHandler.lock:  # re-arm the flaky page (unit tests above consume it)
            _SiteHandler.fail_left = {"/merchant/index.php?page=2": 2}
        seeds = [
            {
                "prefecture": "tochigi",
                "url": f"http://{host}/merchant/index.php",
                "method": "GET",
                "form": {},
                "meta": {},
                "callback": "parse",
                "depth": 0,
            }
        ]
        politeness = [{"host": host, "crawl_delay_s": 0.05, "robots_txt": "", "is_mega_host": False}]
        eng = CrawlEngine(
            ScaleSpec.golden(),
            str(tmp_path / "out"),
            n_seen_shards=2,
            n_sched_shards=1,
            registry=reference_sites_registry(),
            fetch_kind="http",
            http_opts={"delay_s": 0.05, "backoff_scale": 0.01},
            seeds=seeds,
            politeness=politeness,
        )
        totals = eng.run()
        eng.shutdown()
        # 3 pages, NOT 4: page 3 links to /private/index.php (which the
        # server happily serves), but the engine fetched the LIVE
        # /robots.txt at configure time and its 'Disallow: /private/'
        # gates the link — the static politeness robots_txt here is ''
        # (allow-all), so only the live fetch can explain the gating
        assert totals["pages"] == 3
        assert not any("/private/" in p for _, p in _SiteHandler.hits)
        assert any(p == "/robots.txt" for _, p in _SiteHandler.hits)

        tbl = pads.dataset(str(tmp_path / "out" / "parsed")).to_table()
        rows = sorted(tbl.to_pylist(), key=lambda r: r["visit_seq"])
        # visit order == pagination order (north-rule heap over one chain)
        assert [r["url"].rsplit("/", 1)[-1] for r in rows] == [
            "index.php",
            "index.php?page=2",
            "index.php?page=3",
        ]
        assert [r["visit_seq"] for r in rows] == [0, 1, 2]
        assert all(r["status"] == 200 for r in rows)
        # in-worker retry recorded on the flaky page
        assert rows[1]["attempts"] == 3
        # real parse produced one item per page through the site spec
        assert [len(r["items"]) for r in rows] == [1, 1, 1]
        assert rows[0]["items"][0]["shop_name"] == "店1"
