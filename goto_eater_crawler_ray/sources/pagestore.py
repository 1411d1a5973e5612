"""Deterministic synthetic page store — the simulated-fetch corpus.

The reference achieves determinism with a never-expiring HTTP cache
(reference: goto_eat_scrapy/settings.py:90-94, README.md:69-73): a re-run
replays identical bytes.  This module is the Ray-native equivalent *and*
the test/bench input generator: every page body is a pure function of its
URL (+ POST form), so the corpus needs no materialization — a 10^10-URL
frontier is generated on the fly inside fetch workers.

One "site" per reference parser family (SURVEY.md §2.9 families):

  paginated    rel=next chain                      (tochigi/osaka/… family)
  pagesynth    javascript: href -> URL synthesis   (aomori/shizuoka/…)
  listdetail   list -> detail fan-out              (kyoto/gifu/mie/…)
  areafanout   POST form per area, no paging       (iwate/miyagi/…)
  mesh         geo-bbox JSON API, mega-host skew   (chiba/kanagawa/shiga liny)
  jsonapi      positional-array JSON               (kochi)
  jsonhtml     JSON-wrapped HTML, active==next     (yamagata)
  filetab      CSV / coded-CSV / XLSX / PDF files  (akita/fukuoka/nara/tokyo)
  scripted     token handshake + POST + paged GET  (hokkaido script)
  blocked      robots Disallow-all host            (kochi exclusion, main.py:32)

Ground truth (expected items / spans / link closure / visit order) is
computed from the same generator functions, giving golden parity tests
(FIXTURES.md §3-5) without hand-written fixtures.

XLSX and PDF bodies are STUBS by design: the real decode libraries are not
in this container (FIXTURES.md notes; multimodal guidance).  An "xlsx"
body is a deterministic TSV fake and a "pdf" body is form-feed-separated
CSV pages; the Ray-side plumbing (binary bodies, media spans, per-page
fan-out) is real and tested, and the decoders are clearly marked.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from urllib.parse import parse_qsl, urlencode, urlsplit

# ---------------------------------------------------------------------------
# deterministic value generation
# ---------------------------------------------------------------------------

_NAMES = ["酒処 山田", "麺屋 一番", "カフェ モカ", "焼肉 大将", "寿司 千石", "食堂 みどり", "居酒屋 ほたる", "洋食 キッチン北", "蕎麦 重兵衛", "中華 龍鳳"]
_TOWNS = ["山下町", "本町", "駅前町", "中央", "旭町", "栄町", "寿町", "港町"]
_GENRES = ["居酒屋", "寿司", "ラーメン", "カフェ", "焼肉", "定食", "イタリアン", "中華"]
_HOURS = ["11:00-22:00", "17:00-23:00", "10:30-20:00", "11:30-14:30/17:00-21:00"]
_CLOSED = ["月曜", "火曜", "水曜", "年中無休", "不定休"]


def _h64(*parts: object) -> int:
    return int.from_bytes(hashlib.md5("|".join(map(str, parts)).encode("utf-8")).digest()[:8], "big")


@dataclass
class Shop:
    """One golden shop record: clean (post-normalize) field values plus the
    quirk selectors the page renderer uses to dirty them (SURVEY.md §2.3)."""

    shop_name: str
    address: str
    tel: str
    genre_name: str | None
    zip_code: str | None
    official_page: str | None
    opening_hours: str
    closing_day: str
    area_name: str | None
    provided_lat: str | None
    provided_lng: str | None
    # quirk selectors
    zip_variant: int = 0  # 0: '〒zip addr', 1: '〒zipaddr' (zero-space), 2: no zip
    tel_prefix: str = ""
    genre_delim: str = "、"
    latlng_variant: int = 0  # 0: /@lat,lng, 1: ?q=, 2: markers=
    name_break: bool = False  # inject <br> into shop_name in HTML
    photo: str | None = None  # inline <img> -> interleaved image span


def make_shop(host: str, page: int, row: int, area: str | None = None) -> Shop:
    h = _h64(host, page, row)
    name = f"{_NAMES[h % len(_NAMES)]} {host.split('.')[0]}{page}-{row}号店"
    zip_variant = h // 7 % 3
    zip_code = f"{100 + h % 900:03d}-{h // 13 % 10000:04d}" if zip_variant != 2 else None
    address = f"{_TOWNS[h // 3 % len(_TOWNS)]}{1 + h % 30}-{1 + h // 5 % 20}"
    tel = f"0{1 + h % 9}{h // 11 % 10}-{100 + h // 17 % 900}-{1000 + h // 23 % 9000}"
    n_genres = h // 29 % 3 + (0 if h % 31 == 0 else 1)  # occasionally 0 genres
    genres = [_GENRES[(h // (37 + i)) % len(_GENRES)] for i in range(n_genres)]
    genre_name = "|".join(dict.fromkeys(genres)) if genres else None
    lat = f"{34 + h % 6}.{h // 41 % 1000000:06d}"
    lng = f"{130 + h % 10}.{h // 43 % 1000000:06d}"
    has_latlng = h // 47 % 4 != 0
    official = f"http://shop{h % 10000}.example.com/" if h // 53 % 3 != 0 else None
    return Shop(
        shop_name=name,
        address=address,
        tel=tel,
        genre_name=genre_name,
        zip_code=zip_code,
        official_page=official,
        opening_hours=_HOURS[h // 59 % len(_HOURS)],
        closing_day=_CLOSED[h // 61 % len(_CLOSED)],
        area_name=area,
        provided_lat=lat if has_latlng else None,
        provided_lng=lng if has_latlng else None,
        zip_variant=zip_variant,
        tel_prefix=["", "TEL:", "TEL.", "tel:", "TEL : "][h // 67 % 5],
        genre_delim=["、", "｜", ","][h // 71 % 3],
        latlng_variant=h // 73 % 3,
        name_break=h // 79 % 5 == 0,
        photo=f"http://img.example.com/shop{h % 100000}.jpg" if h // 83 % 3 == 0 else None,
    )


# --- rendering helpers (clean -> dirty page fragments) ----------------------


def _render_name(s: Shop) -> str:
    if s.name_break and len(s.shop_name) > 4:
        mid = len(s.shop_name) // 2
        return s.shop_name[:mid] + "<br>" + s.shop_name[mid:]
    return s.shop_name


def _render_place(s: Shop) -> str:
    if s.zip_variant == 0 and s.zip_code:
        return f"〒{s.zip_code} {s.address}"
    if s.zip_variant == 1 and s.zip_code:
        return f"〒{s.zip_code}{s.address}"
    return s.address


def _render_tel(s: Shop) -> str:
    return f"{s.tel_prefix}{s.tel}"


def _render_genres(s: Shop) -> str:
    if not s.genre_name:
        return ""
    return s.genre_delim.join(s.genre_name.split("|"))


def _render_map_href(s: Shop) -> str | None:
    if s.provided_lat is None:
        return None
    if s.latlng_variant == 0:
        return f"https://maps.example.com/maps/@{s.provided_lat},{s.provided_lng},15z/data=abc"
    if s.latlng_variant == 1:
        return f"https://maps.example.com/maps?q={s.provided_lat},{s.provided_lng}"
    return f"https://maps.example.com/staticmap?markers={s.provided_lat},{s.provided_lng}&zoom=14"


def render_shop_div(s: Shop) -> str:
    parts = [f'<div class="shop">', f"<h3>{_render_name(s)}</h3>"]
    if s.photo:
        parts.append(f'<img class="photo" src="{s.photo}">')
    parts.extend([f'<p class="place">{_render_place(s)}</p>', f'<p class="tel">{_render_tel(s)}</p>'])
    g = _render_genres(s)
    if g:
        parts.append(f'<p class="genre">{g}</p>')
    m = _render_map_href(s)
    if m:
        parts.append(f'<a class="map" href="{m}">地図</a>')
    if s.official_page:
        parts.append(f'<a class="hp" href="{s.official_page}">HP</a>')
    parts.append(f'<p class="hours">営業時間: {s.opening_hours}</p>')
    parts.append(f'<p class="closed">定休日: {s.closing_day}</p>')
    parts.append("</div>")
    return "\n".join(parts)


def expected_item(s: Shop, prefecture: str, source_url: str, row_in_page: int, detail_page: str | None = None) -> dict:
    """Golden post-normalize ShopItem row (reference 12-col order,
    settings.py:100-113) + keys."""
    return {
        "shop_name": s.shop_name,
        "address": s.address,
        "tel": s.tel,
        "genre_name": s.genre_name,
        "zip_code": s.zip_code,
        "official_page": s.official_page,
        "opening_hours": s.opening_hours,
        "closing_day": s.closing_day,
        "area_name": s.area_name,
        "detail_page": detail_page,
        "provided_lat": s.provided_lat,
        "provided_lng": s.provided_lng,
        "prefecture": prefecture,
        "source_url": source_url,
        "row_in_page": row_in_page,
    }


def expected_shop_spans(s: Shop) -> list[tuple[str, str, str]]:
    """Golden (kind, text, media_ref) sub-sequence for one shop div —
    interleaved text+media per the input_hint."""
    spans = [("text", s.shop_name, "")]
    if s.photo:
        spans.append(("image", "", s.photo))
    spans.extend([("text", s.address, ""), ("text", s.tel, "")])
    m = _render_map_href(s)
    if m:
        spans.append(("link", "地図", m))
    if s.official_page:
        spans.append(("link", "HP", s.official_page))
    return spans


# ---------------------------------------------------------------------------
# site corpus
# ---------------------------------------------------------------------------


@dataclass
class Page:
    url: str
    status: int
    content_type: str
    body: bytes
    links: list[str] = field(default_factory=list)  # ground-truth out-links
    latency_ms: int = 0
    retryable_failures: int = 0  # first N attempts return 503


@dataclass
class ScaleSpec:
    """Corpus size knobs (FIXTURES.md §7)."""

    paginated_hosts: int = 1
    pages_per_host: int = 5
    shops_per_page: int = 4
    detail_hosts: int = 1
    areas: int = 3
    mesh_count: int = 40  # mega-host skew case
    with_failures: bool = True

    @classmethod
    def golden(cls):
        return cls()

    @classmethod
    def e2e(cls):
        return cls(paginated_hosts=8, pages_per_host=12, shops_per_page=6, detail_hosts=2, areas=5, mesh_count=400)

    @classmethod
    def bench(cls, paginated_hosts=24576, pages_per_host=8, shops_per_page=40, mesh_count=16000):
        # wide-and-shallow: hundreds of hosts with 16-page chains (the wave
        # count is the max chain depth; breadth is what parallelizes)
        return cls(
            paginated_hosts=paginated_hosts,
            pages_per_host=pages_per_host,
            shops_per_page=shops_per_page,
            detail_hosts=8,
            areas=8,
            mesh_count=mesh_count,
            with_failures=False,
        )


class PageStore:
    """Pure-function page corpus: ``get(url, method, form) -> Page``.

    Stateless and cheaply picklable — each fetch actor holds one (cost: the
    ScaleSpec dataclass, not the pages)."""

    def __init__(self, spec: ScaleSpec):
        self.spec = spec

    # ---------------- seeds + politeness -------------------------------
    def seeds(self) -> list[dict]:
        sp = self.spec
        rows: list[dict] = []

        def seed(prefecture, url, method="GET", form=None, meta=None):
            rows.append(
                {
                    "prefecture": prefecture,
                    "url": url,
                    "method": method,
                    "form": dict(form or {}),
                    "meta": dict(meta or {}),
                    "callback": "parse",
                    "depth": 0,
                }
            )

        for i in range(sp.paginated_hosts):
            seed(f"paginated{i}", f"http://paginated{i}.example.jp/list?page=1")
        seed("pagesynth", "http://pagesynth.example.jp/p/1")
        for i in range(sp.detail_hosts):
            seed(f"listdetail{i}", f"http://listdetail{i}.example.jp/list/1")
        for a in range(sp.areas):
            seed("areafanout", "http://areafanout.example.jp/search", method="POST", form={"area": f"area{a}"}, meta={"area_name": f"area{a}"})
        for m in range(sp.mesh_count):
            h = _h64("mesh", m)
            x1, y1 = 130 + h % 10, 30 + h // 7 % 10
            seed("mesh", f"http://mesh.example.jp/api/shops?x1={x1}.{m}&x2={x1}.{m + 1}&y1={y1}.0&y2={y1}.9", meta={"mesh": str(m)})
        seed("jsonapi", "http://jsonapi.example.jp/api/list")
        seed("jsmap", "http://jsmap.example.jp/shops")
        seed("browser", "http://browser.example.jp/app", meta={"fetch_kind": "browser"})
        seed("tagclass", "http://tagclass.example.jp/list")
        seed("jsonhtml", "http://jsonhtml.example.jp/api/page/1")
        seed("filetab", "http://files.example.jp/index.html")
        seed("scripted", "http://scripted.example.jp/search")
        seed("blocked", "http://blocked.example.jp/list")  # robots-excluded
        return rows

    def politeness_rows(self) -> list[dict]:
        sp = self.spec
        rows = [{"host": h, "crawl_delay_s": d, "robots_txt": "", "is_mega_host": False} for h, d in self._delays().items()]
        rows.append({"host": "mesh.example.jp", "crawl_delay_s": 1.5, "robots_txt": "", "is_mega_host": True})
        rows.append({"host": "blocked.example.jp", "crawl_delay_s": 3.0, "robots_txt": "User-agent: *\nDisallow: /\n", "is_mega_host": False})
        return rows

    def _delays(self) -> dict[str, float]:
        sp = self.spec
        d = {}
        for i in range(sp.paginated_hosts):
            d[f"paginated{i}.example.jp"] = [3.0, 1.25, 1.5, 2.0][i % 4]  # reference override values
        d["pagesynth.example.jp"] = 1.0
        for i in range(sp.detail_hosts):
            d[f"listdetail{i}.example.jp"] = 1.2  # kyoto.py:21
        d["areafanout.example.jp"] = 3.0
        d["jsonapi.example.jp"] = 3.0
        d["jsmap.example.jp"] = 3.0
        d["browser.example.jp"] = 2.0
        d["tagclass.example.jp"] = 3.0
        d["jsonhtml.example.jp"] = 3.0
        d["files.example.jp"] = 3.0
        d["scripted.example.jp"] = 2.0
        return d

    # ---------------- page synthesis ------------------------------------
    def get(self, url: str, method: str = "GET", form: dict | None = None) -> Page:
        u = urlsplit(url)
        host, path, query = u.netloc, u.path, dict(parse_qsl(u.query))
        fam = host.split(".")[0].rstrip("0123456789")
        fn = getattr(self, f"_page_{fam}", None)
        if fn is None:
            return Page(url, 404, "text/html", b"<html>404</html>")
        page = fn(url, host, path, query, form or {})
        h = _h64("net", url, urlencode(sorted((form or {}).items())))
        page.latency_ms = 5 + h % 45
        if self.spec.with_failures and h % 17 == 0:
            page.retryable_failures = 1 + h // 19 % 2  # 503 on first 1-2 attempts
        return page

    # each _page_* returns Page with ground-truth .links

    def _page_paginated(self, url, host, path, query, form) -> Page:
        sp = self.spec
        pno = int(query.get("page", "1"))
        if path != "/list" or not (1 <= pno <= sp.pages_per_host):
            return Page(url, 404, "text/html", b"404")
        shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
        body = "<html><body>\n" + "\n".join(render_shop_div(s) for s in shops)
        links = []
        if pno < sp.pages_per_host:
            nxt = f"/list?page={pno + 1}"
            body += f'\n<a rel="next" href="{nxt}">次へ</a>'
            links.append(f"http://{host}{nxt}")
        body += "\n</body></html>"
        return Page(url, 200, "text/html", body.encode(), links)

    def _page_pagesynth(self, url, host, path, query, form) -> Page:
        # pagination via javascript: href; parser must SYNTHESIZE /p/{n+1}
        # (reference: aomori.py:50-58, shizuoka.py:49-58)
        sp = self.spec
        pno = int(path.rsplit("/", 1)[-1])
        if pno < 1 or pno > sp.pages_per_host:
            return Page(url, 404, "text/html", b"404")
        shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
        body = "<html><body>\n" + "\n".join(render_shop_div(s) for s in shops)
        links = []
        if pno < sp.pages_per_host:
            body += f'\n<a class="pager" href="javascript:on_events({pno + 1})">次へ</a>'
            links.append(f"http://{host}/p/{pno + 1}")
        body += "\n</body></html>"
        return Page(url, 200, "text/html", body.encode(), links)

    def _page_listdetail(self, url, host, path, query, form) -> Page:
        # 2-level crawl tree (reference: kyoto.py:24-38, gifu.py:31-50)
        sp = self.spec
        if path.startswith("/list/"):
            pno = int(path.rsplit("/", 1)[-1])
            if pno < 1 or pno > sp.pages_per_host:
                return Page(url, 404, "text/html", b"404")
            links, rows = [], []
            for r in range(sp.shops_per_page):
                d = f"/detail/{pno}-{r}"
                rows.append(f'<li><a class="detail" href="{d}">{make_shop(host, pno, r).shop_name}</a></li>')
                links.append(f"http://{host}{d}")
            body = "<html><body><ul>\n" + "\n".join(rows)
            if pno < sp.pages_per_host:
                nxt = f"/list/{pno + 1}"
                body += f'\n</ul><a rel="next" href="{nxt}">次へ</a>'
                links.append(f"http://{host}{nxt}")
            else:
                body += "\n</ul>"
            body += "</body></html>"
            return Page(url, 200, "text/html", body.encode(), links)
        if path.startswith("/detail/"):
            pno, r = map(int, path.rsplit("/", 1)[-1].split("-"))
            s = make_shop(host, pno, r)
            # th-label table extraction (kyoto.py:45-82)
            body = (
                "<html><body><table>\n"
                f"<tr><th>店名</th><td>{_render_name(s)}</td></tr>\n"
                f"<tr><th>所在地</th><td>{_render_place(s)}</td></tr>\n"
                f"<tr><th>電話番号</th><td>{_render_tel(s)}</td></tr>\n"
                f"<tr><th>ジャンル</th><td>{_render_genres(s)}</td></tr>\n"
                f"<tr><th>営業時間</th><td>{s.opening_hours}</td></tr>\n"
                f"<tr><th>定休日</th><td>{s.closing_day}</td></tr>\n"
                "</table>"
            )
            m = _render_map_href(s)
            if m:
                body += f'\n<iframe src="{m}"></iframe>'
            if s.official_page:
                body += f'\n<a class="hp" href="{s.official_page}">公式</a>'
            body += "</body></html>"
            return Page(url, 200, "text/html", body.encode(), [])
        return Page(url, 404, "text/html", b"404")

    def _page_areafanout(self, url, host, path, query, form) -> Page:
        # POST search per area, single page (reference: iwate.py:55-64)
        sp = self.spec
        area = form.get("area", "")
        if path != "/search" or not area:
            return Page(url, 404, "text/html", b"404")
        shops = [make_shop(host, _h64(area) % 97, r, area=area) for r in range(sp.shops_per_page)]
        body = f"<html><body><h2>[ {area} ]</h2>\n" + "\n".join(render_shop_div(s) for s in shops) + "\n</body></html>"
        return Page(url, 200, "text/html", body.encode(), [])

    def _page_mesh(self, url, host, path, query, form) -> Page:
        # liny-style bbox JSON API; mega-host (reference: abstract_liny.py:39-66)
        mesh_id = _h64(query.get("x1", ""), query.get("y1", ""))
        n = mesh_id % 4  # 0..3 shops per mesh
        data = []
        for r in range(n):
            s = make_shop(host, mesh_id % 10000, r)
            data.append(
                {
                    "name": s.shop_name,
                    "address": s.address,
                    "tel": s.tel,
                    "genre": s.genre_name.split("|") if s.genre_name else [],
                    "lat": float(s.provided_lat) if s.provided_lat else None,
                    "lng": float(s.provided_lng) if s.provided_lng else None,
                }
            )
        return Page(url, 200, "application/json", json.dumps({"data": data}, ensure_ascii=False).encode(), [])

    def _page_jsonapi(self, url, host, path, query, form) -> Page:
        # positional-array JSON (reference: kochi.py:22-39) with the
        # special-case quirk tail planted (functions/overrides.py rules):
        # row 0 broken display name (kochi.py:41-46 shape), row 1 missing
        # name (osaka.py:52-56 shape)
        sp = self.spec
        rows = []
        for r in range(sp.shops_per_page * 2):
            s = make_shop(host, 1, r)
            name = s.shop_name
            if r == 0:
                name = "<きてみいや>"
            elif r == 1:
                name = ""
            rows.append([name, s.address, s.tel, _render_genres(s), s.opening_hours, s.closing_day])
        return Page(url, 200, "application/json", json.dumps({"shops": rows}, ensure_ascii=False).encode(), [])

    def _page_jsonhtml(self, url, host, path, query, form) -> Page:
        # JSON-wrapped HTML + pager with active==next termination
        # (reference: yamagata.py:82-84, 115-143)
        sp = self.spec
        pno = int(path.rsplit("/", 1)[-1])
        if pno < 1 or pno > sp.pages_per_host:
            return Page(url, 404, "application/json", b"{}")
        shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
        html = "\n".join(render_shop_div(s) for s in shops)
        nxt = pno + 1 if pno < sp.pages_per_host else pno  # active==next on last
        payload = {"html": html, "pager": {"active": pno, "next": nxt}}
        links = [f"http://{host}/api/page/{nxt}"] if nxt != pno else []
        return Page(url, 200, "application/json", json.dumps(payload, ensure_ascii=False).encode(), links)

    def _page_files(self, url, host, path, query, form) -> Page:
        sp = self.spec
        nrows = sp.shops_per_page * 3
        if path == "/index.html":
            body = (
                "<html><body>\n"
                '<a class="file" href="/data/shops.csv">シンプルCSV</a>\n'
                '<a class="file" href="/data/shops_coded.csv">コード付きCSV</a>\n'
                '<a class="file" href="/data/shops.xlsx">エクセル一覧</a>\n'
                '<a class="file" href="/data/shops.pdf">PDF一覧</a>\n'
                "</body></html>"
            )
            links = [f"http://{host}/data/shops.csv", f"http://{host}/data/shops_coded.csv", f"http://{host}/data/shops.xlsx", f"http://{host}/data/shops.pdf"]
            return Page(url, 200, "text/html", body.encode(), links)
        if path == "/data/shops.csv":
            # headerless + furigana comment rows + empty-address rows to drop
            # (reference: akita.py:29-44)
            lines = []
            for r in range(nrows):
                s = make_shop(host, 100, r)
                if r % 7 == 3:
                    lines.append(f"（{s.shop_name}のフリガナ）,,")  # comment row: empty address
                lines.append(f"{s.shop_name},{s.address},{s.tel}")
            return Page(url, 200, "text/csv", "\n".join(lines).encode(), [])
        if path == "/data/shops_coded.csv":
            # genre int codes -> names (reference: fukuoka.py:20-37,65)
            lines = ["name,address,tel,genre_code"]
            for r in range(nrows):
                s = make_shop(host, 200, r)
                code = _h64(host, 200, r) % len(_GENRES)
                lines.append(f"{s.shop_name},{s.address},{s.tel},{code}")
            return Page(url, 200, "text/csv", "\n".join(lines).encode(), [])
        if path == "/data/shops.xlsx":
            # STUB xlsx: deterministic TSV fake (no openpyxl in container);
            # plumbing (binary body, media span, tabular parse) is real.
            lines = ["FAKE-XLSX\tリスト"]
            for r in range(nrows):
                s = make_shop(host, 300, r)
                lines.append(f"{s.shop_name}\t{s.address}\t{s.tel}")
            return Page(url, 200, "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", "\n".join(lines).encode(), [])
        if path == "/data/shops.pdf":
            # STUB pdf: form-feed-separated "pages" of CSV with a header row
            # per page to drop (reference: tokyo.py:50-98 tabula pipeline).
            pages = []
            for p in range(3):
                lines = ["店名,所在地,電話番号"]
                for r in range(nrows // 3):
                    s = make_shop(host, 400 + p, r)
                    lines.append(f"{s.shop_name},{s.address},{s.tel}")
                pages.append("\n".join(lines))
            return Page(url, 200, "application/pdf", "\f".join(pages).encode(), [])
        return Page(url, 404, "text/html", b"404")

    def _page_scripted(self, url, host, path, query, form) -> Page:
        # session/CSRF handshake (reference: hokkaido.py:44-104)
        sp = self.spec
        token = f"tok{_h64(host) % 100000}"
        if path == "/search" and not form and "page" not in query:
            body = f'<html><body><form><input type="hidden" name="_token" value="{token}"></form></body></html>'
            return Page(url, 200, "text/html", body.encode(), [f"http://{host}/search?page=1&_token={token}"])
        if form and form.get("_token") != token:
            return Page(url, 403, "text/html", b"bad token")
        pno = int(query.get("page", "1"))
        if pno < 1 or pno > sp.pages_per_host:
            return Page(url, 404, "text/html", b"404")
        shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
        body = "<html><body>\n" + "\n".join(render_shop_div(s) for s in shops)
        links = []
        if pno < sp.pages_per_host:
            nxt = f"/search?page={pno + 1}&_token={token}"
            body += f'\n<a rel="next" href="{nxt}">次へ</a>'
            links.append(f"http://{host}{nxt}")
        body += "\n</body></html>"
        return Page(url, 200, "text/html", body.encode(), links)

    def _page_tagclass(self, url, host, path, query, form) -> Page:
        # niigata-style single tag per shop that is EITHER an area name or a
        # genre — the parser classifies by membership against the area list
        # (reference: niigata.py:19-57,78-89 tag classification)
        sp = self.spec
        from ..stages.parse import TAGCLASS_AREA_LIST

        divs = []
        for r in range(sp.shops_per_page * 2):
            s = make_shop(host, 7, r)
            h = _h64(host, "tag", r)
            if h % 2 == 0:
                tag = sorted(TAGCLASS_AREA_LIST)[h // 3 % len(TAGCLASS_AREA_LIST)]
            else:
                tag = _GENRES[h // 3 % len(_GENRES)]
            divs.append(
                f'<div class="shop"><h3>{_render_name(s)}</h3>'
                f'<p class="place">{_render_place(s)}</p>'
                f'<p class="tel">{_render_tel(s)}</p>'
                f'<p class="tag">{tag}</p></div>'
            )
        body = "<html><body>\n" + "\n".join(divs) + "\n</body></html>"
        return Page(url, 200, "text/html", body.encode(), [])

    def _page_browser(self, url, host, path, query, form) -> Page:
        # headless-browser target (reference: oita.py:19-46 — playwright
        # infinite scroll until exhaustion, then dump full HTML). The
        # corpus models the RENDERED result as scroll chunks the browser
        # actor concatenates: /app itself returns only a shell; the real
        # content lives at /app/chunk/N until a chunk is empty.
        sp = self.spec
        if path == "/app":
            return Page(url, 200, "text/html", b"<html><body><div id='list'></div><script>infiniteScroll()</script></body></html>", [])
        if path.startswith("/app/chunk/"):
            n = int(path.rsplit("/", 1)[-1])
            if n >= 3:  # scroll exhausted
                return Page(url, 200, "text/html", b"", [])
            shops = [make_shop(host, 500 + n, r) for r in range(sp.shops_per_page)]
            return Page(url, 200, "text/html", "\n".join(render_shop_div(s) for s in shops).encode(), [])
        return Page(url, 404, "text/html", b"404")

    def _page_jsmap(self, url, host, path, query, form) -> Page:
        # miyagi-style page: HTML shop list + JS marker array in <script>;
        # the parser joins them per page (shop_name equality AND item
        # address substring of marker address, unique match -> lat/lng)
        # (reference: miyagi.py:71-119, demjson for non-JSON JS literals)
        sp = self.spec
        shops = [make_shop(host, 1, r) for r in range(sp.shops_per_page * 2)]
        divs = []
        markers = []
        for r, s in enumerate(shops):
            h = _h64(host, "join", r)
            divs.append(
                f'<div class="shop"><h3>{_render_name(s)}</h3>'
                f'<p class="place">{_render_place(s)}</p>'
                f'<p class="tel">{_render_tel(s)}</p></div>'
            )
            if h % 7 == 3 or s.provided_lat is None:
                continue  # no marker -> 0 matches -> null latlng
            entry = f"{{name: '{s.shop_name}', address: '北海道{s.address}ビル2F', lat: {s.provided_lat}, lng: {s.provided_lng},}}"
            markers.append(entry)
            if h % 5 == 0:
                markers.append(entry)  # duplicate marker -> ambiguous -> null
        body = (
            "<html><body>\n" + "\n".join(divs) + "\n"
            "<script>const data = [" + ", ".join(markers) + "];</script>"
            "</body></html>"
        )
        return Page(url, 200, "text/html", body.encode(), [])

    def _page_blocked(self, url, host, path, query, form) -> Page:
        return Page(url, 200, "text/html", b"<html>should never be fetched</html>", [])

    # ---------------- ground truth --------------------------------------
    def expected_parse(self, prefecture: str, callback: str, url: str, method: str = "GET", form: dict | None = None) -> tuple[list[dict], list[tuple[str, str, str]]]:
        """Golden (post-normalize items, span (kind,text,media_ref) sequence)
        for one page — derived from the clean Shop records, independently of
        the parser (FIXTURES.md §3-4 parity surface)."""
        sp = self.spec
        u = urlsplit(url)
        host, path, query = u.netloc, u.path, dict(parse_qsl(u.query))
        fam = host.split(".")[0].rstrip("0123456789")
        form = form or {}
        items: list[dict] = []
        spans: list[tuple[str, str, str]] = []

        def add_shops(shops, next_href=None):
            for r, s in enumerate(shops):
                items.append(expected_item(s, prefecture, url, r))
                spans.extend(expected_shop_spans(s))
            if next_href:
                spans.append(("link", "次へ", next_href))

        if fam == "paginated":
            pno = int(query.get("page", "1"))
            shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
            add_shops(shops, f"/list?page={pno + 1}" if pno < sp.pages_per_host else None)
        elif fam == "pagesynth":
            pno = int(path.rsplit("/", 1)[-1])
            shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
            add_shops(shops, f"/p/{pno + 1}" if pno < sp.pages_per_host else None)
        elif fam == "listdetail" and path.startswith("/list/"):
            pno = int(path.rsplit("/", 1)[-1])
            for r in range(sp.shops_per_page):
                spans.append(("link", make_shop(host, pno, r).shop_name, f"/detail/{pno}-{r}"))
            if pno < sp.pages_per_host:
                spans.append(("link", "次へ", f"/list/{pno + 1}"))
        elif fam == "listdetail" and path.startswith("/detail/"):
            pno, r = map(int, path.rsplit("/", 1)[-1].split("-"))
            s = make_shop(host, pno, r)
            it = expected_item(s, prefecture, url, 0, detail_page=url)
            it["area_name"] = None
            items.append(it)
            spans = [("text", s.shop_name, ""), ("text", s.address, ""), ("text", s.tel, "")]
            m = _render_map_href(s)
            if m:
                spans.append(("link", "地図", m))
            if s.official_page:
                spans.append(("link", "公式", s.official_page))
        elif fam == "areafanout":
            area = form.get("area", "")
            shops = [make_shop(host, _h64(area) % 97, r, area=area) for r in range(sp.shops_per_page)]
            add_shops(shops)
        elif fam == "mesh":
            mesh_id = _h64(query.get("x1", ""), query.get("y1", ""))
            for r in range(mesh_id % 4):
                s = make_shop(host, mesh_id % 10000, r)
                it = expected_item(s, prefecture, url, r)
                # JSON round-trip: floats re-stringified (abstract_liny.py:62-63)
                it["provided_lat"] = None if s.provided_lat is None else f"{float(s.provided_lat)}"
                it["provided_lng"] = None if s.provided_lng is None else f"{float(s.provided_lng)}"
                # JSON payload carries only name/address/tel/genre/lat/lng
                it["zip_code"] = it["official_page"] = it["opening_hours"] = it["closing_day"] = None
                items.append(it)
                spans.append(("text", s.shop_name, ""))
                spans.append(("text", s.address, ""))
        elif fam == "jsonapi":
            # post-override golden values (functions/overrides.py BUILTIN_RULES)
            for r in range(sp.shops_per_page * 2):
                s = make_shop(host, 1, r)
                raw_name = "<きてみいや>" if r == 0 else ("" if r == 1 else s.shop_name)
                fixed_name = "　きてみいや".strip() if r == 0 else ("珉珉上新庄駅前店" if r == 1 else s.shop_name)
                it = dict.fromkeys(expected_item(s, prefecture, url, r))
                it.update(
                    shop_name=fixed_name,
                    address=f"鹿児島市{s.address}",
                    tel=s.tel,
                    genre_name=s.genre_name if s.genre_name else "その他",
                    opening_hours=s.opening_hours,
                    closing_day=s.closing_day,
                    prefecture=prefecture,
                    source_url=url,
                    row_in_page=r,
                )
                items.append(it)
                spans.append(("text", raw_name.strip(), ""))
                spans.append(("text", s.address, ""))
        elif fam == "tagclass":
            from ..stages.parse import TAGCLASS_AREA_LIST

            for r in range(sp.shops_per_page * 2):
                s = make_shop(host, 7, r)
                h = _h64(host, "tag", r)
                if h % 2 == 0:
                    tag = sorted(TAGCLASS_AREA_LIST)[h // 3 % len(TAGCLASS_AREA_LIST)]
                    area, genre = tag, None
                else:
                    tag = _GENRES[h // 3 % len(_GENRES)]
                    area, genre = None, tag
                it = dict.fromkeys(expected_item(s, prefecture, url, r))
                it.update(
                    shop_name=s.shop_name,
                    address=s.address,
                    zip_code=s.zip_code,
                    tel=s.tel,
                    area_name=area,
                    genre_name=genre,
                    prefecture=prefecture,
                    source_url=url,
                    row_in_page=r,
                )
                items.append(it)
                spans.append(("text", s.shop_name, ""))
                spans.append(("text", s.address, ""))
        elif fam == "browser" and path == "/app":
            shops = [make_shop(host, 500 + c, r) for c in range(3) for r in range(sp.shops_per_page)]
            add_shops(shops)
        elif fam == "jsmap":
            for r in range(sp.shops_per_page * 2):
                s = make_shop(host, 1, r)
                h = _h64(host, "join", r)
                matched = h % 7 != 3 and h % 5 != 0 and s.provided_lat is not None
                it = dict.fromkeys(expected_item(s, prefecture, url, r))
                it.update(
                    shop_name=s.shop_name,
                    address=s.address,
                    zip_code=s.zip_code if s.zip_variant != 2 else None,
                    tel=s.tel,
                    # markers round-trip through a JS float literal
                    provided_lat=f"{float(s.provided_lat)}" if matched else None,
                    provided_lng=f"{float(s.provided_lng)}" if matched else None,
                    prefecture=prefecture,
                    source_url=url,
                    row_in_page=r,
                )
                items.append(it)
                spans.append(("text", s.shop_name, ""))
                spans.append(("text", s.address, ""))
        elif fam == "jsonhtml":
            pno = int(path.rsplit("/", 1)[-1])
            shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
            add_shops(shops, f"/api/page/{pno + 1}" if pno < sp.pages_per_host else None)
        elif fam == "files" and path == "/index.html":
            spans = [
                ("csv", "シンプルCSV", "/data/shops.csv"),
                ("csv", "コード付きCSV", "/data/shops_coded.csv"),
                ("xlsx", "エクセル一覧", "/data/shops.xlsx"),
                ("pdf", "PDF一覧", "/data/shops.pdf"),
            ]
        elif fam == "files":
            nrows = sp.shops_per_page * 3
            from ..stages.parse import GENRE_CODE_TABLE  # avoid dup table

            def bare(s, r, genre=None):
                it = dict.fromkeys(expected_item(s, prefecture, url, r))
                it.update(shop_name=s.shop_name, address=s.address, tel=s.tel, genre_name=genre, prefecture=prefecture, source_url=url, row_in_page=r)
                return it

            if path == "/data/shops.csv":
                for r in range(nrows):
                    s = make_shop(host, 100, r)
                    items.append(bare(s, r))
                    spans.append(("text", s.shop_name, ""))
                    spans.append(("text", s.address, ""))
            elif path == "/data/shops_coded.csv":
                for r in range(nrows):
                    s = make_shop(host, 200, r)
                    code = _h64(host, 200, r) % len(_GENRES)
                    items.append(bare(s, r, genre=GENRE_CODE_TABLE[code]))
                    spans.append(("text", s.shop_name, ""))
                    spans.append(("text", s.address, ""))
            elif path == "/data/shops.xlsx":
                for r in range(nrows):
                    s = make_shop(host, 300, r)
                    items.append(bare(s, r))
                    spans.append(("text", s.shop_name, ""))
                    spans.append(("text", s.address, ""))
            elif path == "/data/shops.pdf":
                r_out = 0
                for p in range(3):
                    for r in range(nrows // 3):
                        s = make_shop(host, 400 + p, r)
                        items.append(bare(s, r_out))
                        spans.append(("text", s.shop_name, ""))
                        spans.append(("text", s.address, ""))
                        r_out += 1
        elif fam == "scripted":
            token = f"tok{_h64(host) % 100000}"
            if path == "/search" and "page" in query:
                pno = int(query["page"])
                shops = [make_shop(host, pno, r) for r in range(sp.shops_per_page)]
                add_shops(shops, f"/search?page={pno + 1}&_token={token}" if pno < sp.pages_per_host else None)
            # token handshake page: no items/spans
        # re-index row_in_page already set; fix item row numbering for shop pages
        for r, it in enumerate(items):
            it["row_in_page"] = r
        return items, spans

    def expected_reachable(self) -> set[str]:
        """BFS closure of the link graph from seeds, robots-allowed only
        (blocked.example.jp is seeded but disallowed)."""
        from collections import deque

        seen: set[str] = set()
        q: deque[tuple[str, str, tuple]] = deque()
        for s in self.seeds():
            if s["url"].startswith("http://blocked."):
                continue
            key = (s["url"], s["method"], tuple(sorted(s["form"].items())))
            q.append(key)
        while q:
            url, method, form = q.popleft()
            k = f"{method}|{url}|{urlencode(list(form))}"
            if k in seen:
                continue
            seen.add(k)
            page = self.get(url, method, dict(form))
            for link in page.links:
                q.append((link, "GET", ()))
        return seen
