"""shimane — list→detail fan-out with detail-URL query strip and
whitespace-squeezed genre.

Reference configuration ported (shimane.py:9-66):
  * domain gotoeat-shimane.jp, seed /inshokuten/ (shimane.py:16-17)
  * list page: every div#main div.com-location ul li a href is one
    detail request, urljoin'd; pagination nav.pagination span.next
    a[rel=next], urljoin'd (shimane.py:19-36)
  * detail page: the ?page=xxx echo (list-pagination return state) is
    stripped from detail_page via the replace(query,"")[:-1] dance
    (shimane.py:43-47); area div.com-location p[class*=area] span;
    name h1.title; address div.info.line.addr p; official page
    div.info.line.url p TEXT (not an href); closing day
    div.info.holidays p, raw; genre div.info.select.genre p span with
    ALL whitespace squeezed ("".join(split()), shimane.py:60-61);
    tel optional, stripped (shimane.py:63-64)
"""

from __future__ import annotations

import urllib.parse
from urllib.parse import urljoin

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-shimane.jp",)
START_URLS = ("https://www.gotoeat-shimane.jp/inshokuten/",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    if sel_one(doc, "h1.title") is not None:  # content routing to the detail shape
        return detail(url, body, meta, depth)
    res = ParseResult()
    for card in sel(doc, "div#main div.com-location ul li"):
        a = sel_one(card, "a")
        if a is not None and a.attr("href"):
            href = urljoin(url, a.attr("href"))
            res.links.append(_link(href, callback="detail"))
            res.spans.append(("link", "詳細", href))

    nxt = sel_one(doc, "nav.pagination span.next a[rel=next]")
    if nxt is not None and nxt.attr("href"):  # absent on last page (shimane.py:28-31)
        href = urljoin(url, nxt.attr("href"))
        res.links.append(_link(href))
        res.spans.append(("link", "次へ", href))
    return res


def detail(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    item = dict(_EMPTY_ITEM)

    q = urllib.parse.urlparse(url).query  # ?page=xxx echo strip (shimane.py:43-47)
    item["detail_page"] = url.replace(q, "")[:-1] if q else url

    area = sel_one(doc, "div[class*=com-location] p[class*=area] span")
    item["area_name"] = area.itext().strip() if area else None
    h1 = sel_one(doc, "h1.title")
    item["shop_name"] = h1.itext().strip() if h1 else None
    addr = sel_one(doc, "div.info.line.addr p")
    item["address"] = addr.itext().strip() if addr else None
    hp = sel_one(doc, "div.info.line.url p")
    item["official_page"] = hp.itext() or None if hp else None  # TEXT, raw (shimane.py:56)
    holidays = sel_one(doc, "div.info.holidays p")
    item["closing_day"] = holidays.itext() or None if holidays else None
    genre = sel_one(doc, "div.info.select.genre p span")
    g = genre.itext() if genre else None
    item["genre_name"] = "".join(g.split()) if g else None  # squeeze ALL whitespace (shimane.py:60-61)
    tel = sel_one(doc, "div.info.line.tel p")
    t = tel.itext() if tel else None
    item["tel"] = t.strip() if t else None

    res.items.append(item)
    res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
    res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "shimane", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="shimane",
    family="site_shimane",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "detail": detail},
    crawl_delay_s=3.0,
)
