"""kyoto — list→detail fan-out with label-keyed detail tables.

Reference configuration ported (kyoto.py:15-91):
  * domain kyoto-gotoeat.com, seed /?s=#keyword; DOWNLOAD_DELAY 1.2 s
    because every shop costs one extra detail request (kyoto.py:17-22)
  * list page: every main#main div.store-item's a.btnDetail href is one
    detail request (urljoin'd); pagination div[role=navigation]
    a[rel=next] (kyoto.py:24-38)
  * detail page main#main div.store-detail: shop name div.name; every
    other field is looked up by TH LABEL in the store-cont table —
    th contains ジャンル/エリア/住所/電話番号/営業時間/定休日/"U R L"
    (with its literal inner spaces) -> following td (kyoto.py:40-83);
    tel/opening/closing are never stripped by the reference
  * latlng from the div.store-cont iframe src ``q=lat,lng`` query
    (kyoto.py:85-89)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("kyoto-gotoeat.com",)
START_URLS = ("https://kyoto-gotoeat.com/?s=#keyword",)

_Q_LATLNG = re.compile(r"q=(?P<lat>\d+\.\d+)\,(?P<lng>\d+\.\d+)")


def _label_td(table_scope: Node, label: str) -> Node | None:
    """XPath ``tr/th[contains(text(), label)]/following-sibling::td``."""
    for tr in sel(table_scope, "table tr"):
        th = sel_one(tr, "th")
        if th is not None and label in th.text():
            return sel_one(tr, "td")
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    if sel_one(doc, "main#main div.store-detail") is not None:  # content routing, mirroring the scripted family
        return detail(url, body, meta, depth)
    res = ParseResult()
    for card in sel(doc, "main#main div.store-item"):
        a = sel_one(card, "a.btnDetail")
        if a is not None and a.attr("href"):
            href = urljoin(url, a.attr("href").strip())  # response.urljoin (kyoto.py:27)
            res.links.append(_link(href, callback="detail"))
            res.spans.append(("link", "詳細", href))

    nxt = sel(doc, "div[role=navigation] a[rel=next]")
    if nxt and nxt[0].attr("href"):  # absent on last page (kyoto.py:31-33)
        res.links.append(_link(nxt[0].attr("href")))
        res.spans.append(("link", "次へ", nxt[0].attr("href")))
    return res


def detail(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    article = sel_one(doc, "main#main div.store-detail")
    if article is None:
        return res
    item = dict(_EMPTY_ITEM)
    name = sel_one(article, "div.name")
    item["shop_name"] = name.itext().strip() if name else None

    cont = sel_one(article, "div.store-cont") or article

    def field(label: str, strip: bool = True) -> str | None:
        td = _label_td(cont, label)
        if td is None:
            return None
        t = td.itext()
        t = t.strip() if strip else t
        return t or None

    item["genre_name"] = field("ジャンル")
    item["area_name"] = field("エリア")
    item["address"] = field("住所")
    item["tel"] = field("電話番号", strip=False)  # raw .get() (kyoto.py:68-73)
    item["opening_hours"] = field("営業時間", strip=False)
    item["closing_day"] = field("定休日", strip=False)
    url_td = _label_td(cont, "U R L")  # the site's literal spaced label (kyoto.py:80)
    if url_td is not None:
        a = sel_one(url_td, "a")
        item["official_page"] = a.attr("href") if a else None

    iframe = sel_one(cont, "iframe")
    m = _Q_LATLNG.search(iframe.attr("src") or "") if iframe is not None else None
    if m:
        item["provided_lat"], item["provided_lng"] = m.group("lat"), m.group("lng")

    res.items.append(item)
    res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
    res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "kyoto", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="kyoto",
    family="site_kyoto",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "detail": detail},
    crawl_delay_s=1.2,  # reference custom_settings (kyoto.py:20-22)
)
