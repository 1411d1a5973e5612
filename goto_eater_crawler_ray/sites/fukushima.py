"""fukushima — paginated list with inline hidden-modal detail blocks.

Reference configuration ported (fukushima.py:9-63):
  * domain gotoeat-fukushima.jp, seed /shop/?s= (fukushima.py:16-17)
  * cards div.block_search-result ul.list_search-result > li; the
    visible anchor carries name h3.result-name span, address
    p.result-address span, genre p.result-cat span (fukushima.py:21-26)
  * the rest lives in the card's HIDDEN modal (div.mfp-hide
    ul.list_store-info): label spans 電話 / 営業時間 / 定休日 / URL ->
    following sibling span (URL's holds an <a>) — no extra request
    needed, the detail ships inline (fukushima.py:28-40)
  * latlng from the modal's li.map-box iframe src ``q=lat,lng``, when
    present (fukushima.py:42-52)
  * pagination div[role=navigation] a[rel=next] (fukushima.py:56-58)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-fukushima.jp",)
START_URLS = ("https://gotoeat-fukushima.jp/shop/?s=",)

_Q_LATLNG = re.compile(r"q=(?P<lat>\d+\.\d+)\,(?P<lng>\d+\.\d+)")


def _modal_label_span(card: Node, label: str) -> Node | None:
    for li in sel(card, "div.mfp-hide ul.list_store-info li"):
        spans = li.children_by_tag("span")
        if spans and label in spans[0].text() and len(spans) > 1:
            return spans[1]
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.block_search-result ul.list_search-result > li"):
        item = dict(_EMPTY_ITEM)
        name = sel_one(card, "a h3.result-name span")
        item["shop_name"] = name.itext().strip() if name else None
        addr = sel_one(card, "a p.result-address span")
        item["address"] = addr.itext().strip() if addr else None
        cat = sel_one(card, "a p.result-cat span")
        item["genre_name"] = cat.itext().strip() if cat else None

        tel = _modal_label_span(card, "電話")
        item["tel"] = tel.itext() or None if tel is not None else None
        hours = _modal_label_span(card, "営業時間")
        item["opening_hours"] = hours.itext() or None if hours is not None else None
        off = _modal_label_span(card, "定休日")
        item["closing_day"] = off.itext() or None if off is not None else None
        hp = _modal_label_span(card, "URL")
        if hp is not None:
            a = sel_one(hp, "a")
            item["official_page"] = a.attr("href") if a else None

        iframe = sel_one(card, "div.mfp-hide ul.list_store-info li.map-box iframe")
        m = _Q_LATLNG.search(iframe.attr("src") or "") if iframe is not None else None
        if m:
            item["provided_lat"], item["provided_lng"] = m.group("lat"), m.group("lng")

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel(doc, "div[role=navigation] a[rel=next]")
    if nxt and nxt[0].attr("href"):
        res.links.append(_link(nxt[0].attr("href")))
        res.spans.append(("link", "次へ", nxt[0].attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "fukushima", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="fukushima",
    family="site_fukushima",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
