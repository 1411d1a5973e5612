"""tokushima — article list with header-embedded comma genres.

Reference configuration ported (tokushima.py:7-66):
  * domain gotoeat.tokushima.jp, seed /?s= (tokushima.py:14-15)
  * cards main#main article; name header h2 (tokushima.py:20-22)
  * genre: the header's OWN text (outside the h2) is
    "ジャンル：a, b" — label stripped, comma-split, "|"-joined
    (tokushima.py:24-28)
  * entry-content dl rows by dt label: 所在地 (stripped) / 定休日 /
    営業時間 / 電話番号 (raw) (tokushima.py:30-47)
  * area is search-only; the bookmark detail URL is deliberately NOT
    exported (the reference judged it non-public) (tokushima.py:49-53)
  * pagination nav[role=navigation] div.nav-links a.next.page-numbers
    (tokushima.py:57-59)
"""

from __future__ import annotations

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat.tokushima.jp",)
START_URLS = ("https://gotoeat.tokushima.jp/?s=",)


def _label_dd(scope: Node, label: str) -> Node | None:
    for dl in sel(scope, "div.entry-content dl"):
        take_next = False
        for child in dl.elements():
            if take_next and child.tag == "dd":
                return child
            if child.tag == "dt":
                take_next = label in child.text()
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "main#main article"):
        item = dict(_EMPTY_ITEM)
        header = sel_one(card, "header")
        if header is not None:
            h2 = sel_one(header, "h2")
            item["shop_name"] = h2.itext().strip() if h2 else None
            genre = header.itext().strip().replace("ジャンル：", "")  # own text (tokushima.py:26-27)
            item["genre_name"] = "|".join(s.strip() for s in genre.split(","))

        addr_dd = _label_dd(card, "所在地")
        item["address"] = addr_dd.itext().strip() if addr_dd is not None else None
        off_dd = _label_dd(card, "定休日")
        item["closing_day"] = off_dd.itext() or None if off_dd is not None else None
        hours_dd = _label_dd(card, "営業時間")
        item["opening_hours"] = hours_dd.itext() or None if hours_dd is not None else None
        tel_dd = _label_dd(card, "電話番号")
        item["tel"] = tel_dd.itext() or None if tel_dd is not None else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "nav[role=navigation] div.nav-links a.next.page-numbers")
    if nxt is not None and nxt.attr("href"):
        res.links.append(_link(nxt.attr("href")))
        res.spans.append(("link", "次へ", nxt.attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "tokushima", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="tokushima",
    family="site_tokushima",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
