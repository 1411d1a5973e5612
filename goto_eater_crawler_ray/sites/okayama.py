"""okayama — CGI POST search with dt-label cards and a >> pager.

Reference configuration ported (okayama.py:7-55):
  * the seed is a POST to /shop/index.cgi with the empty full-search
    form {c: list, keyword: "", AREA: "", BUSINESS: ""} (okayama.py:16-21)
  * cards div#shop div.container > div.box; name = the first p
    (okayama.py:25-27)
  * dl rows by dt label: エリア / 業種 / 電話番号 (its dd's a.tellink
    text, raw) / 住所 / URL (its dd's a href) (okayama.py:28-43)
  * pagination: the div#pager li a containing ">>", urljoin'd
    (okayama.py:47-49)
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..functions.htmlsel import Node, contains_text, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-okayama.com",)
SEARCH_URL = "https://gotoeat-okayama.com/shop/index.cgi"


def _label_dd(scope: Node, label: str) -> Node | None:
    for dl in sel(scope, "dl"):
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
    for card in sel(doc, "div#shop div.container > div.box"):
        item = dict(_EMPTY_ITEM)
        p = sel_one(card, "p")
        item["shop_name"] = p.itext().strip() if p else None

        def field(label: str) -> str | None:
            dd = _label_dd(card, label)
            return dd.itext().strip() or None if dd is not None else None

        item["area_name"] = field("エリア")
        item["genre_name"] = field("業種")
        tel_dd = _label_dd(card, "電話番号")
        if tel_dd is not None:
            a = sel_one(tel_dd, "a.tellink")
            item["tel"] = a.itext() or None if a else None  # raw (okayama.py:34-36)
        item["address"] = field("住所")
        url_dd = _label_dd(card, "URL")
        if url_dd is not None:
            a = sel_one(url_dd, "a")
            item["official_page"] = a.attr("href") if a else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = contains_text(sel(doc, "div#pager ul li a"), ">>")
    if nxt and nxt[0].attr("href"):
        href = urljoin(url, nxt[0].attr("href"))
        res.links.append(_link(href))
        res.spans.append(("link", "次へ", href))
    return res


def seeds() -> list[dict]:
    return [
        {
            "prefecture": "okayama",
            "url": SEARCH_URL,
            "method": "POST",
            "form": {"c": "list", "keyword": "", "AREA": "", "BUSINESS": ""},  # okayama.py:17
            "meta": {},
            "callback": "parse",
            "depth": 0,
        }
    ]


SPEC = ParserSpec(
    name="okayama",
    family="site_okayama",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
