"""kagawa — paginated list with span-labelled tables and the full-width
pipe genre rewrite.

Reference configuration ported (kagawa.py:13-58):
  * domain kagawa-gotoeat.com, seed /gtes/store-list?fstr=&mode=only
    (kagawa.py:14-15)
  * cards: div.container children whose class CONTAINS "store-list"
    (kagawa.py:19)
  * name h4 text (kagawa.py:21)
  * every field is looked up via th > span label -> the row's td:
    エリア / 料理ジャンル / 電話番号 / 住所 (kagawa.py:22-44)
  * THE quirk: multi-genre values use a FULL-WIDTH pipe ｜ which is
    rewritten to the feed's half-width "|" (kagawa.py:27-31)
  * pagination div[role=navigation] a[rel=next], urljoin'd; absent on
    the last page (kagawa.py:49-56)
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("kagawa-gotoeat.com",)
START_URLS = ("https://www.kagawa-gotoeat.com/gtes/store-list?fstr=&mode=only",)


def _span_label_td(card: Node, label: str) -> Node | None:
    """XPath ``tr/th/span[contains(text(), label)]/../following-sibling::td``."""
    for tr in sel(card, "table tr"):
        th = sel_one(tr, "th")
        if th is not None:
            span = sel_one(th, "span")
            if span is not None and label in span.text():
                return sel_one(tr, "td")
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.container > div[class*=store-list]"):
        item = dict(_EMPTY_ITEM)
        h4 = sel_one(card, "h4")
        item["shop_name"] = h4.itext().strip() if h4 else None

        def field(label: str) -> str | None:
            td = _span_label_td(card, label)
            return (td.itext().strip() or None) if td is not None else None

        item["area_name"] = field("エリア")
        genre = field("料理ジャンル")
        item["genre_name"] = genre.replace("｜", "|") if genre else None  # full-width pipe (kagawa.py:27-31)
        item["tel"] = field("電話番号")
        item["address"] = field("住所")

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel(doc, "div[role=navigation] a[rel=next]")
    if nxt and nxt[0].attr("href"):  # absent on last page (kagawa.py:50-52)
        href = urljoin(url, nxt[0].attr("href"))  # reference urljoins here (kagawa.py:55)
        res.links.append(_link(href))
        res.spans.append(("link", "次へ", href))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "kagawa", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="kagawa",
    family="site_kagawa",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
