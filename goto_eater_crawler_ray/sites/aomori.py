"""aomori — premium-gift platform list with a javascript pager.

Reference configuration ported (aomori.py:9-62):
  * domain premium-gift.jp, seed /aomori/use_store (aomori.py:16-17)
  * cards div.l-store-card div.store-card__item (aomori.py:21)
  * name = " ".join of ALL h3.store-card__title text chunks (the title
    wraps around inner markup), stripped (aomori.py:23)
  * genre p.store-card__tag (aomori.py:24)
  * th-label table rows 住所：/ 電話番号：/ URL： -> sibling td;
    the address is 〒zip space address; a tel of "-" means none
    (aomori.py:26-43)
  * detail page a.store-card__button (aomori.py:45)
  * THE quirk: the 次へ link's href is
    ``javascript:on_events('page',N);`` — the real next URL is
    SYNTHESIZED as /aomori/use_store?events=page&id=N&store=&addr=&industry=
    (aomori.py:50-59)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import Node, contains_text, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("premium-gift.jp",)
START_URLS = ("https://premium-gift.jp/aomori/use_store",)

_ZIP = re.compile(r"〒(?P<zip_code>.*?)\s(?P<address>.*)")
_JS_PAGE = re.compile(r"^javascript:on_events\('page',(?P<page>\d+)\);$")


def _label_td(scope: Node, label: str) -> Node | None:
    for tr in sel(scope, "table tr"):
        th = sel_one(tr, "th")
        if th is not None and label in th.text():
            return sel_one(tr, "td")
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.l-store-card div.store-card__item"):
        item = dict(_EMPTY_ITEM)
        title = sel_one(card, "h3.store-card__title")
        item["shop_name"] = " ".join(title.texts()).strip() if title else None  # join chunks (aomori.py:23)
        tag = sel_one(card, "p.store-card__tag")
        item["genre_name"] = tag.itext().strip() if tag else None

        addr_td = _label_td(card, "住所：")
        place = addr_td.itext().strip() if addr_td is not None else ""
        m = _ZIP.match(place)
        if m:
            item["zip_code"], item["address"] = m.group("zip_code"), m.group("address")
        tel_td = _label_td(card, "電話番号：")
        tel = tel_td.itext().strip() if tel_td is not None else None
        item["tel"] = None if tel == "-" else tel  # "-" means none (aomori.py:40)
        url_td = _label_td(card, "URL：")
        if url_td is not None:
            a = sel_one(url_td, "a")
            item["official_page"] = a.attr("href") if a else None
        btn = sel_one(card, "a.store-card__button")
        item["detail_page"] = btn.attr("href") if btn else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = contains_text(sel(doc, "nav.pagenation a"), "次へ")
    if nxt:
        m = _JS_PAGE.match(nxt[0].attr("href") or "")
        if m:  # synthesize the real URL from the js pager arg (aomori.py:55-59)
            href = (
                "https://premium-gift.jp/aomori/use_store?events=page&id={}&store=&addr=&industry=".format(
                    m.group("page")
                )
            )
            res.links.append(_link(href))
            res.spans.append(("link", "次へ", href))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "aomori", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="aomori",
    family="site_aomori",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
