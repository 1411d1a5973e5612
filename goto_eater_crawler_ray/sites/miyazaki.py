"""miyazaki — premium-gift platform with genre-in-the-name splitting.

Reference configuration ported (miyazaki.py:9-68):
  * same platform shape as aomori (premium-gift.jp store cards,
    javascript pager), base /gotoeatmiyazaki/use_store (miyazaki.py:16-17)
  * THE quirk: the site crams the genre INTO the shop-name field,
    separated by "/" or "／" — titles matching that shape split into
    (shop_name, genre_name); otherwise the whole text is the name
    (miyazaki.py:24-28)
  * 住所：/ 電話番号：("-" -> none) / URL： label rows and
    a.store-card__button detail link, as aomori (miyazaki.py:30-50)
  * 次へ is a javascript:on_events('page',N) pager -> synthesized URL
    (miyazaki.py:57-64)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import Node, contains_text, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("premium-gift.jp",)
START_URLS = ("https://premium-gift.jp/gotoeatmiyazaki/use_store",)

_ZIP = re.compile(r"〒(?P<zip_code>.*?)\s(?P<address>.*)")
_JS_PAGE = re.compile(r"^javascript:on_events\('page',(?P<page>\d+)\);$")
_NAME_GENRE = re.compile(r"(?P<shop_name>.*)(\/|／)+(?P<genre_name>.*)")


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
        text = " ".join(title.texts()).strip() if title else ""
        m = _NAME_GENRE.match(text)  # genre crammed into the name (miyazaki.py:24-28)
        item["shop_name"] = m.group("shop_name") if m else text
        item["genre_name"] = m.group("genre_name") if m else None

        addr_td = _label_td(card, "住所：")
        place = addr_td.itext().strip() if addr_td is not None else ""
        zm = _ZIP.match(place)
        if zm:
            item["zip_code"], item["address"] = zm.group("zip_code"), zm.group("address")
        tel_td = _label_td(card, "電話番号：")
        tel = tel_td.itext().strip() if tel_td is not None else None
        item["tel"] = None if tel == "-" else tel
        url_td = _label_td(card, "URL：")
        if url_td is not None:
            a = sel_one(url_td, "a")
            item["official_page"] = a.attr("href") if a else None
        btn = sel_one(card, "a.store-card__button")
        if btn is not None and btn.attr("href"):
            item["detail_page"] = btn.attr("href").strip()

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = contains_text(sel(doc, "nav.pagenation a"), "次へ")
    if nxt:
        m = _JS_PAGE.match(nxt[0].attr("href") or "")
        if m:
            href = (
                "https://premium-gift.jp/gotoeatmiyazaki/use_store?events=page&id={}&store=&addr=&industry=".format(
                    m.group("page")
                )
            )
            res.links.append(_link(href))
            res.spans.append(("link", "次へ", href))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "miyazaki", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="miyazaki",
    family="site_miyazaki",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
