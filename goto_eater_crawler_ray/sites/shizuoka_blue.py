"""shizuoka_blue (青券, the parallel "blue ticket" campaign) — accordion
card tables with bracket-stripped areas.

Reference configuration ported (shizuoka_blue.py:10-63):
  * domain gotoeat-shizuoka.com, seed /shop/ — a SECOND independent
    campaign for the same prefecture (the reference runs both spiders
    into one shizuoka.csv) (shizuoka_blue.py:18-21)
  * cards ul#shop_list > li.shop_box; name h2.shop_name; area
    span.shop_area with the 【】 brackets stripped; multi-genre = ALL
    span.shop_genre texts joined "|" (shizuoka_blue.py:25-32)
  * the dl.accordion table: span.shop_zip (〒 stripped), 住所 row's td
    text chunks tag-stripped and joined, 電話番号 / 営業時間 / 定休日
    rows raw, official page a.btn__shop_link (shizuoka_blue.py:33-53)
  * pagination div[role=navigation] a[rel=next] (shizuoka_blue.py:57-59)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-shizuoka.com",)
START_URLS = ("https://gotoeat-shizuoka.com/shop/",)

_BRACKETS = re.compile(r"【|】")


def _label_td(scope: Node, label: str) -> Node | None:
    for tr in sel(scope, "table tr"):
        th = sel_one(tr, "th")
        if th is not None and label in th.text():
            return sel_one(tr, "td")
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "ul#shop_list > li.shop_box"):
        item = dict(_EMPTY_ITEM)
        name = sel_one(card, "h2.shop_name")
        item["shop_name"] = name.itext().strip() if name else None
        area = sel_one(card, "span.shop_area")
        if area is not None:  # 【中部】 -> 中部 (shizuoka_blue.py:28-29)
            item["area_name"] = _BRACKETS.sub("", area.itext().strip())
        genres = [g.itext() for g in sel(card, "span.shop_genre")]
        item["genre_name"] = "|".join(genres)

        acc = sel_one(card, "dl.accordion")
        if acc is not None:
            zip_span = sel_one(acc, "table span.shop_zip")
            if zip_span is not None:
                item["zip_code"] = zip_span.itext().replace("〒", "")
            addr_td = _label_td(acc, "住所")
            if addr_td is not None:  # chunks stripped + joined (shizuoka_blue.py:36-38)
                item["address"] = "".join(x.strip() for x in addr_td.texts())
            tel_td = _label_td(acc, "電話番号")
            item["tel"] = tel_td.itext() or None if tel_td is not None else None
            hours_td = _label_td(acc, "営業時間")
            item["opening_hours"] = hours_td.itext() or None if hours_td is not None else None
            off_td = _label_td(acc, "定休日")
            item["closing_day"] = off_td.itext() or None if off_td is not None else None
            hp = sel_one(acc, "dd a.btn_link.btn__shop_link")
            item["official_page"] = hp.attr("href") if hp else None

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
        {"prefecture": "shizuoka_blue", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="shizuoka_blue",
    family="site_shizuoka_blue",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
