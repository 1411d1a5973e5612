"""aichi — paginated BEM-classed shop list with tel-from-href.

Reference configuration ported (aichi.py:15-54):
  * domain gotoeat-aichi-shop.jp, seed /shop/ (aichi.py:16-17)
  * cards at section.lcl-sbs__main ul.lcl-shop > li.lcl-shop__item
    (aichi.py:21-23)
  * name h2.lcl-shop__name (stripped); genre/area from the BEM tag list
    li.lcl-shop-tag__item--cat / --area, kept RAW (aichi.py:25-31)
  * p.lcl-shop__address is 〒zip space address with optional whitespace
    after 〒; both parts stripped (aichi.py:33-36)
  * tel is the HREF of a.lcl-shop__link--tel (a tel: URI, left verbatim
    like the reference); official page a.lcl-shop__link--web href
    (aichi.py:37-38)
  * pagination nav.pagination a.pagination-btn--next, urljoin'd; absent
    on the last page (aichi.py:42-51)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-aichi-shop.jp",)
START_URLS = ("https://www.gotoeat-aichi-shop.jp/shop/",)

_ZIP = re.compile(r"〒\s*(?P<zip_code>.*?)\s(?P<address>.*)")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "section.lcl-sbs__main ul.lcl-shop > li.lcl-shop__item"):
        item = dict(_EMPTY_ITEM)
        name = sel_one(card, "h2.lcl-shop__name")
        item["shop_name"] = name.itext().strip() if name else None
        cat = sel_one(card, "ul.lcl-shop-tag li.lcl-shop-tag__item--cat")
        item["genre_name"] = cat.itext() or None if cat else None  # raw .get() (aichi.py:26-28)
        area = sel_one(card, "ul.lcl-shop-tag li.lcl-shop-tag__item--area")
        item["area_name"] = area.itext() or None if area else None

        addr_p = sel_one(card, "p.lcl-shop__address")
        place = addr_p.itext().strip() if addr_p else ""
        m = _ZIP.match(place)
        if m:
            item["zip_code"] = m.group("zip_code").strip()
            item["address"] = m.group("address").strip()
        tel_a = sel_one(card, "a.lcl-shop__link--tel")
        item["tel"] = tel_a.attr("href") if tel_a else None  # the tel: HREF, verbatim (aichi.py:37)
        web_a = sel_one(card, "a.lcl-shop__link--web")
        item["official_page"] = web_a.attr("href") if web_a else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "nav.pagination a.pagination-btn--next")
    if nxt is not None and nxt.attr("href"):  # absent on last page (aichi.py:45-47)
        href = urljoin(url, nxt.attr("href"))  # reference urljoins (aichi.py:49)
        res.links.append(_link(href))
        res.spans.append(("link", "次へ", href))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "aichi", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="aichi",
    family="site_aichi",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
