"""kumamoto — paginated article list, no genre dimension.

Reference configuration ported (kumamoto.py:9-44):
  * domain gotoeat-kumamoto.jp, seed /shop (kumamoto.py:16-17)
  * cards section#sale-page div.sec-body__inner > article; name h3;
    area the p.cat a.tag text, raw (kumamoto.py:21-24)
  * the first p is 〒zip space address, regex-split (kumamoto.py:26-29)
  * official page = the THIRD p's a href (kumamoto.py:31)
  * kumamoto publishes no genre at all (kumamoto.py:32)
  * pagination div.pagination a.next.page-numbers (kumamoto.py:37-39)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-kumamoto.jp",)
START_URLS = ("https://gotoeat-kumamoto.jp/shop",)

_ZIP = re.compile(r"〒(?P<zip_code>.*?)\s(?P<address>.*)")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "section#sale-page div.sec-body__inner > article"):
        item = dict(_EMPTY_ITEM)
        h3 = sel_one(card, "h3")
        item["shop_name"] = h3.itext().strip() if h3 else None
        tag = sel_one(card, "p.cat a.tag")
        item["area_name"] = tag.itext() or None if tag else None  # raw .get() (kumamoto.py:24)

        # the reference indexes plain p's positionally: [1]=〒zip address,
        # [3]=official-page link (kumamoto.py:26-31); the area tag p sits
        # in its own .cat paragraph outside that numbering
        plain_ps = [p for p in card.children_by_tag("p") if "cat" not in p.classes()]
        place = plain_ps[0].itext().strip() if plain_ps else ""
        m = _ZIP.match(place)
        if m:
            item["zip_code"], item["address"] = m.group("zip_code"), m.group("address")
        if len(plain_ps) >= 3:
            a = sel_one(plain_ps[2], "a")
            item["official_page"] = a.attr("href") if a else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "div.pagination a.next.page-numbers")
    if nxt is not None and nxt.attr("href"):
        res.links.append(_link(nxt.attr("href")))
        res.spans.append(("link", "次へ", nxt.attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "kumamoto", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="kumamoto",
    family="site_kumamoto",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
