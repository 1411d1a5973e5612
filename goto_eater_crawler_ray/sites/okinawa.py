"""okinawa — paginated article list with aria-current pagination.

Reference configuration ported (okinawa.py:7-45):
  * domain gotoeat.okinawa.jp, seed /restaurant/ (okinawa.py:14-15)
  * cards div.search_result article: area/genre from the typed
    p.category anchors a.areas / a.industry (raw), name h4.title,
    address p.address (okinawa.py:19-24)
  * tel from div.column p.tel a with the "TEL:" prefix stripped;
    official page the p.url a[rel=noopener] href (okinawa.py:26-31)
  * pagination: the li AFTER the one whose span has
    aria-current="page" (okinawa.py:35-37)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat.okinawa.jp",)
START_URLS = ("https://gotoeat.okinawa.jp/restaurant/",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.search_result article"):
        item = dict(_EMPTY_ITEM)
        areas = sel_one(card, "p.category a.areas")
        item["area_name"] = areas.itext() or None if areas else None  # raw .get()
        industry = sel_one(card, "p.category a.industry")
        item["genre_name"] = industry.itext() or None if industry else None
        title = sel_one(card, "h4.title")
        item["shop_name"] = title.itext().strip() if title else None
        addr = sel_one(card, "p.address")
        item["address"] = addr.itext().strip() if addr else None
        tel_a = sel_one(card, "div.column p.tel a")
        tel = tel_a.itext() if tel_a else None
        item["tel"] = tel.replace("TEL:", "") if tel else None  # (okinawa.py:26-27)
        hp = sel_one(card, "div.column p.url a[rel=noopener]")
        item["official_page"] = hp.attr("href") if hp else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    # li after the aria-current page (okinawa.py:35-37)
    nxt = None
    for span in sel(doc, "nav[role=navigation] li span[aria-current=page]"):
        li = span.parent
        if li is None or li.parent is None:
            continue
        siblings = li.parent.elements()
        i = siblings.index(li)
        for sib in siblings[i + 1 :]:
            if sib.tag == "li":
                a = sel_one(sib, "a")
                if a is not None and a.attr("href"):
                    nxt = a.attr("href")
                break
        break
    if nxt:
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "okinawa", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="okinawa",
    family="site_okinawa",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
