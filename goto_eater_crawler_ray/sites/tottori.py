"""tottori — paginated bootstrap-grid list with icon-tag extraction.

Reference configuration ported (tottori.py:7-50):
  * domain tottori-gotoeat.jp, seed /store_list/ (tottori.py:14-15)
  * cards: div.row descendants whose class CONTAINS store-list_v2
    (tottori.py:19)
  * area span.icon-area in the first div; name the first div's
    h2[class*=mr-3] (tottori.py:21-22)
  * address second div's p; tel from a[class*=tel-link] HREF with the
    tel: scheme stripped (tottori.py:27-29); official page the
    target=_blank link's href (tottori.py:30-32)
  * multi-genre: ALL p.mb-0 span[class*=icon-genre] texts joined "|"
    (tottori.py:34-35)
  * pagination nav[role=navigation] div.nav-links a.next.page-numbers
    (tottori.py:41-43)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("tottori-gotoeat.jp",)
START_URLS = ("https://tottori-gotoeat.jp/store_list/",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.row div[class*=store-list_v2]"):
        item = dict(_EMPTY_ITEM)
        divs = card.children_by_tag("div")
        div1 = divs[0] if divs else None
        div2 = divs[1] if len(divs) > 1 else None

        if div1 is not None:
            area = sel_one(div1, "span.icon-area")
            item["area_name"] = area.itext().strip() if area else None
            h2 = sel_one(div1, "h2[class*=mr-3]")
            item["shop_name"] = h2.itext().strip() if h2 else None
        if div2 is not None:
            p = sel_one(div2, "p")
            item["address"] = p.itext().strip() if p else None
            tel_a = sel_one(div2, "div.d-flex a[class*=tel-link]")
            tel = tel_a.attr("href") if tel_a else None
            item["tel"] = tel.replace("tel:", "") if tel else None  # (tottori.py:28-29)
            blank = sel_one(div2, "div.d-flex a[target*=_blank]")
            item["official_page"] = blank.attr("href") if blank else None

        genres = [g.itext() for g in sel(card, "p.mb-0 span[class*=icon-genre]")]
        item["genre_name"] = "|".join(genres)  # (tottori.py:34-35)

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "nav[role=navigation] div.nav-links a.next.page-numbers")
    if nxt is not None and nxt.attr("href"):  # absent on last page (tottori.py:44-46)
        res.links.append(_link(nxt.attr("href")))
        res.spans.append(("link", "次へ", nxt.attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "tottori", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="tottori",
    family="site_tottori",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
