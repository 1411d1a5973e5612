"""gunma — paginated WordPress shop search with prefix-strip quirks.

Reference configuration ported (gunma.py:13-50):
  * domain gunma-gotoeat-campaign.com; seed is the genre-unrestricted
    search URL /shop/?s=&post_type=shop (gunma.py:20)
  * cards at section#result > article (gunma.py:24)
  * area from the first div's span; genre from the second div's
    span.shopcat, optional (gunma.py:27-29)
  * name from the second div's h3 direct text (gunma.py:31)
  * zip from p.shopadr span with the leading 〒 stripped via ``[1:]``;
    address is p.shopadr's DIRECT text only (the span excluded)
    (gunma.py:32-33)
  * tel optional, "TEL." prefix stripped (gunma.py:36-37)
  * official page = second a under div.shopinfo (gunma.py:38)
  * pagination: a.next.page-numbers under #search_page_outer; absent on
    the last page (gunma.py:43-46)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gunma-gotoeat-campaign.com",)
START_URLS = ("https://gunma-gotoeat-campaign.com/shop/?s=&post_type=shop",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "section#result > article"):
        item = dict(_EMPTY_ITEM)
        divs = card.children_by_tag("div")
        div1 = divs[0] if divs else None
        div2 = divs[1] if len(divs) > 1 else None

        if div1 is not None:
            area = sel_one(div1, "span")
            item["area_name"] = area.text().strip() if area else None
        if div2 is not None:
            genre = sel_one(div2, "span.shopcat")
            item["genre_name"] = genre.text().strip() if genre else None  # optional (gunma.py:27-28)
            h3 = sel_one(div2, "h3")
            item["shop_name"] = h3.itext().strip() if h3 else None

            shopadr = sel_one(div2, "p.shopadr")
            if shopadr is not None:
                zip_span = sel_one(shopadr, "span")
                if zip_span is not None:
                    item["zip_code"] = zip_span.text()[1:]  # strip leading 〒 (gunma.py:32)
                item["address"] = shopadr.itext().strip()  # direct text, span excluded (gunma.py:33)

            shoptel = sel_one(div2, "p.shoptel")
            tel = shoptel.itext() if shoptel else None
            item["tel"] = tel.replace("TEL.", "") if tel else None  # (gunma.py:36-37)

            info = sel_one(div2, "div.shopinfo")
            if info is not None:
                links = sel(info, "a")
                if len(links) > 1:  # a[2] (gunma.py:38)
                    item["official_page"] = links[1].attr("href")

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel(doc, "#search_page_outer a.next.page-numbers")
    if nxt and nxt[0].attr("href"):  # absent on last page (gunma.py:43-46)
        res.links.append(_link(nxt[0].attr("href")))
        res.spans.append(("link", "次へ", nxt[0].attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "gunma", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="gunma",
    family="site_gunma",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,  # reference settings.py:32 default
)
