"""oita — infinite-scroll browser script crawler.

Reference configuration ported (scripts/oita.py:19-74):
  * the reference drives Playwright webkit (iPhone-11 device profile,
    explicit goto-eater UA) against https://oita-gotoeat.com/shop/,
    clicking input.more and scrolling until the button disappears, then
    parses the ONE accumulated page (oita.py:21-46) — there is no real
    browser in this container, so fetching goes through the engine's
    simulated browser stage (stages/fetch.py SimBrowser, the documented
    stub); THIS module is the real DOM extraction over the accumulated
    page, which is what the reference's parse() does over page.content()
  * cards at ul.shop-list li.box-sh (oita.py:57)
  * area div.tag p.area span first text; genres are ALL div.tag p.genre
    span texts joined with "|" (oita.py:59-61)
  * name p.name text; address div.first p.add text (oita.py:63-64)
  * tel optional from div.second p.s-call span.shoptel a; official page
    optional from div.first p.web a@href, stripped (oita.py:66-69)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("oita-gotoeat.com",)
START_URLS = ("https://oita-gotoeat.com/shop/",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "ul.shop-list li.box-sh"):
        item = dict(_EMPTY_ITEM)
        area = sel_one(card, "div.tag p.area span")
        item["area_name"] = area.itext().strip() if area else None
        genres = [g.itext().strip() for g in sel(card, "div.tag p.genre span")]
        item["genre_name"] = "|".join(genres)
        name = sel_one(card, "p.name")
        item["shop_name"] = name.itext().strip() if name else None
        add = sel_one(card, "div.first p.add")
        item["address"] = add.itext().strip() if add else None
        tel = sel_one(card, "div.second p.s-call span.shoptel a")
        item["tel"] = tel.itext().strip() if tel else None
        hp = sel_one(card, "div.first p.web a")
        item["official_page"] = hp.attr("href").strip() if hp is not None and hp.attr("href") else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "oita", "url": u, "method": "GET", "form": {}, "meta": {"browser": True}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="oita",
    family="site_oita",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,  # reference sleeps 3 s between scroll clicks (oita.py:33)
)
