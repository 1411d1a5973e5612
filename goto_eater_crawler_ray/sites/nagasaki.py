"""nagasaki — paginated HTML merchant list.

Reference configuration ported (nagasaki.py:13-43):
  * domain gotoeat-nagasaki.jp, seed /merchant-list/ (nagasaki.py:14-15)
  * cards at section#shop-list > div.shop-list-content (nagasaki.py:19)
  * name div.shop-list-content-name text, stripped (nagasaki.py:21)
  * area / genre are the JOIN of ALL text chunks of their divs (the
    reference "".join(...getall()) — the divs carry multiple text nodes
    around inner markup), then stripped (nagasaki.py:23-27)
  * address div.shop-list-content-add-002 first text, stripped; tel kept
    RAW (the reference never strips it) (nagasaki.py:29-30)
  * official page div.shop-list-content-url a@href (nagasaki.py:31)
  * pagination div.pagination a.next; absent on the last page
    (nagasaki.py:36-43)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-nagasaki.jp",)
START_URLS = ("https://www.gotoeat-nagasaki.jp/merchant-list/",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "section#shop-list > div.shop-list-content"):
        item = dict(_EMPTY_ITEM)
        name = sel_one(card, "div.shop-list-content-name")
        item["shop_name"] = name.itext().strip() if name else None
        area = sel_one(card, "div.shop-list-content-area")
        item["area_name"] = "".join(area.texts()).strip() if area else None
        cat = sel_one(card, "div.shop-list-content-cat")
        item["genre_name"] = "".join(cat.texts()).strip() if cat else None
        add = sel_one(card, "div.shop-list-content-add-002")
        item["address"] = add.itext().strip() if add else None
        tel = sel_one(card, "div.shop-list-content-tel-002")
        item["tel"] = tel.itext() or None if tel else None  # raw, reference doesn't strip
        link = sel_one(card, "div.shop-list-content-url a")
        item["official_page"] = link.attr("href") if link else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "div.pagination a.next")
    if nxt is not None and nxt.attr("href"):  # absent on last page
        res.links.append(_link(nxt.attr("href")))
        res.spans.append(("link", "次へ", nxt.attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "nagasaki", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="nagasaki",
    family="site_nagasaki",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
