"""hiroshima — paginated result rows with linked-or-plain shop names.

Reference configuration ported (hiroshima.py:7-44):
  * domain gotoeat.hiroshima.jp, seed /?s (hiroshima.py:14-15)
  * area exists only as a search FILTER on this site — never extracted
    (the reference's own note, hiroshima.py:18)
  * cards div.result > div.result__row; genre ul.result__cate li
    (hiroshima.py:20-22)
  * the shop name is the union of the h3's OWN text and its a's text
    (linked when the shop has a site, plain otherwise) — the XPath
    ``h3/a/text() | h3/text()`` joined (hiroshima.py:24-27)
  * official page = that h3 a's href; address p.result__address
    (hiroshima.py:29-32)
  * pagination div[role=navigation] a[rel=next] (hiroshima.py:37-39)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat.hiroshima.jp",)
START_URLS = ("https://gotoeat.hiroshima.jp/?s",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.result > div.result__row"):
        item = dict(_EMPTY_ITEM)
        cate = sel_one(card, "ul.result__cate li")
        item["genre_name"] = cate.itext().strip() if cate else None

        h3 = sel_one(card, "div.result__data h3")
        if h3 is not None:
            a = sel_one(h3, "a")
            # union of link text + own text (hiroshima.py:24-27)
            item["shop_name"] = ((a.itext() if a else "") + h3.itext()).strip() or None
            item["official_page"] = a.attr("href") if a else None
        addr = sel_one(card, "div.result__data p.result__address")
        item["address"] = addr.itext().strip() if addr else None

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
        {"prefecture": "hiroshima", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="hiroshima",
    family="site_hiroshima",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
