"""ehime — paginated dl-card shop list.

Reference configuration ported (ehime.py:7-43):
  * domain goto-eat-ehime.com, seed /shop_list/ (ehime.py:14-15)
  * cards div#sortable ul.shop_list > li; name dl/dt; genre div/p/span
    (ehime.py:19-22)
  * address: the 住所 label span's following sibling span (ehime.py:23-27)
  * tel from a.tel_link text, raw; detail_page p.btn_link a, stripped
    (ehime.py:28-30); area is search-only on this site, never extracted
    (the reference's own note, ehime.py:31-32)
  * pagination div[role=navigation] a[rel=next] (ehime.py:37-39)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("goto-eat-ehime.com",)
START_URLS = ("https://www.goto-eat-ehime.com/shop_list/",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div#sortable ul.shop_list > li"):
        item = dict(_EMPTY_ITEM)
        dt = sel_one(card, "dl dt")
        item["shop_name"] = dt.itext().strip() if dt else None
        genre = sel_one(card, "p span")
        item["genre_name"] = genre.itext().strip() if genre else None

        for li in sel(card, "dl dd ul li"):
            spans = li.children_by_tag("span")
            if spans and "住所" in spans[0].text() and len(spans) > 1:
                item["address"] = spans[1].itext().strip()
            tel_a = sel_one(li, "span a.tel_link")
            if tel_a is not None:
                item["tel"] = tel_a.itext() or None  # raw (ehime.py:28)

        btn = sel_one(card, "p.btn_link a")
        if btn is not None and btn.attr("href"):
            item["detail_page"] = btn.attr("href").strip()

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
        {"prefecture": "ehime", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="ehime",
    family="site_ehime",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
