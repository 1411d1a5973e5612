"""saga — paginated shop_detail cards with positional dl fields.

Reference configuration ported (saga.py:7-44):
  * domain www.sagaoishi-to.com, seed /consumer/shop.php?name=#search_result
    (saga.py:14-15)
  * cards main#primary div.shop_info > div.shop_detail; name div.ttl
    (raw .get()), genre div.genre stripped (saga.py:19-22)
  * POSITIONAL dls: dl[1]=address (ALL dd text chunks joined+stripped),
    dl[2]=tel, dl[3]=opening hours, dl[4]=closing day, dl[5]=official
    page (its dd a[rel*=noopener] href) (saga.py:24-28)
  * area is search-only on this site (saga.py:30-31)
  * pagination div.pagination li.next a, urljoin'd (saga.py:36-38)
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("www.sagaoishi-to.com",)
START_URLS = ("https://www.sagaoishi-to.com/consumer/shop.php?name=#search_result",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "main#primary div.shop_info > div.shop_detail"):
        item = dict(_EMPTY_ITEM)
        ttl = sel_one(card, "div.ttl")
        item["shop_name"] = ttl.itext() or None if ttl else None  # raw .get() (saga.py:21)
        genre = sel_one(card, "div.genre")
        item["genre_name"] = genre.itext().strip() if genre else None

        dls = sel(card, "dl")

        def dd_text(i: int) -> str | None:
            if len(dls) <= i:
                return None
            dd = sel_one(dls[i], "dd")
            return dd.itext() or None if dd else None

        dd0 = sel_one(dls[0], "dd") if dls else None
        item["address"] = "".join(dd0.texts()).strip() if dd0 else None  # join chunks (saga.py:24)
        item["tel"] = dd_text(1)
        item["opening_hours"] = dd_text(2)
        item["closing_day"] = dd_text(3)
        if len(dls) > 4:
            a = sel_one(dls[4], "dd a[rel*=noopener]")
            item["official_page"] = a.attr("href") if a else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "div.pagination ul li.next a")
    if nxt is not None and nxt.attr("href"):
        href = urljoin(url, nxt.attr("href"))
        res.links.append(_link(href))
        res.spans.append(("link", "NEXT", href))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "saga", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="saga",
    family="site_saga",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
