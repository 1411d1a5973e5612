"""ishikawa — paginated member list with typed tag items.

Reference configuration ported (ishikawa.py:7-48):
  * domain ishikawa-gotoeat-cpn.com; seed is the empty member_store
    search (ishikawa.py:14-15)
  * cards div.baseW ul.member_list > li.member_item (ishikawa.py:19)
  * genre/area from the typed tag items div.tag_list_item.type / .city
    (ishikawa.py:21-26)
  * name h4.name; zip div.address div.post with 〒 stripped; address is
    the div.content p with whitespace NORMALIZED (the reference's
    XPath normalize-space — internal runs collapse to one space)
    (ishikawa.py:27-32)
  * tel optional, "TEL." prefix stripped (ishikawa.py:34-35)
  * pagination div.page_nation a.next.page-numbers, urljoin'd
    (ishikawa.py:39-41)
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("ishikawa-gotoeat-cpn.com",)
START_URLS = ("https://ishikawa-gotoeat-cpn.com/?cities=&type=&s=&post_type=member_store",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.baseW ul.member_list > li.member_item"):
        item = dict(_EMPTY_ITEM)
        typ = sel_one(card, "div.tag_list div.tag_list_item.type")
        item["genre_name"] = typ.itext().strip() if typ else None
        city = sel_one(card, "div.tag_list div.tag_list_item.city")
        item["area_name"] = city.itext().strip() if city else None
        name = sel_one(card, "h4.name")
        item["shop_name"] = name.itext().strip() if name else None
        post = sel_one(card, "div.address div.post")
        if post is not None:
            item["zip_code"] = post.itext().strip().replace("〒", "")
        content_p = sel_one(card, "div.address div.content p")
        if content_p is not None:  # XPath normalize-space (ishikawa.py:32)
            item["address"] = " ".join(content_p.text().split())
        tel = sel_one(card, "div.tel")
        t = tel.itext() if tel else None
        item["tel"] = t.replace("TEL.", "") if t else None  # (ishikawa.py:34-35)

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "div.page_nation a.next.page-numbers")
    if nxt is not None and nxt.attr("href"):
        href = urljoin(url, nxt.attr("href"))
        res.links.append(_link(href))
        res.spans.append(("link", "次へ", href))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "ishikawa", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="ishikawa",
    family="site_ishikawa",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
