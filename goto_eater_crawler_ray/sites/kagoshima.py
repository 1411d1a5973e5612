"""kagoshima — Excel-published HTML area pages behind an index filter.

Reference configuration ported (kagoshima.py:7-81):
  * domain kagoshima-cci.or.jp, seed /?p=20375 (the reference's "the
    format changed three times, just make it work" site,
    kagoshima.py:17-20)
  * index div#second_page p anchors: ONLY the two whitelisted area
    links (鹿児島市全域, 〇その他地域) are followed; eleven district
    anchors and a ticket link are explicitly skipped via the
    not-target list (kagoshima.py:21-63); area rides the link meta
  * area pages are Excel "publish to web" output: every table tr whose
    td[2] subtree contains 検索 is one shop row — td[3] name, td[4]
    address; for 鹿児島市全域 the city prefix is re-attached because the
    Excel sheet omits it (kagoshima.py:66-74)
  * no genre information exists (kagoshima.py:74)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("kagoshima-cci.or.jp",)
START_URLS = ("http://www.kagoshima-cci.or.jp/?p=20375",)

# reference kagoshima.py:21-35 (the two live entries of the area list)
AREA_LIST = ("鹿児島市全域", "〇その他地域")
# reference kagoshima.py:36-49 (anchors explicitly skipped)
NOT_TARGET_AREA_LIST = (
    "天文館地区", "鹿児島中央駅地区", "中央地区", "上町地区", "鴨池地区",
    "城西地区", "武・田上地区", "谷山北部地区", "谷山地区", "伊敷・吉野地区",
    "桜島・吉田・喜入・松元・郡山地区", "◇食事券購入情報はこちら",
)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    if sel_one(doc, "div#second_page") is None:  # content routing: area pages have no index div
        return parse_from_area_html(url, body, meta, depth)
    res = ParseResult()
    for p in sel(doc, "div#second_page p"):
        a = sel_one(p, "a")
        if a is None:
            continue
        area_name = a.itext()
        if not area_name or area_name in NOT_TARGET_AREA_LIST:
            continue
        if area_name in AREA_LIST:  # whitelist (kagoshima.py:55-62)
            href = (a.attr("href") or "").strip()
            if href:
                res.links.append(_link(href, callback="area", meta={"area_name": area_name}))
                res.spans.append(("link", area_name, href))
    return res


def parse_from_area_html(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    area_name = meta.get("area_name", "")
    for tr in sel(doc, "table tr"):
        tds = tr.children_by_tag("td")
        if len(tds) < 4 or "検索" not in tds[1].text():  # shop-row marker (kagoshima.py:68)
            continue
        item = dict(_EMPTY_ITEM)
        item["shop_name"] = tds[2].itext().strip()
        address = tds[3].itext().strip()
        # the Excel sheet omits the city for 鹿児島市全域 (kagoshima.py:72-73)
        item["address"] = f"鹿児島市{address}" if area_name == "鹿児島市全域" else address
        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "kagoshima", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="kagoshima",
    family="site_kagoshima",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "area": parse_from_area_html},
    crawl_delay_s=3.0,
)
