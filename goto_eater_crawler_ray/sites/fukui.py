"""fukui — POST text-search → per-shop detail with dl-label tables.

Reference configuration ported (fukui.py:9-72):
  * domain gotoeat-fukui.com; the seed is a POST to /shop/search.php
    with form {Keyword: "", Action: "text_search"}; DOWNLOAD_DELAY 4 s
    (occasional 503s + every shop costs a detail request, fukui.py:18-28)
  * the search result has NO pagination — one page of div.result ul li
    links, each urljoin'd to a detail request (fukui.py:30-36)
  * detail page div#contents: name h3; area div.icon span.area;
    detail_page = the page's own URL (fukui.py:38-45)
  * dl rows: genre is dd[1] DIRECTLY (not label-matched) because the
    one genre-less shop "グルメ民宿 はまもと" breaks the sibling lookup
    — the reference's documented workaround, ported as-is; multi-genre
    values split on 、 and joined "|" (fukui.py:47-56)
  * labels with the site's literal inner padding: 電　　話 / 住　　所 /
    営業時間 / 定 休 日 / HP・SNS -> sibling dd (fukui.py:58-64)
  * latlng from the 住　　所 row's a.gmap href ``q=lat,lng``
    (fukui.py:66-71)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-fukui.com",)
SEARCH_URL = "https://gotoeat-fukui.com/shop/search.php"

_Q_LATLNG = re.compile(r"q=(?P<lat>\d+\.\d+)\,(?P<lng>\d+\.\d+)")


def _label_dd(dl: Node, label: str) -> Node | None:
    """XPath ``dt[contains(text(), label)]/following-sibling::dd`` within
    one dl: the dd that FOLLOWS the matching dt."""
    take_next = False
    for child in dl.elements():
        if take_next and child.tag == "dd":
            return child
        if child.tag == "dt" and label in child.text():
            take_next = True
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    if sel_one(doc, "div#contents h3") is not None:  # content routing to the detail shape
        return detail(url, body, meta, depth)
    res = ParseResult()
    for li in sel(doc, "div.result ul li"):  # no pagination (fukui.py:31)
        a = sel_one(li, "a")
        if a is not None and a.attr("href"):
            href = urljoin(url, a.attr("href").strip())
            res.links.append(_link(href, callback="detail"))
            res.spans.append(("link", "詳細", href))
    return res


def detail(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    contents = sel_one(doc, "div#contents")
    if contents is None:
        return res
    item = dict(_EMPTY_ITEM)
    h3 = sel_one(contents, "h3")
    item["shop_name"] = h3.itext().strip() if h3 else None
    area = sel_one(contents, "div.icon span.area")
    item["area_name"] = area.itext().strip() if area else None
    item["detail_page"] = url  # the page's own URL (fukui.py:43)

    for dl in contents.children_by_tag("dl"):
        dds = dl.children_by_tag("dd")
        genre = dds[0].itext() if dds else None  # dd[1] direct — はまもと workaround (fukui.py:47-55)
        genre = genre.strip() if genre else ""
        item["genre_name"] = genre.replace("、", "|")  # multi-genre (fukui.py:56)

        tel_dd = _label_dd(dl, "電　　話")
        if tel_dd is not None:
            a = sel_one(tel_dd, "a")
            item["tel"] = a.itext().strip() if a else None
        addr_dd = _label_dd(dl, "住　　所")
        if addr_dd is not None:
            item["address"] = addr_dd.itext().strip()
            gmap = sel_one(addr_dd, "a.gmap")
            m = _Q_LATLNG.search((gmap.attr("href") or "").strip()) if gmap is not None else None
            if m:
                item["provided_lat"], item["provided_lng"] = m.group("lat"), m.group("lng")
        hours_dd = _label_dd(dl, "営業時間")
        item["opening_hours"] = hours_dd.itext() or None if hours_dd is not None else None
        off_dd = _label_dd(dl, "定 休 日")
        item["closing_day"] = off_dd.itext() or None if off_dd is not None else None
        hp_dd = _label_dd(dl, "HP・SNS")
        item["official_page"] = hp_dd.itext() or None if hp_dd is not None else None

    res.items.append(item)
    res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
    res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {
            "prefecture": "fukui",
            "url": SEARCH_URL,
            "method": "POST",
            "form": {"Keyword": "", "Action": "text_search"},  # fukui.py:25-27
            "meta": {},
            "callback": "parse",
            "depth": 0,
        }
    ]


SPEC = ParserSpec(
    name="fukui",
    family="site_fukui",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "detail": detail},
    crawl_delay_s=4.0,  # reference custom_settings (fukui.py:20-22)
)
