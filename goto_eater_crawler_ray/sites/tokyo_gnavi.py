"""tokyo_gnavi — the gnavi commercial directory, list→detail with the
data-o URL assembly quirk.

Reference configuration ported (tokyo_gnavi.py:11-147):
  * domain r.gnavi.co.jp — a live commercial service: courtesy throttle
    1 concurrent + 1 s (the reference's "32k shops, one per second,
    forgive me" note, tokyo_gnavi.py:21-28); seed = the all-Tokyo
    campaign search (tokyo_gnavi.py:30-35)
  * list page: div.result-cassette__wrapper--normal
    ul.result-cassette__list li -> a.result-cassette__box-title hrefs;
    pagination li.pagination__arrow-item
    a.pagination__arrow-item-inner-next (tokyo_gnavi.py:71-86)
  * detail page div#info-table rows by th label: 店名 (p#info-name),
    電話番号・FAX (span.number), 住所 (p.adr text = 〒zip, its
    span.region = address), 営業時間 (td div text), 定休日 (ALL td ul
    li texts newline-joined) (tokyo_gnavi.py:88-127)
  * THE quirk: the official-page link hides its URL in a JSON blob on
    @data-o — ``{"a": host+path, "b": scheme}`` reassembled as
    ``b://a`` (tokyo_gnavi.py:105-111)
  * genre: header dd#header-meta-gen-desc ol li texts "|"-joined
    (tokyo_gnavi.py:131-136)
  * area from the breadcrumb: the li AFTER the one whose a contains
    東京 (tokyo_gnavi.py:92-94)
"""

from __future__ import annotations

import json

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("r.gnavi.co.jp",)
START_URLS = (
    "https://r.gnavi.co.jp/area/tokyo/kods17214/rs/?gtet_all=1&resp=1&fwp=%E6%9D%B1%E4%BA%AC%E9%83%BD",
)


def _label_td(scope: Node, label: str) -> Node | None:
    for tr in sel(scope, "tr"):
        th = sel_one(tr, "th")
        if th is not None and label in th.text():
            return sel_one(tr, "td")
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    if sel_one(doc, "div#info-table") is not None:  # content routing to the detail shape
        return detail(url, body, meta, depth)
    res = ParseResult()
    for li in sel(doc, "div[class*=result-cassette__wrapper--normal] ul.result-cassette__list > li"):
        a = sel_one(li, "div.result-cassette__box a[class*=result-cassette__box-title]")
        if a is not None and a.attr("href"):
            res.links.append(_link(a.attr("href"), callback="detail"))
            res.spans.append(("link", normalize_text(a.text()) or "詳細", a.attr("href")))

    nxt = sel_one(doc, "li.pagination__arrow-item a[class*=pagination__arrow-item-inner-next]")
    if nxt is not None and nxt.attr("href"):
        res.links.append(_link(nxt.attr("href")))
        res.spans.append(("link", "次へ", nxt.attr("href")))
    return res


def detail(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    item = dict(_EMPTY_ITEM)
    item["detail_page"] = url

    # breadcrumb: li after the 東京 one (tokyo_gnavi.py:92-94)
    for ol in sel(doc, "ol#gn_info-breadcrumbs-inner"):
        lis = ol.children_by_tag("li")
        for i, li in enumerate(lis):
            a = sel_one(li, "a")
            if a is not None and "東京" in a.text() and i + 1 < len(lis):
                nxt_a = sel_one(lis[i + 1], "a")
                item["area_name"] = nxt_a.itext() or None if nxt_a else None
                break

    table = sel_one(doc, "div#info-table")
    if table is not None:
        name_td = _label_td(table, "店名")
        if name_td is not None:
            p = sel_one(name_td, "p#info-name")
            item["shop_name"] = p.itext().strip() if p else None
        tel_td = _label_td(table, "電話番号・FAX")
        if tel_td is not None:
            num = sel_one(tel_td, "ul li span.number")
            item["tel"] = num.itext() or None if num else None
        hp_td = _label_td(table, "お店のホームページ")
        if hp_td is not None:
            a = sel_one(hp_td, "ul li a[class*=url]")
            data_o = a.attr("data-o") if a is not None else None
            if data_o:  # {"a": host+path, "b": scheme} -> b://a (tokyo_gnavi.py:105-111)
                data = json.loads(data_o)
                item["official_page"] = data["b"] + "://" + data["a"]
        addr_td = _label_td(table, "住所")
        if addr_td is not None:
            adr = sel_one(addr_td, "p.adr")
            if adr is not None:
                zc = adr.itext().strip()
                item["zip_code"] = zc.replace("〒", "") if zc else None
                region = sel_one(adr, "span.region")
                item["address"] = region.itext().strip() if region else None
        hours_td = _label_td(table, "営業時間")
        if hours_td is not None:
            div = sel_one(hours_td, "div")
            t = div.itext() if div else None
            item["opening_hours"] = t.strip() if t else None
        off_td = _label_td(table, "定休日")
        if off_td is not None:  # newline-joined li texts (tokyo_gnavi.py:127-128)
            item["closing_day"] = "\n".join(li.itext() for li in sel(off_td, "ul li")) or None

    genres = [
        (sel_one(li, "a").itext().strip() if sel_one(li, "a") else "")
        for li in sel(doc, "dd#header-meta-gen-desc ol li")
    ]
    genres = [g for g in genres if g]
    if genres:
        item["genre_name"] = "|".join(genres)  # (tokyo_gnavi.py:131-136)

    res.items.append(item)
    res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
    res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "tokyo_gnavi", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="tokyo_gnavi",
    family="site_tokyo_gnavi",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "detail": detail},
    crawl_delay_s=1.0,  # commercial service courtesy (tokyo_gnavi.py:21-28)
)
