"""gifu — third-party SaaS table platform (area34.smp.ne.jp) with
list→detail card tables.

Reference configuration ported (gifu.py:7-76):
  * the shop list lives on a SHARED commercial platform
    (area34.smp.ne.jp table 26960) — the reference throttles to ONE
    concurrent request + 1.7 s delay out of courtesy (gifu.py:14-29);
    the per-host politeness table gives the same serialization here
  * list page: table#smp-table-26960 tr.smp-row-data, detail link in
    td.smp-cell-col-3 a[target=_self], urljoin'd (gifu.py:31-37)
  * pagination: the td AFTER table.smp-pager's td.smp-current-page,
    urljoin'd (gifu.py:39-48)
  * detail: table.smp-card-list th-label rows 店舗名 / 業態 / WEB URL /
    店舗エリア / 住所情報 (td text list: [zip, *address parts]) /
    電話番号; the address sometimes embeds the shop name — stripped
    out, the reference's own workaround (gifu.py:53-73)
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("area34.smp.ne.jp",)
TABLE_ID = 26960
LIMIT = 100
START_URLS = (
    f"https://area34.smp.ne.jp/area/table/{TABLE_ID}/ADtah6/M?detect=%2594%25bb%2592%25e8"
    f"&S=phsio2lbsjob&_limit_{TABLE_ID}={LIMIT}",
)


def _label_td(scope: Node, label: str) -> Node | None:
    for tr in sel(scope, "tr"):
        th = sel_one(tr, "th")
        if th is not None and label in th.text():
            return sel_one(tr, "td")
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    if sel_one(doc, "table.smp-card-list") is not None:  # content routing to the detail shape
        return detail(url, body, meta, depth)
    res = ParseResult()
    for row in sel(doc, f"table#smp-table-{TABLE_ID} tr.smp-row-data"):
        a = sel_one(row, "td[class*=smp-cell-col-3] a[target=_self]")
        if a is not None and a.attr("href"):
            href = urljoin(url, a.attr("href"))
            res.links.append(_link(href, callback="detail"))
            res.spans.append(("link", "詳細", href))

    # the page link AFTER the current one (gifu.py:40-42)
    nxt = None
    for cur in sel(doc, "table.smp-pager td.smp-current-page"):
        parent = cur.parent
        if parent is None:
            continue
        siblings = parent.elements()
        i = siblings.index(cur)
        for sib in siblings[i + 1 :]:
            if sib.tag == "td":
                a = sel_one(sib, "a")
                if a is not None and a.attr("href"):
                    nxt = urljoin(url, a.attr("href"))
                break
        break
    if nxt:
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def detail(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    item = dict(_EMPTY_ITEM)
    item["detail_page"] = url
    for card in sel(doc, "table.smp-card-list"):
        name_td = _label_td(card, "店舗名")
        shop_name = name_td.itext().strip() if name_td is not None else ""
        item["shop_name"] = shop_name
        genre_td = _label_td(card, "業態")
        item["genre_name"] = genre_td.itext().strip() if genre_td is not None else None
        web_td = _label_td(card, "WEB URL")
        if web_td is not None:
            a = sel_one(web_td, "a")
            item["official_page"] = a.attr("href") if a else None
        area_td = _label_td(card, "店舗エリア")
        item["area_name"] = area_td.itext().strip() if area_td is not None else None

        place_td = _label_td(card, "住所情報")
        if place_td is not None:
            chunks = place_td.texts()  # [zip, *address parts] (gifu.py:67-69)
            if chunks:
                item["zip_code"] = chunks[0].strip()
                # the embedded-shop-name workaround, verbatim (gifu.py:69)
                item["address"] = " ".join(chunks[1:]).strip().replace(shop_name, "")
        tel_td = _label_td(card, "電話番号")
        item["tel"] = tel_td.itext().strip() if tel_td is not None else None

    res.items.append(item)
    res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
    res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "gifu", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="gifu",
    family="site_gifu",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "detail": detail},
    crawl_delay_s=1.7,  # shared platform courtesy (gifu.py:23-29)
)
