"""mie — the shared SaaS table platform, list→detail with an
out-of-prefecture row filter.

Reference configuration ported (mie.py:7-80):
  * same commercial platform as gifu/ibaraki (area34.smp.ne.jp), table
    26722; courtesy throttle 1 concurrent + 2 s (mie.py:14-29)
  * list page identical shape to gifu: tr.smp-row-data's
    td.smp-cell-col-3 a[target=_self] detail links + current-page-
    sibling pagination (mie.py:31-52)
  * detail card-table rows 店舗名 / 住所情報 ([zip, *address]) /
    電話番号 (the row whose <tr> tag is literally MISSING in the
    platform's HTML — the label lookup must not require a well-formed
    row) / 店舗エリア / 業態 / WEB URL (mie.py:54-80)
  * THE quirk: ~6 Nagoya shops leak into the Mie table — any detail
    whose address starts with 愛知県 is DROPPED (mie.py:66-68)
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("area34.smp.ne.jp",)
TABLE_ID = 26722
LIMIT = 100
START_URLS = (
    f"https://area34.smp.ne.jp/area/table/{TABLE_ID}/AikX5e/M?detect=%94%bb%92%e8"
    f"&_limit_{TABLE_ID}={LIMIT}&S=phneq2lbrgkg",
)


def _label_td(scope: Node, label: str) -> Node | None:
    """th-label -> next td — matched WITHOUT requiring an enclosing tr,
    because the platform's 電話番号 row ships with its <tr> missing
    (mie.py:70-71): scan (th, td) adjacency anywhere under ``scope``."""
    take_next = False
    stack = [scope]
    while stack:
        node = stack.pop(0)
        for child in node.elements():
            if child.tag == "th":
                take_next = label in child.text()
            elif child.tag == "td" and take_next:
                return child
            else:
                stack.append(child)
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    if sel_one(doc, "table.smp-card-list") is not None:
        return detail(url, body, meta, depth)
    res = ParseResult()
    for row in sel(doc, f"table#smp-table-{TABLE_ID} tr.smp-row-data"):
        a = sel_one(row, "td[class*=smp-cell-col-3] a[target=_self]")
        if a is not None and a.attr("href"):
            href = urljoin(url, a.attr("href"))
            res.links.append(_link(href, callback="detail"))
            res.spans.append(("link", "詳細", href))

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
    for card in sel(doc, "table.smp-card-list"):
        item = dict(_EMPTY_ITEM)
        item["detail_page"] = url
        name_td = _label_td(card, "店舗名")
        item["shop_name"] = name_td.itext().strip() if name_td is not None else None
        place_td = _label_td(card, "住所情報")
        if place_td is not None:
            chunks = place_td.texts()
            if chunks:
                item["zip_code"] = chunks[0].strip()
                item["address"] = " ".join(chunks[1:]).strip()
        if (item["address"] or "").startswith("愛知県"):  # Nagoya leak filter (mie.py:66-68)
            continue
        tel_td = _label_td(card, "電話番号")
        item["tel"] = tel_td.itext().strip() if tel_td is not None else None
        area_td = _label_td(card, "店舗エリア")
        item["area_name"] = area_td.itext().strip() if area_td is not None else None
        genre_td = _label_td(card, "業態")
        item["genre_name"] = genre_td.itext().strip() if genre_td is not None else None
        web_td = _label_td(card, "WEB URL")
        if web_td is not None:
            a = sel_one(web_td, "a")
            item["official_page"] = a.attr("href") if a else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "mie", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="mie",
    family="site_mie",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "detail": detail},
    crawl_delay_s=2.0,  # shared platform courtesy (mie.py:23-29)
)
