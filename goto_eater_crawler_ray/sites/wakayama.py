"""wakayama — result list with form-action pagination.

Reference configuration ported (wakayama.py:9-53):
  * domain gotoeat-wakayama.com, seed /search/ (wakayama.py:16-17)
  * cards ul.result_list > li: div[1] holds h3.shop_name + the shop_tag
    list (li.shop_cat genre, li.shop_area area); div[2] holds
    p.shop_address (〒zip space address regex), p.shop_tel (raw) and
    p.shop_web a (wakayama.py:21-40)
  * THE quirk: pagination is a FORM — the next URL is the @action of
    the form inside the li FOLLOWING the li that contains the active
    page button (button.active/../../following-sibling::li/form),
    urljoin'd (wakayama.py:45-47)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-wakayama.com",)
START_URLS = ("https://gotoeat-wakayama.com/search/",)

_ZIP = re.compile(r"〒(?P<zip_code>.*?)\s(?P<address>.*)")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "ul.result_list > li"):
        item = dict(_EMPTY_ITEM)
        name = sel_one(card, "h3.shop_name")
        item["shop_name"] = name.itext().strip() if name else None
        cat = sel_one(card, "ul.shop_tag li.shop_cat")
        item["genre_name"] = cat.itext().strip() if cat else None
        area = sel_one(card, "ul.shop_tag li.shop_area")
        item["area_name"] = area.itext().strip() if area else None

        addr = sel_one(card, "p.shop_address")
        place = addr.itext().strip() if addr else ""
        m = _ZIP.match(place)
        if m:
            item["zip_code"], item["address"] = m.group("zip_code"), m.group("address")
        tel = sel_one(card, "div.shop_info p.shop_tel")
        item["tel"] = tel.itext() or None if tel else None  # raw (wakayama.py:37)
        web = sel_one(card, "div.shop_info p.shop_web a")
        item["official_page"] = web.attr("href") if web else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    # button.active/../../following-sibling::li/form/@action (wakayama.py:45)
    nxt = None
    for btn in sel(doc, "button.active"):
        li = btn.parent.parent if btn.parent is not None else None
        if li is None or li.parent is None:
            continue
        siblings = li.parent.elements()
        i = siblings.index(li)
        for sib in siblings[i + 1 :]:
            if sib.tag == "li":
                form = sel_one(sib, "form")
                if form is not None and form.attr("action"):
                    nxt = urljoin(url, form.attr("action"))
                break
        break
    if nxt:
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "wakayama", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="wakayama",
    family="site_wakayama",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
