"""toyama — URL-synthesis pagination (the pagesynth family, concretely).

Reference configuration ported (toyama.py:7-52):
  * domain toyamagotoeat.jp, seed /shop/ (toyama.py:16)
  * cards at ul.list > li.item: genre div.item_header; name
    div.item_body_name; address/tel/hours/closing from the labelled
    rows' div.rig cells (place/phone/work/off_day), only address
    stripped (toyama.py:21-33)
  * THE quirk: the next-page URL is NOT taken from the page — the
    presence of ul.pagination_list li.next_post_link a[rel=prev] is only
    the STOP probe; the URL itself is SYNTHESIZED from a page counter:
    /shop/page/{n}?area=all&type=&search= (toyama.py:41-51).  The
    reference keeps the counter as spider state; here it derives
    statelessly from the current URL (seed -> page 2, /page/N -> N+1),
    which is the same sequence without per-host mutable state
"""

from __future__ import annotations

import re

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("toyamagotoeat.jp",)
START_URLS = ("https://www.toyamagotoeat.jp/shop/",)

_PAGE_NO = re.compile(r"/shop/page/(\d+)")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "ul.list > li.item"):
        item = dict(_EMPTY_ITEM)
        header = sel_one(card, "div.item_header")
        item["genre_name"] = header.itext().strip() if header else None
        name = sel_one(card, "div.item_body div.item_body_name")
        item["shop_name"] = name.itext().strip() if name else None

        def rig(row_cls: str) -> str | None:
            cell = sel_one(card, f"div.{row_cls} div.rig")
            return cell.itext() or None if cell else None

        addr = rig("place")
        item["address"] = addr.strip() if addr else None  # only address stripped (toyama.py:29)
        item["tel"] = rig("phone")
        item["opening_hours"] = rig("work")
        item["closing_day"] = rig("off_day")

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    probe = sel_one(doc, "ul.pagination_list li.next_post_link a[rel=prev]")
    if probe is not None:  # stop probe only; the URL is synthesized (toyama.py:41-51)
        m = _PAGE_NO.search(url)
        page_no = (int(m.group(1)) if m else 1) + 1
        nxt = f"https://www.toyamagotoeat.jp/shop/page/{page_no}?area=all&type=&search="
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "toyama", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="toyama",
    family="site_toyama",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
