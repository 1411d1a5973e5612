"""nagano — shinshu-premium list with synthesized ?p=N pagination.

Reference configuration ported (nagano.py:7-49):
  * domain shinshu-premium.jp, seed /riyou.php (nagano.py:14-15)
  * cards div.shop_block > div.shop; NAMELESS card blocks are skipped
    (the site pads its grid with empty divs, nagano.py:22-25)
  * area span.shop_shozaichi (raw), genre span.shopgenre (stripped),
    both inside p.shop_type (nagano.py:26-30)
  * address: the SECOND p.shop_address (the class is not unique — the
    reference's own warning), "住所：" label prefix stripped
    (nagano.py:31-33)
  * tel p.shop_tel span (raw); official page p.shop_tel a href
    (nagano.py:34-35)
  * pagination: a ">>" pager link is only the STOP probe — the next
    URL is synthesized as /riyou.php?p={n}#search-result from a page
    counter (derived statelessly from the current URL here)
    (nagano.py:39-47)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import contains_text, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("shinshu-premium.jp",)
START_URLS = ("https://shinshu-premium.jp/riyou.php",)

_PAGE_NO = re.compile(r"[?&]p=(\d+)")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.shop_block > div.shop"):
        name_p = sel_one(card, "p.shop_title")
        shop_name = name_p.itext() if name_p else None
        if not shop_name:  # grid-padding empty blocks (nagano.py:23-25)
            continue
        item = dict(_EMPTY_ITEM)
        item["shop_name"] = shop_name.strip()
        area = sel_one(card, "p.shop_type span.shop_shozaichi")
        item["area_name"] = area.itext() or None if area else None  # raw
        genre = sel_one(card, "p.shop_type span.shopgenre")
        item["genre_name"] = genre.itext().strip() if genre else None
        addrs = sel(card, "p.shop_address")
        if len(addrs) > 1:  # the SECOND one (nagano.py:31-33)
            item["address"] = addrs[1].itext().strip().replace("住所：", "")
        tel_p = sel_one(card, "p.shop_tel")
        if tel_p is not None:
            span = sel_one(tel_p, "span")
            item["tel"] = span.itext() or None if span else None
            a = sel_one(tel_p, "a")
            item["official_page"] = a.attr("href") if a else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    probe = contains_text(sel(doc, "div.pager a"), ">>")
    if probe:  # stop probe; URL is synthesized (nagano.py:39-47)
        m = _PAGE_NO.search(url)
        page_no = (int(m.group(1)) if m else 1) + 1
        nxt = f"https://shinshu-premium.jp/riyou.php?p={page_no}#search-result"
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "nagano", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="nagano",
    family="site_nagano",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
