"""hyogo — paginated search with label-sibling spans and detail-URL
query stripping.

Reference configuration ported (hyogo.py:10-55):
  * domain gotoeat-hyogo.com, seed /search/result?keyword= (hyogo.py:17-18)
  * cards at ul.search-results-list > li (hyogo.py:22)
  * name div p.search-results-list-name (hyogo.py:24)
  * the 住所 label's sibling spans carry [zip, address]: zip strips 〒,
    address squeezes ALL whitespace (hyogo.py:26-28)
  * tel from the "TEL：" label's sibling span's a text, raw (hyogo.py:30)
  * genre is structurally unavailable on this site — always None, the
    reference's own documented decision (hyogo.py:32-36)
  * detail_page: the button href with its ?page=xx pagination echo
    stripped via the reference's replace(query,"")[:-1] dance — the
    param made CSV diffs churn (hyogo.py:38-41)
  * pagination: the a inside the sibling of p.search-results-num.current
    (hyogo.py:46-48)
"""

from __future__ import annotations

import re
import urllib.parse

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-hyogo.com",)
START_URLS = ("https://gotoeat-hyogo.com/search/result?keyword=",)

_WS = re.compile(r"\s")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "ul.search-results-list > li"):
        item = dict(_EMPTY_ITEM)
        name = sel_one(card, "p.search-results-list-name")
        item["shop_name"] = name.itext().strip() if name else None

        # 住所 label -> following sibling spans = [zip, address] (hyogo.py:26-28)
        for li in sel(card, "li"):
            spans = li.children_by_tag("span")
            texts = [s.text() for s in spans]
            if any("住所" in t for t in texts[:1]) and len(spans) >= 3:
                item["zip_code"] = spans[1].itext().strip().replace("〒", "")
                item["address"] = _WS.sub("", spans[2].itext())
            if any("TEL：" in t for t in texts[:1]) and len(spans) >= 2:
                a = sel_one(spans[1], "a")
                item["tel"] = a.itext() or None if a else None  # raw (hyogo.py:30)

        item["genre_name"] = None  # structurally unavailable (hyogo.py:32-36)

        btn = sel_one(card, "p.search-results-list-btn a")
        if btn is not None and btn.attr("href"):
            href = btn.attr("href").strip()
            q = urllib.parse.urlparse(href).query
            item["detail_page"] = href.replace(q, "")[:-1]  # verbatim reference dance (hyogo.py:39-41)

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    # the page number AFTER the current one (hyogo.py:46-48)
    nxt = None
    parent_seen = set()
    for cur in sel(doc, "p.search-results-num.current"):
        parent = cur.parent
        if parent is None or id(parent) in parent_seen:
            continue
        parent_seen.add(id(parent))
        siblings = parent.elements()
        i = siblings.index(cur)
        for sib in siblings[i + 1 :]:
            if sib.tag == "p" and "search-results-num" in sib.classes() and "current" not in sib.classes():
                a = sel_one(sib, "a")
                if a is not None and a.attr("href"):
                    nxt = a.attr("href")
                break
        break
    if nxt:
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "hyogo", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="hyogo",
    family="site_hyogo",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
