"""ibaraki — the shared SaaS table platform, list-only positional columns.

Reference configuration ported (ibaraki.py:7-63):
  * same commercial platform as gifu (area34.smp.ne.jp), table 27130 —
    but deliberately LIST-ONLY: the reference declines the detail pages
    to avoid over-hitting the shared service (ibaraki.py:45-47);
    courtesy throttle 1 concurrent request + 3 s (ibaraki.py:22-28)
  * rows table#smp-table-27130 tr.smp-row-data with POSITIONAL tds:
    1=genre (stripped), 2=name+detail link (urljoin'd), 3=tel (raw),
    4+5 joined with one space = address (ibaraki.py:30-44)
  * pagination: first td after td.smp-current-page, urljoin'd
    (ibaraki.py:50-52)
"""

from __future__ import annotations

from urllib.parse import urljoin

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("area34.smp.ne.jp",)
TABLE_ID = 27130
LIMIT = 100  # the site's own maximum page size (ibaraki.py:16)
START_URLS = (
    f"https://area34.smp.ne.jp/area/table/{TABLE_ID}/3jFZ4A/M?detect=%94%BB%92%E8"
    f"&_limit_{TABLE_ID}={LIMIT}&S=%70%69%6D%67%6E%32%6C%62%74%69%6E%64&_page_{TABLE_ID}=1",
)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for row in sel(doc, f"table#smp-table-{TABLE_ID} tr.smp-row-data"):
        tds = row.children_by_tag("td")
        if len(tds) < 5:
            continue
        item = dict(_EMPTY_ITEM)
        item["genre_name"] = tds[0].itext().strip()
        a = sel_one(tds[1], "a")
        if a is not None:
            item["shop_name"] = a.itext().strip()
            if a.attr("href"):
                item["detail_page"] = urljoin(url, a.attr("href").strip())
        item["tel"] = tds[2].itext() or None  # raw .get() (ibaraki.py:40)
        item["address"] = f"{tds[3].itext()} {tds[4].itext()}"  # td4 + " " + td5 (ibaraki.py:42-44)

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

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


def seeds() -> list[dict]:
    return [
        {"prefecture": "ibaraki", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="ibaraki",
    family="site_ibaraki",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,  # shared platform courtesy (ibaraki.py:22-28)
)
