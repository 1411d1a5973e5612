"""yamanashi — single-page per-area section tables.

Reference configuration ported (yamanashi.py:5-33):
  * domain gotoeat-yamanashi.jp; the whole dataset is ONE page, no
    pagination (the reference's own note) — /archives/merchant
    (yamanashi.py:14-15)
  * every #shopList section.shopInfoSection is one AREA: its h1 text is
    the area_name for every row inside (yamanashi.py:20-22)
  * rows div.secInnr table.shopTable tr, FIRST ROW SKIPPED (header):
    td[1] own text = name with the genre inside a span.genre a;
    td[2] address; td[3] tel, all stripped (yamanashi.py:23-31)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("gotoeat-yamanashi.jp",)
START_URLS = ("https://www.gotoeat-yamanashi.jp/archives/merchant",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for section in sel(doc, "#shopList section.shopInfoSection"):
        h1 = sel_one(section, "h1")
        area_name = h1.itext().strip() if h1 else None
        trs = sel(section, "div.secInnr table.shopTable tr")
        for tr in trs[1:]:  # header row skipped (yamanashi.py:23-24)
            tds = tr.children_by_tag("td")
            if len(tds) < 3:
                continue
            item = dict(_EMPTY_ITEM)
            item["area_name"] = area_name
            item["shop_name"] = tds[0].itext().strip()
            genre_a = sel_one(tds[0], "span.genre a")
            item["genre_name"] = genre_a.itext().strip() if genre_a else None
            item["address"] = tds[1].itext().strip()
            item["tel"] = tds[2].itext().strip() or None

            res.items.append(item)
            res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
            res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "yamanashi", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="yamanashi",
    family="site_yamanashi",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
