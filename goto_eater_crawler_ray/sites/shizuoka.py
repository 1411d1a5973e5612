"""shizuoka (赤券, the "red ticket" campaign) — javascript jumppage pager.

Reference configuration ported (shizuoka.py:9-63):
  * domain gotoeat.s-reserve.com, seed / (shizuoka.py:17-19)
  * cards div.areaBox > div.areaBox__item; name content__ttl h5.title;
    genre content__ttl div.hashTag p (shizuoka.py:23-28)
  * the first infoArea__item's detail p is 〒zip address — the zip
    regex uses an EXPLICIT \\d{3}-\\d{4} with NO required space because
    one shop on the site omits it (the reference's own note)
    (shizuoka.py:30-35)
  * infoArea__items 2 and 3 hold tel and official page as raw text
    (shizuoka.py:37-40); detail link a[class*=content], urljoin'd
    (shizuoka.py:42-44)
  * 次の一覧 is ``javascript:jumppage(N);`` — the real URL is
    synthesized as /index.html?freeword=&area=&genre=&pgn=N#shopsearch
    (shizuoka.py:50-60)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat.s-reserve.com",)
START_URLS = ("https://gotoeat.s-reserve.com/",)

_ZIP = re.compile(r"〒(?P<zip_code>\d{3}-\d{4})(?P<address>.*)")
_JS_PAGE = re.compile(r"^javascript:jumppage\((?P<page>\d+)\);$")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.areaBox > div.areaBox__item"):
        item = dict(_EMPTY_ITEM)
        title = sel_one(card, "div.content__ttl h5.title")
        item["shop_name"] = title.itext().strip() if title else None
        genre = sel_one(card, "div.content__ttl div.hashTag p")
        item["genre_name"] = genre.itext().strip() if genre else None

        infos = sel(card, "div.infoArea__item")

        def info_text(i: int) -> str | None:
            if len(infos) <= i:
                return None
            p = sel_one(infos[i], "div.detail p")
            return p.itext() or None if p else None

        place = (info_text(0) or "").strip()
        m = _ZIP.match(place)  # no-space zip tolerance (shizuoka.py:30-35)
        if m:
            item["zip_code"], item["address"] = m.group("zip_code"), m.group("address")
        item["tel"] = info_text(1)
        item["official_page"] = info_text(2)

        a = sel_one(card, "a[class*=content]")
        if a is not None and a.attr("href"):
            item["detail_page"] = urljoin(url, a.attr("href").strip())

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "div.areaCont div.btnArea.pagination a.btn.pgt.next")
    if nxt is not None:
        m = _JS_PAGE.match(nxt.attr("href") or "")
        if m:  # synthesize from the js pager arg (shizuoka.py:56-60)
            href = "https://gotoeat.s-reserve.com/index.html?freeword=&area=&genre=&pgn={}#shopsearch".format(
                m.group("page")
            )
            res.links.append(_link(href))
            res.spans.append(("link", "次の一覧", href))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "shizuoka", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="shizuoka",
    family="site_shizuoka",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
