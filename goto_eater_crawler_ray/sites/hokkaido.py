"""hokkaido — session/CSRF-token script crawler (the reference's
requests+lxml fallback, not a Scrapy spider).

Reference configuration ported (scripts/hokkaido.py:14-137):
  * the site shares search state per session, so the reference drives it
    serially: GET /general/particStores to pull the CSRF _token from
    p.buttons input[name=_token] (hokkaido.py:48-59), then per area a
    POST /general/particStores/search with form {store_area,
    store_address1:"", division1_id:"", store_name:"", _token}
    (hokkaido.py:61-82), then GET ?page=xx pagination (hokkaido.py:84-106)
  * the 4 search areas 道央/道北/道南/道東, each carrying its area_name
    onto every result row (hokkaido.py:126-133)
  * result cards at div#contents div.results ul li: name h4.results-tit,
    address p.results-txt01 under .left; genre p.results-txt02, optional
    tel p.results-txt03 under .right (hokkaido.py:107-121)
  * next page ul[role=navigation] li a[rel=next] (hokkaido.py:123-124)

The per-host politeness table serializes all hokkaido requests onto one
host clock, which is exactly the serial-session constraint the reference
script encodes by hand.
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-hokkaido.jp",)
TOKEN_URL = "https://gotoeat-hokkaido.jp/general/particStores"
SEARCH_URL = "https://gotoeat-hokkaido.jp/general/particStores/search"

# reference hokkaido.py:126 — the 4 search areas
AREA_LIST = ("道央", "道北", "道南", "道東")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Token page -> one POST per area; any other page is a result page
    (content routing, mirroring the generic scripted family)."""
    doc = parse_html(body.decode("utf-8", "replace"))
    token_input = sel_one(doc, "p.buttons input[name=_token]")
    if token_input is not None:
        token = token_input.attr("value") or ""
        res = ParseResult()
        for area in AREA_LIST:  # hokkaido.py:69-78
            form = {
                "store_area": area,
                "store_address1": "",
                "division1_id": "",
                "store_name": "",
                "_token": token,
            }
            res.links.append(
                _link(SEARCH_URL, callback="search", method="POST", form=form, meta={"area_name": area})
            )
            res.spans.append(("link", area, SEARCH_URL))
        return res
    return parse_search(url, body, meta, depth)


def parse_search(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div#contents div.results ul li"):
        item = dict(_EMPTY_ITEM)
        item["area_name"] = meta.get("area_name")  # carried from the POST (hokkaido.py:109)
        name = sel_one(card, "div.left h4.results-tit")
        item["shop_name"] = name.itext().strip() if name else None
        add = sel_one(card, "div.left p.results-txt01")
        item["address"] = add.itext().strip() if add else None
        genre = sel_one(card, "div.right p.results-txt02")
        item["genre_name"] = genre.itext().strip() if genre else None
        tel = sel_one(card, "div.right p.results-txt03")
        item["tel"] = tel.itext().strip() or None if tel else None  # optional (hokkaido.py:118-119)

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel_one(doc, "ul[role=navigation] li a[rel=next]")
    if nxt is not None and nxt.attr("href"):  # pagination is GET (hokkaido.py:84-88)
        res.links.append(_link(nxt.attr("href"), callback="search", meta=dict(meta)))
        res.spans.append(("link", "次へ", nxt.attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "hokkaido", "url": TOKEN_URL, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
    ]


SPEC = ParserSpec(
    name="hokkaido",
    family="site_hokkaido",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "search": parse_search},
    crawl_delay_s=2.0,  # reference SLEEP_SEC = 2 (hokkaido.py:23)
)
