"""iwate — mandatory-area POST search fan-out (33 municipalities).

Reference configuration ported (iwate.py:9-82):
  * domain iwate-gotoeat.jp; the search REQUIRES a municipality, so the
    reference fans out one POST per entry of its 33-item area list with
    form {k: "", area: <municipality>} to /stores/#search_result
    (iwate.py:18-66)
  * cards section#search_result div.stores_box: name h2.stores_box_name,
    area p.stores_box_cities, address p.stores_box_add (iwate.py:68-72)
  * tel is EXTRACTED BY REGEX from the free-text p.stores_box_tel
    (``0\\d{1,4}-\\d{1,4}-\\d{3,4}`` anywhere in the line, else None)
    (iwate.py:74-76)
  * genre p.stores_box_genre — near-free-form on this site
    (iwate.py:78-79); no pagination (per-area results are one page)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("iwate-gotoeat.jp",)
SEARCH_URL = "https://www.iwate-gotoeat.jp/stores/#search_result"

# reference iwate.py:19-54 (verbatim 33-municipality table)
AREA_LIST = (
    "盛岡市", "宮古市", "大船渡市", "花巻市", "北上市", "久慈市", "遠野市",
    "一関市", "陸前高田市", "釜石市", "二戸市", "八幡平市", "奥州市", "滝沢市",
    "雫石町", "葛巻町", "岩手町", "紫波町", "矢巾町", "西和賀町", "金ケ崎町",
    "平泉町", "住田町", "大槌町", "山田町", "岩泉町", "田野畑村", "普代村",
    "軽米町", "野田村", "九戸村", "洋野町", "一戸町",
)

_TEL = re.compile(r".*(?P<tel>0\d{1,4}-\d{1,4}-\d{3,4})")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "section#search_result div.stores_box"):
        item = dict(_EMPTY_ITEM)
        name = sel_one(card, "h2.stores_box_name")
        item["shop_name"] = name.itext().strip() if name else None
        cities = sel_one(card, "p.stores_box_cities")
        item["area_name"] = cities.itext().strip() if cities else None
        add = sel_one(card, "p.stores_box_add")
        item["address"] = add.itext().strip() if add else None
        tel_p = sel_one(card, "p.stores_box_tel")
        m = _TEL.match(tel_p.itext()) if tel_p is not None else None
        item["tel"] = m.group("tel") if m else None  # regex extraction (iwate.py:74-76)
        genre = sel_one(card, "p.stores_box_genre")
        item["genre_name"] = genre.itext().strip() if genre else None

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    return [
        {
            "prefecture": "iwate",
            "url": SEARCH_URL,
            "method": "POST",
            "form": {"k": "", "area": area},  # mandatory municipality (iwate.py:56-60)
            "meta": {"area_name": area},
            "callback": "parse",
            "depth": 0,
        }
        for area in AREA_LIST
    ]


SPEC = ParserSpec(
    name="iwate",
    family="site_iwate",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
