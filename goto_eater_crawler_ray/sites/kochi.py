"""kochi — one-shot positional-JSON-array shop list.

Reference configuration ported (kochi.py:7-46):
  * domain gotoeat-kochi.com, seed /js/shop_list.php returning a bare
    JSON array of arrays (kochi.py:15-18)
  * positional columns (the reference reverse-engineered them):
    1=area_name, 3=genre_name, 5=shop_name, 7=address, 8=tel
    (kochi.py:24-39)
  * THE quirk: the shop "<きてみいや>" is the one name that legitimately
    contains angle brackets, which the normalize stage's HTML-tag strip
    would destroy — the reference pre-rewrites it to "　きてみいや"
    before the pipeline (kochi.py:41-46); ported verbatim
"""

from __future__ import annotations

import json

from ..registry import ParserSpec
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("gotoeat-kochi.com",)
START_URLS = ("https://www.gotoeat-kochi.com/js/shop_list.php",)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    res = ParseResult()
    for row in json.loads(body.decode("utf-8", "replace")):
        item = dict(_EMPTY_ITEM)
        item["area_name"] = row[1]
        item["genre_name"] = row[3]
        # the one angle-bracket shop name, protected from the HTML strip
        # exactly like the reference (kochi.py:41-46)
        item["shop_name"] = row[5].replace("<きてみいや>", "　きてみいや")
        item["address"] = row[7]
        item["tel"] = row[8] or None
        res.items.append(item)
        res.spans.append(("text", (item["shop_name"] or "").strip(), ""))
        res.spans.append(("text", (item["address"] or "").strip(), ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "kochi", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="kochi",
    family="site_kochi",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
