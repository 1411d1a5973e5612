"""osaka — paginated HTML search with tag-list area-vs-genre split.

Reference configuration ported (osaka.py:15-92):
  * domain goto-eat.weare.osaka-info.jp; the seed is the site's own
    "all areas, all genres" search-result URL, ported verbatim
    (osaka.py:19-21)
  * cards at div.search_result_box > ul > li (osaka.py:52)
  * shop name p.name text; when absent the reference hard-codes
    "珉珉上新庄駅前店" — the one card whose name never renders
    (osaka.py:55-60)
  * tags ul.tag_list li are EITHER an area (10-entry AREA_LIST,
    osaka.py:25-36; last-wins per the reference's 後勝ち note) or a
    genre; genres join with "|" (osaka.py:62-70)
  * table-layout fields: row 1 td text -> [zip, address] with all
    whitespace squeezed out of the address, rows 2-4 -> tel /
    opening_hours / closing_day (osaka.py:72-78)
  * detail_page from the a containing 詳しく見る (osaka.py:79)
  * pagination div[role=navigation] a[rel=next]; absent on the last
    page (osaka.py:85-92)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import contains_text, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("goto-eat.weare.osaka-info.jp",)
# reference osaka.py:19-21 — the full-search URL, verbatim
START_URLS = (
    "https://goto-eat.weare.osaka-info.jp/gotoeat/?search_element_0_0=2&search_element_0_1=3"
    "&search_element_0_2=4&search_element_0_3=5&search_element_0_4=6&search_element_0_5=7"
    "&search_element_0_6=8&search_element_0_7=9&search_element_0_8=10&search_element_0_9=11"
    "&search_element_0_cnt=10&search_element_1_cnt=17&search_element_2_cnt=1&s_keyword_3="
    "&cf_specify_key_3_0=gotoeat_shop_address01&cf_specify_key_3_1=gotoeat_shop_address02"
    "&cf_specify_key_3_2=gotoeat_shop_address03&cf_specify_key_length_3=2"
    "&searchbutton=%E5%8A%A0%E7%9B%9F%E5%BA%97%E8%88%97%E3%82%92%E6%A4%9C%E7%B4%A2%E3%81%99%E3%82%8B"
    "&csp=search_add&feadvns_max_line_0=4&fe_form_no=0",
)

# reference osaka.py:25-36 (verbatim area tag table)
AREA_LIST = (
    "キタ",
    "ミナミ",
    "大阪城",
    "あべの・天王寺",
    "ベイエリア",
    "北摂",
    "北河内",
    "中河内",
    "南河内",
    "泉州",
)

# reference osaka.py:56-60 — the single card whose name never renders
FALLBACK_SHOP_NAME = "珉珉上新庄駅前店"

_WS = re.compile(r"\s")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div.search_result_box > ul > li"):
        item = dict(_EMPTY_ITEM)
        name_p = sel_one(card, "p.name")
        name = name_p.itext().strip() if name_p else ""
        item["shop_name"] = name or FALLBACK_SHOP_NAME

        genres: list[str] = []
        for tag in sel(card, "ul.tag_list li"):
            tagtext = tag.text().strip()
            if tagtext in AREA_LIST:  # last-wins (osaka.py:64-67)
                item["area_name"] = tagtext
                continue
            genres.append(tagtext)
        item["genre_name"] = "|".join(genres)

        trs = sel(card, "table tr")
        if trs:  # row 1: all td text chunks -> [zip, address] (osaka.py:73-75)
            chunks = [t for td in trs[0].children_by_tag("td") for t in td.texts()]
            if len(chunks) > 0:
                item["zip_code"] = chunks[0].strip()
            if len(chunks) > 1:
                item["address"] = _WS.sub("", chunks[1])

        def _row_text(i: int) -> str | None:
            if len(trs) <= i:
                return None
            td = sel_one(trs[i], "td")
            t = td.itext() if td else ""
            return t if t else None

        item["tel"] = _row_text(1)
        item["opening_hours"] = _row_text(2)
        item["closing_day"] = _row_text(3)

        detail = contains_text(sel(card, "a"), "詳しく見る")
        if detail and detail[0].attr("href"):
            item["detail_page"] = detail[0].attr("href").strip()

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))
        if item["detail_page"]:
            res.spans.append(("link", "詳しく見る", item["detail_page"]))

    nxt = sel(doc, "div[role=navigation] a[rel=next]")
    if nxt and nxt[0].attr("href"):  # absent on last page (osaka.py:86-88)
        res.links.append(_link(nxt[0].attr("href")))
        res.spans.append(("link", "次へ", nxt[0].attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "osaka", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="osaka",
    family="site_osaka",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,  # reference briefly tried 6 s for 504s, reverted (osaka.py:41-47)
)
