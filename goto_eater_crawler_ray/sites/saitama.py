"""saitama — 73-municipality static-page fan-out, genre-tabbed cards.

Reference configuration ported (saitama.py:13-117):
  * domain saitama-goto-eat.com; THE quirk table: 73 municipality names
    (saitama.py:16-90) — the site serves one fixed HTML page per
    municipality, so the seed set is the full cross product
    ``/store/{area}.html`` with the area name carried in request meta
    (saitama.py:92-98)
  * cards grouped by genre tab: div.tab_content > div.aria_genre holds the
    genre label; each div.aria_store_content div.storebox is a shop
    (saitama.py:103-105)
  * positional span fields: span[1]=name, span[2] always empty, span[3]=zip,
    span[4]=address, span[5]=tel, span[6] a/@href=official page
    (saitama.py:109-114)
"""

from __future__ import annotations

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("saitama-goto-eat.com",)

# reference: saitama.py:16-90 (verbatim quirk table, 73 entries)
AREA_LIST = (
    "さいたま市西区",
    "さいたま市北区",
    "さいたま市大宮区",
    "さいたま市見沼区",
    "さいたま市中央区",
    "さいたま市桜区",
    "さいたま市浦和区",
    "さいたま市南区",
    "さいたま市緑区",
    "さいたま市岩槻区",
    "川越市",
    "熊谷市",
    "川口市",
    "行田市",
    "秩父市",
    "所沢市",
    "飯能市",
    "加須市",
    "本庄市",
    "東松山市",
    "春日部市",
    "狭山市",
    "羽生市",
    "鴻巣市",
    "深谷市",
    "上尾市",
    "草加市",
    "越谷市",
    "蕨市",
    "戸田市",
    "入間市",
    "朝霞市",
    "志木市",
    "和光市",
    "新座市",
    "桶川市",
    "久喜市",
    "北本市",
    "八潮市",
    "富士見市",
    "三郷市",
    "蓮田市",
    "坂戸市",
    "幸手市",
    "鶴ヶ島市",
    "日高市",
    "吉川市",
    "ふじみ野市",
    "白岡市",
    "北足立郡伊奈町",
    "入間郡三芳町",
    "入間郡毛呂山町",
    "入間郡越生町",
    "比企郡滑川町",
    "比企郡嵐山町",
    "比企郡小川町",
    "比企郡川島町",
    "比企郡吉見町",
    "比企郡鳩山町",
    "比企郡ときがわ町",
    "秩父郡横瀬町",
    "秩父郡皆野町",
    "秩父郡長瀞町",
    "秩父郡小鹿野町",
    "秩父郡東秩父村",
    "児玉郡美里町",
    "児玉郡神川町",
    "児玉郡上里町",
    "大里郡寄居町",
    "南埼玉郡宮代町",
    "北葛飾郡杉戸町",
    "北葛飾郡松伏町",
    "北埼玉郡騎西町",
)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    area_name = meta.get("area_name")
    if not area_name and "/store/" in url:
        # the area IS the page name (/store/{area}.html) — equivalent to
        # the reference's meta carry (saitama.py:96-97)
        from urllib.parse import unquote

        tail = url.rsplit("/", 1)[-1]
        area_name = unquote(tail[:-5]) if tail.endswith(".html") else None
    for tab in sel(doc, "div.tab_content"):
        genre_div = sel_one(tab, "div.aria_genre")
        genre_name = genre_div.text().strip() if genre_div else None
        for card in sel(tab, "div.aria_store_content div.storebox"):
            spans = card.children_by_tag("span")

            def sp(i: int) -> str | None:
                return spans[i - 1].itext().strip() if len(spans) >= i else None

            item = dict(_EMPTY_ITEM)
            item["area_name"] = area_name
            item["genre_name"] = genre_name
            item["shop_name"] = sp(1)
            item["zip_code"] = sp(3)  # span[2] is always empty (saitama.py:110)
            item["address"] = sp(4)
            item["tel"] = spans[4].itext() if len(spans) >= 5 else None
            link = sel_one(spans[5], "a") if len(spans) >= 6 else None
            item["official_page"] = link.attr("href") if link else None
            res.items.append(item)
            res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
            res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def seeds() -> list[dict]:
    # one fixed page per municipality; area name rides in meta
    return [
        {
            "prefecture": "saitama",
            "url": f"https://saitama-goto-eat.com/store/{area}.html",
            "method": "GET",
            "form": {},
            "meta": {"area_name": area},
            "callback": "parse",
            "depth": 0,
        }
        for area in AREA_LIST
    ]


SPEC = ParserSpec(
    name="saitama",
    family="site_saitama",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
