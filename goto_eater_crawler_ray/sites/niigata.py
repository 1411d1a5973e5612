"""niigata — tag-classified HTML list with mySubmit() pagination.

Reference configuration ported (niigata.py:15-109):
  * domain niigata-gte.com, seed /shop/ (niigata.py:16-17)
  * THE quirk table: the 37-entry area list (niigata.py:19-57) — a tag is
    an area name iff it is in this list, otherwise a genre; area tags are
    assumed single (last wins, niigata.py:84-88); genres join with "|"
    (niigata.py:89)
  * cards div#result div.cont; name = all h4 text incl. linked part
    (niigata.py:61-64); official = h4 a href
  * place p.add direct text; zip only when it starts with 〒 (the
    ジョリーパスタ長岡今朝白店 card has neither, niigata.py:66-74)
  * tel p.tel (niigata.py:76)
  * latlng from p.add span a href, digits-only @lat,lng, shape
    (niigata.py:91-95)
  * pagination: li.next a @onclick "mySubmit('<url>');"; absent on the
    last page (niigata.py:99-109)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("niigata-gte.com",)
START_URLS = ("https://niigata-gte.com/shop/",)

# reference: niigata.py:19-57 (verbatim quirk table — the per-prefecture
# data a user porting the reference needs)
AREA_LIST = (
    "新潟市北区",
    "新潟市東区",
    "新潟市中央区",
    "新潟市江南区",
    "新潟市秋葉区",
    "新潟市南区",
    "新潟市西区",
    "新潟市西蒲区",
    "長岡市",
    "三条市",
    "柏崎市",
    "新発田市",
    "小千谷市",
    "加茂市",
    "十日町市",
    "見附市",
    "村上市",
    "燕市",
    "糸魚川市",
    "妙高市",
    "五泉市",
    "上越市",
    "阿賀野市",
    "佐渡市",
    "魚沼市",
    "南魚沼市",
    "胎内市",
    "聖籠町",
    "弥彦村",
    "田上町",
    "阿賀町",
    "出雲崎町",
    "湯沢町",
    "津南町",
    "刈羽村",
    "関川村",
    "粟島浦村",
)
AREA_SET = frozenset(AREA_LIST)

_ZIP = re.compile(r"〒(?P<zip_code>.*?)\s(?P<address>.*)")
_GMAP = re.compile(r"/@(?P<lat>\d+\.\d+),(?P<lng>\d+\.\d+),")
_MYSUBMIT = re.compile(r"^mySubmit\('(?P<page>.*)'\);$")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div#result div.cont"):
        item = dict(_EMPTY_ITEM)
        h4 = sel_one(card, "h4")
        item["shop_name"] = h4.text().strip() if h4 else None  # text + a text
        link = sel_one(card, "h4 a")
        item["official_page"] = link.attr("href") if link else None

        p_add = sel_one(card, "p.add")
        place = p_add.itext().strip() if p_add else ""
        if place.startswith("〒"):
            m = _ZIP.match(place)
            item["zip_code"], item["address"] = m.group("zip_code"), m.group("address")
        else:  # niigata.py:71-74
            item["zip_code"], item["address"] = None, place

        tel_p = sel_one(card, "p.tel")
        item["tel"] = tel_p.itext().strip() or None if tel_p else None

        genres: list[str] = []
        for tag in sel(card, "div.tag span"):
            tagtext = tag.text().strip()
            if not tagtext:
                continue
            if tagtext in AREA_SET:  # single-area assumption, last wins
                item["area_name"] = tagtext
                continue
            genres.append(tagtext)
        item["genre_name"] = "|".join(genres)

        gmap_a = sel_one(card, "p.add span a")
        gmap_href = (gmap_a.attr("href") if gmap_a else "") or ""
        m = _GMAP.search(gmap_href)
        if m:
            item["provided_lat"], item["provided_lng"] = m.group("lat"), m.group("lng")

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    onclick_a = sel_one(doc, "div#pagination ul li.next a")
    if onclick_a is not None:
        m = _MYSUBMIT.match(onclick_a.attr("onclick") or "")
        if m:
            res.links.append(_link(m.group("page")))
            res.spans.append(("link", "次へ", m.group("page")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "niigata", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="niigata",
    family="site_niigata",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
