"""yamagata — JSON-wrapped HTML POST pager with a 35-entry area classifier.

Reference configuration ported (yamagata.py:16-143):
  * domain yamagata-gotoeat.com; POST endpoint
    /wp/wp-content/themes/gotoeat/search.php with form
    {"text": "", "page": n} (yamagata.py:19,59-61,142-143)
  * THE quirk table: the 35-entry area list (yamagata.py:21-57); a result
    tag is EITHER an area (if in the list) or a genre, both assumed
    single-valued (yamagata.py:102-111)
  * response is JSON: data["html"] holds bare <li> cards, parsed after
    wrapping in <article>; data["pager"] holds the pager DOM
    (yamagata.py:63-83, 117-135)
  * name h2 text incl. linked part; official h2 a href (yamagata.py:86-87)
  * place = first div text, zip WITHOUT a 〒 prefix; the エノテーカ card
    has no zip at all (yamagata.py:89-97)
  * tel = second div text minus the "TEL : " label (yamagata.py:99-100)
  * stop rule: the pager shows no next-less last page; finish when the
    active page number equals the 次へ target (yamagata.py:115-139)
"""

from __future__ import annotations

import json
import re

from ..functions.htmlsel import contains_text, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("yamagata-gotoeat.com",)
ENDPOINT = "https://yamagata-gotoeat.com/wp/wp-content/themes/gotoeat/search.php"

# reference: yamagata.py:21-57 (verbatim quirk table)
AREA_LIST = (
    "山形市",
    "寒河江市",
    "上山市",
    "村山市",
    "天童市",
    "東根市",
    "尾花沢市",
    "山辺町",
    "中山町",
    "河北町",
    "西川町",
    "朝日町",
    "大江町",
    "大石田町",
    "新庄市",
    "金山町",
    "最上町",
    "舟形町",
    "真室川町",
    "大蔵村",
    "鮭川村",
    "戸沢村",
    "米沢市",
    "南陽市",
    "長井市",
    "高畠町",
    "川西町",
    "小国町",
    "白鷹町",
    "飯豊町",
    "酒田市",
    "鶴岡市",
    "三川町",
    "庄内町",
    "遊佐町",
)
AREA_SET = frozenset(AREA_LIST)

_ZIP = re.compile(r"(?P<zip_code>.*?)\s(?P<address>.*)")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    data = json.loads(body)
    res = ParseResult()
    html = parse_html("<article>{}</article>".format(data.get("html", "")))
    for card in sel(html, "article > li"):
        item = dict(_EMPTY_ITEM)
        h2 = sel_one(card, "h2")
        item["shop_name"] = h2.text().strip() if h2 else None
        a = sel_one(card, "h2 a")
        item["official_page"] = a.attr("href") if a else None

        divs = card.children_by_tag("div")
        place = divs[0].itext().strip() if divs else ""
        m = _ZIP.match(place)
        if m:
            item["zip_code"], item["address"] = m.group("zip_code"), m.group("address")
        else:  # yamagata.py:97: the エノテーカ shape (no zip)
            item["zip_code"], item["address"] = None, place
        tel = divs[1].itext() if len(divs) > 1 else None
        item["tel"] = tel.replace("TEL : ", "").strip() if tel else None

        for tag in sel(card, "ul.search__result__tag li"):
            tagtext = tag.itext()
            if not tagtext:
                continue
            if tagtext in AREA_SET:  # single-valued assumption (yamagata.py:103)
                item["area_name"] = tagtext
                continue
            item["genre_name"] = tagtext

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    pager = parse_html(data.get("pager", ""))
    active = sel_one(pager, "div.search__pager li[class*=active]")
    active_page = active.attr("data-page") if active else None
    nxt = contains_text(sel(pager, "div.search__pager > div"), "次へ")
    next_page = nxt[0].attr("data-page") if nxt else None
    if next_page is not None and active_page != next_page:
        res.links.append(_link(url, method="POST", form={"text": "", "page": next_page}))
        res.spans.append(("link", "次へ", f"{url}#page={next_page}"))
    return res


def seeds() -> list[dict]:
    return [
        {
            "prefecture": "yamagata",
            "url": ENDPOINT,
            "method": "POST",
            "form": {"text": "", "page": "1"},
            "meta": {},
            "callback": "parse",
            "depth": 0,
        }
    ]


SPEC = ParserSpec(
    name="yamagata",
    family="site_yamagata",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
