"""tochigi — paginated HTML list with per-card GoogleMap latlng links.

Reference configuration ported (tochigi.py:15-70):
  * domain gotoeat-tochigi.jp, seed /merchant/index.php (tochigi.py:16-17)
  * cards at div#contents ul.serch_result li ("serch" is the site's own
    typo, tochigi.py:21-23)
  * name p.name text; genre p.name span[class*=genre] (tochigi.py:25-28)
  * 所在地 div.add p[1]: 〒zip space address, zip sometimes absent
    (tochigi.py:32-40)
  * tel div.add p[2] a (tochigi.py:42)
  * official ul.hp a containing ホームページ (tochigi.py:43-45)
  * latlng from the GoogleMap link's /maps/.../@lat,lng,zoom/data path;
    google.co.jp and .com link shapes are mixed and some cards have no
    latlng at all (tochigi.py:48-54)
  * pagination: li.next a under #contents; absent on the last page
    (tochigi.py:62-70)
"""

from __future__ import annotations

import re

from ..functions.htmlsel import contains_text, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-tochigi.jp",)
START_URLS = ("https://www.gotoeat-tochigi.jp/merchant/index.php",)

_ZIP = re.compile(r"〒(?P<zip_code>.*?)\s(?P<address>.*)")
_GMAP = re.compile(r"/maps/.*/@(?P<lat>.*?),(?P<lng>.*?),(?P<zoom>.*)/data")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "div#contents ul.serch_result > li"):
        item = dict(_EMPTY_ITEM)
        name_p = sel_one(card, "p.name")
        item["shop_name"] = name_p.itext().strip() if name_p else None
        genre = sel_one(card, "p.name span[class*=genre]")
        item["genre_name"] = genre.text() or None if genre else None

        add_ps = sel(card, "div.add > p")
        place = add_ps[0].itext().strip() if add_ps else ""
        m = _ZIP.match(place)
        if m:  # zip sometimes missing (tochigi.py:38-40)
            item["zip_code"], item["address"] = m.group("zip_code"), m.group("address")
        else:
            item["zip_code"], item["address"] = None, place
        if len(add_ps) > 1:
            tel_a = sel_one(add_ps[1], "a")
            item["tel"] = tel_a.text() or None if tel_a else None

        hp_links = sel(card, "ul.hp a")
        hp = contains_text(hp_links, "ホームページ")
        item["official_page"] = hp[0].attr("href") if hp else None
        gmap = contains_text(hp_links, "GoogleMap")
        gmap_href = gmap[0].attr("href") if gmap else ""
        m = _GMAP.search(gmap_href or "")
        if m:
            item["provided_lat"], item["provided_lng"] = m.group("lat"), m.group("lng")

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))
        if gmap_href:
            res.spans.append(("link", "GoogleMap", gmap_href))

    nxt = sel_one(doc, "#contents li.next a")
    if nxt is not None and nxt.attr("href"):  # absent on last page
        res.links.append(_link(nxt.attr("href")))
        res.spans.append(("link", "次へ", nxt.attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "tochigi", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="tochigi",
    family="site_tochigi",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,  # reference settings.py:32 default
)
