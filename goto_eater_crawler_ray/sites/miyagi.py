"""miyagi — 7-region POST fan-out with an html⋈js latlng join.

Reference configuration ported (miyagi.py:16-121):
  * domain gte-miyagi.jp; no pagination — seven POST seeds, one per region
    page (五 Sendai wards by dedicated php page + north/south with
    area=all), form {"searchwords": " ", "area": ..., "ch": "all"}
    (miyagi.py:26-64)
  * area name from the [ ... ] bracket in div.wrap div.cont h2 span
    (miyagi.py:67-69)
  * markers: "const data = [...]" JS-object literal in a <script>, decoded
    with the tolerant (demjson-equivalent) converter
    functions/extract.py:decode_js_object (miyagi.py:71-86)
  * cards div.SLCont dl.shopList: dt = name, dd[1] span[2] = genre,
    dd[2] span[2] = 〒zip address, dd[3] span[2] = tel, dd[4] span.url
    TEXT (not href — some cards have no link) = official page
    (miyagi.py:89-104)
  * the join: marker.name equal AND item address substring of
    marker.content; exactly one match -> copy lat/lng, zero or many ->
    leave null (miyagi.py:106-119)
"""

from __future__ import annotations

import re

from ..functions.extract import decode_js_object
from ..functions.htmlsel import parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("gte-miyagi.jp",)

# reference: miyagi.py:26-57 (verbatim quirk table: region page + POST form)
AREA_FORMS = (
    {"url": "https://gte-miyagi.jp/gte/available_aobaku.php", "params": {"searchwords": " ", "area": "仙台市青葉区", "ch": "all"}},
    {"url": "https://gte-miyagi.jp/gte/available_miyaginoku.php", "params": {"searchwords": " ", "area": "仙台市宮城野区", "ch": "all"}},
    {"url": "https://gte-miyagi.jp/gte/available_wakabayashiku.php", "params": {"searchwords": " ", "area": "仙台市若林区", "ch": "all"}},
    {"url": "https://gte-miyagi.jp/gte/available_taihakuku.php", "params": {"searchwords": " ", "area": "仙台市太白区", "ch": "all"}},
    {"url": "https://gte-miyagi.jp/gte/available_izumiku.php", "params": {"searchwords": " ", "area": "仙台市泉区", "ch": "all"}},
    {"url": "https://gte-miyagi.jp/gte/available03.php", "params": {"searchwords": " ", "area": "all", "ch": "all"}},  # 県北部
    {"url": "https://gte-miyagi.jp/gte/available04.php", "params": {"searchwords": " ", "area": "all", "ch": "all"}},  # 県南部
)

_AREA_BRACKET = re.compile(r"\[\s(?P<area_name>.*)\s\]")
_JS_DATA = re.compile(r"const data = (?P<js_data>\[.*?\]);", re.DOTALL)
_ZIP = re.compile(r"〒(?P<zip_code>.*?)\s(?P<address>.*)")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    text = body.decode("utf-8", "replace")
    doc = parse_html(text)
    res = ParseResult()

    h2span = sel_one(doc, "div.wrap div.cont h2 span")
    m = _AREA_BRACKET.search(h2span.text() if h2span else "")
    area_name = m.group("area_name") if m else None

    # markers live in a <script>; regex over the raw text (the script body
    # is not markup), then tolerant JS-literal decode (miyagi.py:71-86)
    jm = _JS_DATA.search(text)
    markers = [
        {
            "shop_name": normalize_text((row.get("name") or "").strip()) or "",
            "address": normalize_text((row.get("content") or "").strip()) or "",
            "lat": row.get("lat"),
            "lng": row.get("lng"),
        }
        for row in (decode_js_object(jm.group("js_data")) if jm else [])
    ]

    for card in sel(doc, "div.SLCont dl.shopList"):
        item = dict(_EMPTY_ITEM)
        item["area_name"] = area_name
        dt = sel_one(card, "dt")
        item["shop_name"] = dt.text().strip() if dt else None
        dds = card.children_by_tag("dd")

        def dd_span2(i: int) -> str | None:
            if i < len(dds):
                spans = dds[i].children_by_tag("span")
                if len(spans) > 1:
                    return spans[1].text()
            return None

        item["genre_name"] = (dd_span2(0) or "").strip() or None
        place = " ".join((dd_span2(1) or "").split())
        m = _ZIP.match(place)
        if m:
            item["address"] = m.group("address").strip()
            item["zip_code"] = m.group("zip_code").strip()
        else:
            item["address"], item["zip_code"] = place or None, None
        item["tel"] = (dd_span2(2) or "").strip() or None
        url_span = sel_one(dds[3], "span.url") if len(dds) > 3 else None
        item["official_page"] = (url_span.text().strip() or None) if url_span else None

        # html ⋈ js: name equal + address substring.  Reference BEHAVIOR
        # (miyagi.py:113-119): `if match:` copies match[0] for ANY non-empty
        # match — its `elif 1 < len(match)` branch is dead code — so >1
        # matches take the FIRST marker, not null.  Parity is to the
        # behavior, not the logged intent.
        clean_name = normalize_text(item["shop_name"]) or ""
        clean_addr = normalize_text(item["address"]) or ""
        match = [mk for mk in markers if clean_name == mk["shop_name"] and clean_addr and clean_addr in mk["address"]]
        if match:  # 0 -> leave null; >=1 -> first marker wins
            item["provided_lat"] = f"{match[0]['lat']}"
            item["provided_lng"] = f"{match[0]['lng']}"

        res.items.append(item)
        res.spans.append(("text", clean_name, ""))
        res.spans.append(("text", clean_addr, ""))
    return res


def seeds() -> list[dict]:
    return [
        {
            "prefecture": "miyagi",
            "url": row["url"],
            "method": "POST",
            "form": dict(row["params"]),
            "meta": {},
            "callback": "parse",
            "depth": 0,
        }
        for row in AREA_FORMS
    ]


SPEC = ParserSpec(
    name="miyagi",
    family="site_miyagi",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
