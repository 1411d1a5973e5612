"""yamaguchi — per-area query fan-out with strong-label paragraphs.

Reference configuration ported (yamaguchi.py:7-72):
  * domain gotoeat-yamaguchi.com; 8 area-coded search URLs
    (?post_type=post&s=&cat_area[]=NN-shop-area), each carrying its
    human area name in the request meta — the site itself never shows
    the area (yamaguchi.py:16-30)
  * cards ul#shop-list > li; name div.left h3 a (yamaguchi.py:37-38)
  * multi-genre: p.type a texts with the ● bullet stripped, "|"-joined
    (yamaguchi.py:41-42)
  * ［住所］/［営業時間］/［定休日］/［TEL］ are STRONG labels inside
    p's — the value is the p's OWN text after the label
    (yamaguchi.py:44-58)
  * official page: only the FIRST div.rink link (the site also lists
    SNS accounts) (yamaguchi.py:60-61)
  * pagination div[role=navigation] a[rel=next], meta carried forward
    (yamaguchi.py:64-71)
"""

from __future__ import annotations

from ..functions.htmlsel import Node, parse_html, sel, sel_one
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link

ALLOWED_DOMAINS = ("gotoeat-yamaguchi.com",)

# reference yamaguchi.py:17-26 (verbatim area-code table)
AREA_LIST = (
    ("01-shop-area", "岩国エリア"),
    ("02-shop-area", "柳井エリア"),
    ("03-shop-area", "周南エリア"),
    ("04-shop-area", "山口・防府エリア"),
    ("05-shop-area", "萩エリア"),
    ("06-shop-area", "長門エリア"),
    ("07-shop-area", "宇部・小野田・美祢エリア"),
    ("08-shop-area", "下関エリア"),
)


def _strong_label_text(card: Node, label: str) -> str | None:
    for p in sel(card, "div[class*=left] p"):
        strong = sel_one(p, "strong")
        if strong is not None and label in strong.text():
            return p.itext() or None  # the p's OWN text after the label
    return None


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for card in sel(doc, "ul#shop-list > li"):
        item = dict(_EMPTY_ITEM)
        item["area_name"] = meta.get("area_name")  # from the seed (yamaguchi.py:35)
        name = sel_one(card, "div.left h3 a")
        item["shop_name"] = name.itext().strip() if name else None
        genres = [g.itext().replace("●", "") for g in sel(card, "div.left p.type a")]
        item["genre_name"] = "|".join(genres)  # (yamaguchi.py:41-42)

        addr = _strong_label_text(card, "［住所］")
        item["address"] = addr.strip() if addr else None
        hours = _strong_label_text(card, "［営業時間］")
        item["opening_hours"] = hours.strip() if hours else None
        off = _strong_label_text(card, "［定休日］")
        item["closing_day"] = off.strip() if off else None
        item["tel"] = _strong_label_text(card, "［TEL］")  # raw (yamaguchi.py:56-58)

        rinks = sel(card, "div.rink a")
        item["official_page"] = rinks[0].attr("href") if rinks else None  # first only

        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))

    nxt = sel(doc, "div[role=navigation] a[rel=next]")
    if nxt and nxt[0].attr("href"):  # meta carried forward (yamaguchi.py:71)
        res.links.append(_link(nxt[0].attr("href"), meta=dict(meta)))
        res.spans.append(("link", "次へ", nxt[0].attr("href")))
    return res


def seeds() -> list[dict]:
    return [
        {
            "prefecture": "yamaguchi",
            "url": f"https://gotoeat-yamaguchi.com/use/?post_type=post&s=&cat_area%5B%5D={code}",
            "method": "GET",
            "form": {},
            "meta": {"area_name": name},
            "callback": "parse",
            "depth": 0,
        }
        for code, name in AREA_LIST
    ]


SPEC = ParserSpec(
    name="yamaguchi",
    family="site_yamaguchi",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
