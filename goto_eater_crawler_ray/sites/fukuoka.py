"""fukuoka — one-shot CSV download with a 15-entry genre code table.

Reference configuration ported (fukuoka.py:16-70):
  * domain gotoeat-fukuoka.jp, seed /csv/fk_gotoeat_UTF-8.csv
    (fukuoka.py:17-18)
  * THE quirk table: genre code 1..15 -> name, index 0 unused — the CSV's
    13.店舗情報ジャンル column is an int code (fukuoka.py:20-37)
  * named-column usecols selection; 町域/建物/HP columns NaN-fill to ""
    (fukuoka.py:47-60)
  * address = city + street + building concatenation (fukuoka.py:66)
"""

from __future__ import annotations

import csv
import io

from ..registry import ParserSpec
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("gotoeat-fukuoka.jp",)
START_URLS = ("https://gotoeat-fukuoka.jp/csv/fk_gotoeat_UTF-8.csv",)

# reference: fukuoka.py:20-37 (verbatim code table; [0] is a placeholder so
# that code 1 = 和食・寿司 ... code 15 = その他)
GENRE_LIST = (
    "",
    "和食・寿司",  # [1]
    "洋食",
    "中華料理",
    "フレンチ・イタリアン",
    "ラーメン・餃子",
    "焼肉・ホルモン・韓国料理",
    "すき焼き・しゃぶしゃぶ",
    "アジア・エスニック・各国料理",
    "カフェ・スイーツ",
    "ファミリーレストラン・食堂",
    "居酒屋",
    "バー・ダイニングバー",
    "ファーストフード",
    "うどん・そば・丼",
    "その他",  # [15]
)

# the CSV's named columns (fukuoka.py:50-59)
COL_NAME = "11.店舗情報：店舗名"
COL_GENRE = "13.店舗情報ジャンル"
COL_ZIP = "14.店舗住所：郵便番号"
COL_CITY = "16.店舗住所：市町村"
COL_STREET = "17.店舗住所：町域、番地"
COL_BUILDING = "18.店舗住所：建物名"
COL_TEL = "19.店舗情報：電話番号"
COL_HP = "20.店舗ホームページ"
_FILLNA = (COL_STREET, COL_BUILDING, COL_HP)


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    res = ParseResult()
    reader = csv.DictReader(io.StringIO(body.decode("utf-8-sig", "replace")))
    for row in reader:
        if not row.get(COL_NAME):
            continue
        for col in _FILLNA:  # pandas fillna("") equivalent (fukuoka.py:60)
            if row.get(col) is None:
                row[col] = ""
        item = dict(_EMPTY_ITEM)
        item["shop_name"] = row[COL_NAME]
        try:
            code = int(row.get(COL_GENRE) or 0)
        except ValueError:
            code = 0
        item["genre_name"] = GENRE_LIST[code] if 0 <= code < len(GENRE_LIST) else None
        item["zip_code"] = row.get(COL_ZIP) or None
        item["address"] = "{}{}{}".format(row.get(COL_CITY) or "", row[COL_STREET], row[COL_BUILDING])
        item["tel"] = row.get(COL_TEL) or None
        item["official_page"] = row[COL_HP] or None
        res.items.append(item)
        res.spans.append(("text", (item["shop_name"] or "").strip(), ""))
        res.spans.append(("text", (item["address"] or "").strip(), ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "fukuoka", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="fukuoka",
    family="site_fukuoka",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
