"""akita — one-shot headerless CSV download.

Reference configuration ported (akita.py:16-51):
  * domain gotoeat-akita.com, seed /csv/list.csv (akita.py:17-18)
  * the CSV has NO header row; the reference names the 5 columns
    店舗名 / 市町村 / 所在地 / 電話番号 / 公式ホームページ and
    NaN-fills to "" (akita.py:30)
  * shop names carry a search-furigana inside an HTML comment
    (``店名<!--てんめい-->``) which the NORMALIZE stage strips as an
    HTML tag — kept verbatim here, exactly like the reference where the
    item pipeline does the stripping (akita.py:34-36)
  * rows with an empty 所在地 are dropped (akita.py:39-40)
  * the address's own comment markers are stripped INLINE (the value
    inside is real data the site operator backfilled; akita.py:42-44)
  * no genre information exists for akita (akita.py:50)
"""

from __future__ import annotations

import csv
import io

from ..registry import ParserSpec
from ..stages.parse import _EMPTY_ITEM, ParseResult

ALLOWED_DOMAINS = ("gotoeat-akita.com",)
START_URLS = ("https://gotoeat-akita.com/csv/list.csv",)

# reference akita.py:30 names=(...)
COLUMNS = ("店舗名", "市町村", "所在地", "電話番号", "公式ホームページ")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    res = ParseResult()
    for parts in csv.reader(io.StringIO(body.decode("utf-8-sig", "replace"))):
        if not parts:
            continue
        row = dict(zip(COLUMNS, parts + [""] * (len(COLUMNS) - len(parts))))  # fillna("")
        if not row["所在地"]:  # empty-address drop (akita.py:39-40)
            continue
        item = dict(_EMPTY_ITEM)
        item["shop_name"] = row["店舗名"]  # furigana comment survives until normalize
        item["address"] = row["所在地"].replace("<!--", "").replace("-->", "").strip()
        item["area_name"] = row["市町村"] or None
        item["tel"] = row["電話番号"] or None
        item["official_page"] = row["公式ホームページ"] or None
        res.items.append(item)
        res.spans.append(("text", item["shop_name"].strip(), ""))
        res.spans.append(("text", item["address"], ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "akita", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="akita",
    family="site_akita",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
