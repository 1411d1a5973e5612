"""nara — one-shot XLSX download through the codec seam.

Reference configuration ported (nara.py:11-41):
  * domain premium-gift.jp, seed /files/140/document/1660/利用店舗一覧.xlsx
    (nara.py:18-19)
  * sheet リスト, all cells read as strings, 電話番号/URL NaN-fill to ""
    (nara.py:31)
  * named columns エリア / 店舗名称 / カテゴリー / 住所 / 電話番号 / URL;
    エリア, カテゴリー, 住所 are stripped; 店舗名称 may contain embedded
    newlines and is kept verbatim (normalize squeezes later)
    (nara.py:33-39)

Body decode goes through the SAME codec seam as the generic filetab
family (stages/parse.py ``_xlsx_rows_real``): a real zip container
decodes via openpyxl when installed, else the stdlib zip+XML reader
(seam CLOSED; malformed zips raise ``zipfile.BadZipFile``); the
deterministic FAKE-XLSX TSV fake — here WITH a header row carrying the
reference's column names — keeps the column-mapping logic testable in
isolation.
"""

from __future__ import annotations

from ..registry import ParserSpec
from ..stages.parse import _EMPTY_ITEM, ParseResult, _xlsx_rows_real

ALLOWED_DOMAINS = ("premium-gift.jp",)
START_URLS = ("https://premium-gift.jp/files/140/document/1660/利用店舗一覧.xlsx",)

COL_AREA, COL_NAME, COL_GENRE, COL_ADDR, COL_TEL, COL_URL = (
    "エリア",
    "店舗名称",
    "カテゴリー",
    "住所",
    "電話番号",
    "URL",
)


def _rows(body: bytes) -> list[list[str]]:
    if body[:2] == b"PK":  # real xlsx (zip container)
        return _xlsx_rows_real(body)
    lines = body.decode("utf-8", "replace").splitlines()
    if not lines or not lines[0].startswith("FAKE-XLSX"):
        raise NotImplementedError("unrecognized xlsx body (neither real zip nor FAKE-XLSX fixture)")
    return [line.split("\t") for line in lines[1:]]


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    res = ParseResult()
    rows = _rows(body)
    if not rows:
        return res
    header = {name: i for i, name in enumerate(rows[0])}

    def cell(parts: list[str], col: str) -> str:
        i = header.get(col)
        return parts[i] if i is not None and i < len(parts) else ""  # fillna("")

    for parts in rows[1:]:
        if not any(p.strip() for p in parts):
            continue
        item = dict(_EMPTY_ITEM)
        item["area_name"] = cell(parts, COL_AREA).strip()
        item["shop_name"] = cell(parts, COL_NAME)  # embedded newlines kept (nara.py:35)
        item["genre_name"] = cell(parts, COL_GENRE).strip()
        item["address"] = cell(parts, COL_ADDR).strip()
        item["tel"] = cell(parts, COL_TEL) or None
        item["official_page"] = cell(parts, COL_URL) or None
        res.items.append(item)
        res.spans.append(("text", item["shop_name"].strip(), ""))
        res.spans.append(("text", item["address"], ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "nara", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="nara",
    family="site_nara",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse},
    crawl_delay_s=3.0,
)
