"""tokyo — PDF-list landing page fanning out to per-PDF table extraction.

Reference configuration ported (tokyo.py:13-98):
  * landing page r.gnavi.co.jp/plan/campaign/gotoeat-tokyo/; every
    section#c-search__pdf ul li a@href is one shop-list PDF, each fetched
    as its own request (per-PDF fan-out, tokyo.py:27-31)
  * per-PDF, tables are extracted ONE PAGE AT A TIME (the reference runs
    tabula per page because whole-file extraction scrambled the last
    page, tokyo.py:48-57); pages land as CSV-shaped tables
  * df-repair quirks (tokyo.py:66-90):
      - a page may lack its header row and carry 7 raw columns ->
        force-name them 紙/電子/飲食店名/店舗住所/店舗電話番号/URL/業態
      - the URL column may be entirely absent -> fill ""
      - header rows echoed INTO the data (飲食店名 == "飲食店名") are
        dropped, as are rows missing name or address
  * item fields: 飲食店名 / 店舗住所 / 店舗電話番号 / URL / 業態
    (tokyo.py:92-98)

PDF bodies go through the SAME codec seam as the generic filetab family
(stages/parse.py ``_pdf_pages_real``): the seam is CLOSED — pdfplumber
when installed, else the stdlib object-scan + content-stream extractor
(the reference needs tabula+JVM, neither in this container); the
deterministic form-feed CSV fake keeps the repair logic exercised on
the deterministic corpus.
"""

from __future__ import annotations

import csv
import io

from ..functions.htmlsel import parse_html, sel
from ..registry import ParserSpec
from ..stages.normalize import normalize_text
from ..stages.parse import _EMPTY_ITEM, ParseResult, _link, _pdf_pages_real

ALLOWED_DOMAINS = ("gnavi.co.jp",)
START_URLS = ("https://r.gnavi.co.jp/plan/campaign/gotoeat-tokyo/",)

# tokyo.py:72 — forced column names for headerless 7-column pages
FORCED_COLUMNS = ("紙", "電子", "飲食店名", "店舗住所", "店舗電話番号", "URL", "業態")
COL_NAME, COL_ADDR, COL_TEL, COL_URL, COL_GENRE = ("飲食店名", "店舗住所", "店舗電話番号", "URL", "業態")


def parse(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    if url.endswith(".pdf"):  # defensive: same routing the callback table does
        return parse_from_pdf(url, body, meta, depth)
    doc = parse_html(body.decode("utf-8", "replace"))
    res = ParseResult()
    for a in sel(doc, "section#c-search__pdf ul li a"):
        href = (a.attr("href") or "").strip()
        if not href:
            continue
        res.links.append(_link(href, callback="file_pdf"))
        res.spans.append(("pdf", normalize_text(a.text()) or "", href))
    return res


def parse_from_pdf(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    res = ParseResult()
    if body[:5] == b"%PDF-":  # real pdf container -> codec seam (closed)
        pages = _pdf_pages_real(body)
    else:
        pages = body.decode("utf-8", "replace").split("\f")

    for page in pages:
        rows = [r for r in csv.reader(io.StringIO(page)) if any(c.strip() for c in r)]  # dropna(how="all")
        if not rows:
            continue
        if COL_NAME in rows[0]:
            header, data = rows[0], rows[1:]
        elif len(rows[0]) == 7:  # headerless page -> forced names (tokyo.py:71-74)
            header, data = list(FORCED_COLUMNS), rows
        else:
            header, data = rows[0], rows[1:]
        idx = {name: i for i, name in enumerate(header)}

        def cell(parts: list[str], col: str) -> str:
            i = idx.get(col)
            return parts[i] if i is not None and i < len(parts) else ""  # absent URL column -> "" (tokyo.py:76-78)

        for parts in data:
            name, addr = cell(parts, COL_NAME), cell(parts, COL_ADDR)
            if name == COL_NAME:  # header echoed into data (tokyo.py:85-87)
                continue
            if not name or not addr:  # blank PDF rows (tokyo.py:88-90)
                continue
            item = dict(_EMPTY_ITEM)
            item["shop_name"] = name
            item["address"] = addr
            item["genre_name"] = cell(parts, COL_GENRE) or None
            item["tel"] = cell(parts, COL_TEL) or None
            item["official_page"] = cell(parts, COL_URL) or None
            res.items.append(item)
            res.spans.append(("text", name.strip(), ""))
            res.spans.append(("text", addr.strip(), ""))
    return res


def seeds() -> list[dict]:
    return [
        {"prefecture": "tokyo", "url": u, "method": "GET", "form": {}, "meta": {}, "callback": "parse", "depth": 0}
        for u in START_URLS
    ]


SPEC = ParserSpec(
    name="tokyo",
    family="site_tokyo",
    allowed_domains=ALLOWED_DOMAINS,
    seeds=seeds,
    callbacks={"parse": parse, "file_pdf": parse_from_pdf},
    crawl_delay_s=3.0,
)
