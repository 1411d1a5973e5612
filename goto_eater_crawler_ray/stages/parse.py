"""Parse dispatch: fetched pages -> (items, interleaved spans, discovered links).

Each parser family reproduces one reference spider family's semantics
(SURVEY.md §2.9) over the synthetic corpus formats of
``sources/pagestore.py``.  All parsers are pure functions
``(url, body, meta, depth) -> ParseResult`` called from a stateless
``map_batches`` stage (compiled regexes at module import = once per worker
process, never per batch/row — SURVEY.md §7.2).

Outputs:
  items  — flat ShopItem rows (reference 12-col order, settings.py:100-113)
           + (prefecture, source_url, row_in_page); normalized downstream by
           stages/normalize.py.
  spans  — interleaved text+media span documents per BASELINE.json
           input_hint: (doc_id, [(kind, text, media_ref, offset), ...]);
           span text is emitted post-normalize so the per-row invariant
           (kind, text, media_ref, order) is checked against the final form.
  links  — discovered frontier rows (url/method/form/meta/callback/depth+1)
           for the wave loop's admission stage.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from ..functions.extract import (
    decode_js_object,
    extract_latlng,
    join_genres,
    map_code,
    normalize_tel,
    split_zip_address,
)
from ..stages.normalize import normalize_text

# --- compiled page-structure patterns (synthetic-corpus formats) -----------
_SHOP_DIV = re.compile(r'<div class="shop">(.*?)</div>', re.S)
_H3 = re.compile(r"<h3>(.*?)</h3>", re.S)
_PLACE = re.compile(r'<p class="place">(.*?)</p>', re.S)
_TEL_P = re.compile(r'<p class="tel">(.*?)</p>', re.S)
_GENRE_P = re.compile(r'<p class="genre">(.*?)</p>', re.S)
_MAP_A = re.compile(r'<a class="map" href="([^"]+)"')
_HP_A = re.compile(r'<a class="hp" href="([^"]+)"')
_HOURS = re.compile(r'<p class="hours">営業時間: (.*?)</p>', re.S)
_CLOSED = re.compile(r'<p class="closed">定休日: (.*?)</p>', re.S)
_REL_NEXT = re.compile(r'<a rel="next" href="([^"]+)"')
_JS_PAGER = re.compile(r'href="javascript:on_events\((\d+)\)"')
_DETAIL_A = re.compile(r'<a class="detail" href="([^"]+)">(.*?)</a>', re.S)
_TH_TD = re.compile(r"<tr><th>(.*?)</th><td>(.*?)</td></tr>", re.S)
_IFRAME = re.compile(r'<iframe src="([^"]+)"')
_AREA_H2 = re.compile(r"<h2>\[ (.*?) \]</h2>")
_FILE_A = re.compile(r'<a class="file" href="([^"]+)">(.*?)</a>', re.S)
_TOKEN = re.compile(r'name="_token" value="([^"]+)"')
_PHOTO_IMG = re.compile(r'<img class="photo" src="([^"]+)">')
_JS_DATA = re.compile(r"const data = (\[.*?\]);", re.S)

_EMPTY_ITEM = {
    "shop_name": None,
    "address": None,
    "tel": None,
    "genre_name": None,
    "zip_code": None,
    "official_page": None,
    "opening_hours": None,
    "closing_day": None,
    "area_name": None,
    "detail_page": None,
    "provided_lat": None,
    "provided_lng": None,
}

# fukuoka-style genre code table (reference: fukuoka.py:20-37)
GENRE_CODE_TABLE = ["居酒屋", "寿司", "ラーメン", "カフェ", "焼肉", "定食", "イタリアン", "中華"]


@dataclass
class ParseResult:
    items: list[dict] = field(default_factory=list)
    spans: list[tuple[str, str, str]] = field(default_factory=list)  # (kind, text, media_ref)
    links: list[dict] = field(default_factory=list)  # frontier rows (no depth/url resolution yet)


def _link(url: str, callback: str = "parse", method: str = "GET", form: dict | None = None, meta: dict | None = None) -> dict:
    return {"url": url, "callback": callback, "method": method, "form": form or {}, "meta": meta or {}}


def _build_shop(name, place, tel, genre, map_href, hp, hours, closed, area, photo=None):
    """ONE shop-card builder: raw field strings -> (item, span sub-sequence).
    Both extraction paths (fused single regex + per-field fallback) feed
    this, so the output contract lives in exactly one place."""
    item = dict(_EMPTY_ITEM)
    item["shop_name"] = name
    item["zip_code"], item["address"] = split_zip_address(place)
    item["tel"] = normalize_tel(tel) if tel else None
    item["genre_name"] = join_genres(genre) if genre else None
    item["provided_lat"], item["provided_lng"] = extract_latlng(map_href)
    item["official_page"] = hp
    item["opening_hours"] = hours
    item["closing_day"] = closed
    item["area_name"] = area
    spans: list[tuple[str, str, str]] = [("text", normalize_text(item["shop_name"]) or "", "")]
    if photo:
        spans.append(("image", "", photo))  # interleaved media span (input_hint)
    spans.append(("text", normalize_text(item["address"]) or "", ""))
    spans.append(("text", (item["tel"] or "").strip(), ""))
    if map_href:
        spans.append(("link", "地図", map_href))
    if item["official_page"]:
        spans.append(("link", "HP", item["official_page"]))
    return item, spans


def _parse_shop_div(inner: str, area: str | None = None) -> tuple[dict, list[tuple[str, str, str]]]:
    """Per-field shop-card extractor (general fallback path)."""

    def g(pat):
        m = pat.search(inner)
        return m.group(1) if m else None

    return _build_shop(g(_H3), g(_PLACE), g(_TEL_P), g(_GENRE_P), g(_MAP_A), g(_HP_A), g(_HOURS), g(_CLOSED), area, photo=g(_PHOTO_IMG))


# fused single-pass shop-card pattern (fields in corpus render order;
# optional groups for absent genre/map/hp). One scan ~3x faster than the
# per-field searches in _parse_shop_div, which remains the general path.
_SHOP_FUSED = re.compile(
    r'<div class="shop">\s*<h3>(?P<name>.*?)</h3>\s*'
    r'(?:<img class="photo" src="(?P<photo>[^"]+)">\s*)?'
    r'<p class="place">(?P<place>.*?)</p>\s*'
    r'<p class="tel">(?P<tel>.*?)</p>\s*'
    r'(?:<p class="genre">(?P<genre>.*?)</p>\s*)?'
    r'(?:<a class="map" href="(?P<map>[^"]+)">地図</a>\s*)?'
    r'(?:<a class="hp" href="(?P<hp>[^"]+)">HP</a>\s*)?'
    r'<p class="hours">営業時間: (?P<hours>.*?)</p>\s*'
    r'<p class="closed">定休日: (?P<closed>.*?)</p>\s*</div>',
    re.S,
)


def _shop_div_page(html: str, area: str | None = None) -> ParseResult:
    res = ParseResult()
    fused = list(_SHOP_FUSED.finditer(html))
    n_divs = html.count('<div class="shop">')
    if len(fused) == n_divs:
        for m in fused:
            item, spans = _build_shop(
                m.group("name"), m.group("place"), m.group("tel"), m.group("genre"),
                m.group("map"), m.group("hp"), m.group("hours"), m.group("closed"), area,
                photo=m.group("photo"),
            )
            res.items.append(item)
            res.spans.extend(spans)
        return res
    # general fallback: per-field extraction div by div
    for m in _SHOP_DIV.finditer(html):
        item, spans = _parse_shop_div(m.group(1), area)
        res.items.append(item)
        res.spans.extend(spans)
    return res


# --- family parsers ---------------------------------------------------------


def parse_paginated(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """rel=next chain (reference family: tochigi.py:62-70, osaka.py:84-92)."""
    html = body.decode("utf-8", "replace")
    res = _shop_div_page(html)
    m = _REL_NEXT.search(html)
    if m:
        res.links.append(_link(m.group(1)))
        res.spans.append(("link", "次へ", m.group(1)))
    return res


def parse_pagesynth(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """URL synthesis from javascript: pager (reference: aomori.py:50-58,
    shizuoka.py:49-58 — construct next URL from page counter)."""
    html = body.decode("utf-8", "replace")
    res = _shop_div_page(html)
    m = _JS_PAGER.search(html)
    if m:
        nxt = f"/p/{m.group(1)}"
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def parse_listdetail(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """List page: detail fan-out + next (reference: kyoto.py:24-38)."""
    html = body.decode("utf-8", "replace")
    res = ParseResult()
    for m in _DETAIL_A.finditer(html):
        res.links.append(_link(m.group(1), callback="detail"))
        res.spans.append(("link", normalize_text(m.group(2)) or "", m.group(1)))
    m = _REL_NEXT.search(html)
    if m:
        res.links.append(_link(m.group(1)))
        res.spans.append(("link", "次へ", m.group(1)))
    return res


def parse_listdetail_detail(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Detail page: th-label table extraction (reference: kyoto.py:45-82)."""
    html = body.decode("utf-8", "replace")
    res = ParseResult()
    item = dict(_EMPTY_ITEM)
    labels = {m.group(1): m.group(2) for m in _TH_TD.finditer(html)}
    item["shop_name"] = labels.get("店名")
    item["zip_code"], item["address"] = split_zip_address(labels.get("所在地"))
    item["tel"] = normalize_tel(labels.get("電話番号"))
    item["genre_name"] = join_genres(labels.get("ジャンル"))
    item["opening_hours"] = labels.get("営業時間")
    item["closing_day"] = labels.get("定休日")
    m = _IFRAME.search(html)
    map_href = m.group(1) if m else None
    item["provided_lat"], item["provided_lng"] = extract_latlng(map_href)
    m = _HP_A.search(html)
    item["official_page"] = m.group(1) if m else None
    item["detail_page"] = url
    res.items.append(item)
    res.spans = [
        ("text", normalize_text(item["shop_name"]) or "", ""),
        ("text", normalize_text(item["address"]) or "", ""),
        ("text", (item["tel"] or "").strip(), ""),
    ]
    if map_href:
        res.spans.append(("link", "地図", map_href))
    if item["official_page"]:
        res.spans.append(("link", "公式", item["official_page"]))
    return res


def parse_areafanout(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """POST-area page; area from [ ... ] header (reference: miyagi.py:67-69)."""
    html = body.decode("utf-8", "replace")
    m = _AREA_H2.search(html)
    area = m.group(1) if m else meta.get("area_name")
    return _shop_div_page(html, area=area)


def parse_mesh(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Geo-mesh JSON API `data` array (reference: abstract_liny.py:51-66)."""
    res = ParseResult()
    payload = json.loads(body)
    for row in payload.get("data", []):
        item = dict(_EMPTY_ITEM)
        item["shop_name"] = row.get("name")
        item["address"] = row.get("address")
        item["tel"] = row.get("tel")
        genres = row.get("genre") or []
        item["genre_name"] = "|".join(genres) if genres else None
        lat, lng = row.get("lat"), row.get("lng")
        # JSON floats -> strings (reference keeps all-string items,
        # abstract_liny.py:62-63)
        item["provided_lat"] = None if lat is None else f"{lat}"
        item["provided_lng"] = None if lng is None else f"{lng}"
        res.items.append(item)
        res.spans.append(("text", (item["shop_name"] or "").strip(), ""))
        res.spans.append(("text", (item["address"] or "").strip(), ""))
    return res


def parse_jsonapi(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Positional-array JSON rows (reference: kochi.py:22-39)."""
    res = ParseResult()
    for row in json.loads(body).get("shops", []):
        item = dict(_EMPTY_ITEM)
        item["shop_name"], item["address"], item["tel"] = row[0], row[1], normalize_tel(row[2])
        item["genre_name"] = join_genres(row[3])
        item["opening_hours"], item["closing_day"] = row[4], row[5]
        res.items.append(item)
        res.spans.append(("text", (item["shop_name"] or "").strip(), ""))
        res.spans.append(("text", (item["address"] or "").strip(), ""))
    return res


def parse_jsonhtml(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """JSON-wrapped HTML re-entering the HTML parser; POST-pager stop when
    active == next (reference: yamagata.py:82-84, 115-143)."""
    payload = json.loads(body)
    res = _shop_div_page(payload.get("html", ""))
    pager = payload.get("pager", {})
    if pager and pager.get("active") != pager.get("next"):
        nxt = f"/api/page/{pager['next']}"
        res.links.append(_link(nxt))
        res.spans.append(("link", "次へ", nxt))
    return res


def parse_files_index(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """File-link index page: media spans + typed file fan-out
    (reference file sources: akita.py:18, fukuoka.py:18, nara.py:19,
    tokyo.py:26-31)."""
    html = body.decode("utf-8", "replace")
    res = ParseResult()
    kind_by_ext = {".csv": "csv", ".xlsx": "xlsx", ".pdf": "pdf"}
    for m in _FILE_A.finditer(html):
        href, text = m.group(1), normalize_text(m.group(2)) or ""
        ext = href[href.rfind(".") :]
        kind = kind_by_ext.get(ext, "link")
        callback = {"csv": "file_csv", "xlsx": "file_xlsx", "pdf": "file_pdf"}.get(kind, "parse")
        if href.endswith("_coded.csv"):
            callback = "file_csv_coded"
        res.links.append(_link(href, callback=callback))
        res.spans.append((kind, text, href))
    return res


def parse_file_csv(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Headerless CSV with furigana comment rows + empty-address drop
    (reference: akita.py:29-44 names=, drop rows, comment strip)."""
    res = ParseResult()
    for line in body.decode("utf-8", "replace").splitlines():
        parts = line.split(",")
        if len(parts) < 3:
            continue
        name, addr, tel = parts[0], parts[1], parts[2]
        if not addr.strip():  # furigana/comment rows have empty address
            continue
        item = dict(_EMPTY_ITEM)
        item["shop_name"], item["address"], item["tel"] = name, addr, normalize_tel(tel)
        res.items.append(item)
        res.spans.append(("text", name.strip(), ""))
        res.spans.append(("text", addr.strip(), ""))
    return res


def parse_file_csv_coded(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """CSV with genre int codes -> names (reference: fukuoka.py:47-65)."""
    res = ParseResult()
    lines = body.decode("utf-8", "replace").splitlines()
    for line in lines[1:]:  # header row
        parts = line.split(",")
        if len(parts) < 4:
            continue
        item = dict(_EMPTY_ITEM)
        item["shop_name"], item["address"], item["tel"] = parts[0], parts[1], normalize_tel(parts[2])
        item["genre_name"] = map_code(parts[3], GENRE_CODE_TABLE)
        res.items.append(item)
        res.spans.append(("text", parts[0].strip(), ""))
        res.spans.append(("text", parts[1].strip(), ""))
    return res


def _xlsx_rows_stdlib(body: bytes) -> list[list[str]]:
    """Stdlib .xlsx decode — the container is a zip of XML (ECMA-376
    SpreadsheetML, a public spec), so ``zipfile`` + ``xml.etree`` cover
    the reference's ``dtype=str`` read (nara.py:31) with no openpyxl:
    resolve sheet 'リスト' (else the workbook's first sheet) through
    workbook.xml + its .rels, expand the sharedStrings table, and read
    each row's cells (shared / inline / plain values) as strings, with
    gaps filled from the cell reference column letters.  Malformed zip
    bodies raise ``zipfile.BadZipFile`` — explicit, never silent garbage."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    zf = zipfile.ZipFile(io.BytesIO(body))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {r.get("Id"): r.get("Target") for r in rels.findall(f"{PR}Relationship")}
    sheets = [(s.get("name"), targets[s.get(f"{RNS}id")]) for s in wb.find(f"{NS}sheets")]
    target = next((t for n, t in sheets if n == "リスト"), sheets[0][1])
    target = target.lstrip("/")
    if not target.startswith("xl/"):
        target = "xl/" + target
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sst.findall(f"{NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
    sheet = ET.fromstring(zf.read(target))
    rows: list[list[str]] = []
    for row in sheet.iter(f"{NS}row"):
        cells: list[str] = []
        for c in row.findall(f"{NS}c"):
            col = 0
            for ch in c.get("r") or "":  # 'B3' -> column 2
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            idx = col - 1 if col else len(cells)
            t = c.get("t", "n")
            if t == "inlineStr":
                v = "".join(x.text or "" for x in c.iter(f"{NS}t"))
            else:
                ve = c.find(f"{NS}v")
                v = (ve.text or "") if ve is not None else ""
                if t == "s" and v:
                    v = shared[int(v)]
            while len(cells) < idx:
                cells.append("")
            cells.append(v)
        rows.append(cells)
    # pad ragged rows to the sheet width (openpyxl iter_rows semantics):
    # writers omit trailing empty cells, and a data row narrower than the
    # header would otherwise be silently dropped by column-count guards
    width = max((len(r) for r in rows), default=0)
    for r in rows:
        r.extend([""] * (width - len(r)))
    return rows


def _xlsx_rows_real(body: bytes) -> list[list[str]]:
    """Real .xlsx decode: openpyxl when installed (sheet 'リスト'
    preferred, else active — nara.py:31 semantics), else the stdlib
    zip+XML reader (same sheet preference) — the seam is CLOSED, a real
    zip container always decodes (malformed zips raise BadZipFile).
    Note one divergence on NUMERIC cells: the stdlib path returns the
    stored string ('42'), openpyxl the Python repr ('42.0') — the
    reference reads dtype=str string data, where both paths agree."""
    try:
        import io

        import openpyxl  # noqa: PLC0415
    except ImportError:
        return _xlsx_rows_stdlib(body)
    wb = openpyxl.load_workbook(io.BytesIO(body), read_only=True, data_only=True)
    ws = wb["リスト"] if "リスト" in wb.sheetnames else wb.active
    return [["" if c is None else str(c) for c in row] for row in ws.iter_rows(values_only=True)]


def parse_file_xlsx(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """XLSX sheet parse (nara.py:31: sheet 'リスト', dtype=str).  Codec
    SEAM: a real zip-container body decodes via openpyxl when installed;
    the page store's deterministic TSV fake (FAKE-XLSX marker) keeps the
    plumbing testable without the codec; a real body without a codec is an
    explicit NotImplementedError, never silent garbage."""
    res = ParseResult()

    def add(parts: list[str]):
        if len(parts) < 3:
            return
        item = dict(_EMPTY_ITEM)
        item["shop_name"], item["address"], item["tel"] = parts[0], parts[1], normalize_tel(parts[2])
        res.items.append(item)
        res.spans.append(("text", parts[0].strip(), ""))
        res.spans.append(("text", parts[1].strip(), ""))

    if body[:2] == b"PK":  # real xlsx (zip container)
        for parts in _xlsx_rows_real(body)[1:]:  # header row
            add(parts)
        return res
    lines = body.decode("utf-8", "replace").splitlines()
    if not lines or not lines[0].startswith("FAKE-XLSX"):
        raise NotImplementedError("unrecognized xlsx body (neither real zip nor FAKE-XLSX fixture)")
    for line in lines[1:]:
        add(line.split("\t"))
    return res


def _pdf_content_texts(stream: bytes) -> list[tuple[float, float, str]]:
    """Extract positioned text runs ``(y, x, text)`` from ONE decoded PDF
    content stream — the ISO 32000 text-object subset that table PDFs
    use: ``BT``/``ET`` blocks, ``Tm``/``Td``/``TD``/``T*``/``TL``
    positioning, ``Tj``/``'``/``TJ`` show ops, literal ``(…)`` strings
    (escape-aware) and ``<…>`` hex strings.  Glyph advance widths need
    font metrics we don't have, so each SHOW op is one run at the
    CURRENT text position — exactly what positional table
    reconstruction needs (cells are separate show ops)."""
    runs: list[tuple[float, float, str]] = []
    stack: list = []
    x = y = lx = ly = 0.0
    leading = 0.0
    i, n = 0, len(stream)

    def _lit_string(j: int) -> tuple[str, int]:
        out, depth = bytearray(), 1
        j += 1
        while j < n and depth:
            c = stream[j]
            if c == 0x5C and j + 1 < n:  # backslash escape
                nxt = stream[j + 1]
                out.append({0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09}.get(nxt, nxt))
                j += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if not depth:
                    j += 1
                    break
            out.append(c)
            j += 1
        return out.decode("utf-8", "replace"), j

    while i < n:
        c = stream[i]
        if c in b" \t\r\n":
            i += 1
        elif c == 0x28:  # ( literal string
            s, i = _lit_string(i)
            stack.append(s)
        elif c == 0x3C:  # < hex string
            j = stream.index(b">", i)
            hx = bytes(ch for ch in stream[i + 1 : j] if ch not in b" \t\r\n")
            if len(hx) % 2:
                hx += b"0"
            stack.append(bytes.fromhex(hx.decode("ascii", "replace")).decode("utf-8", "replace"))
            i = j + 1
        elif c == 0x5B:  # [ array — flatten; TJ pops the pieces it finds
            stack.append("[")
            i += 1
        elif c == 0x5D:
            i += 1
        elif c == 0x2F:  # /Name
            j = i + 1
            while j < n and stream[j] not in b" \t\r\n[]()<>/":
                j += 1
            stack.append(stream[i:j].decode("latin-1"))
            i = j
        else:
            j = i
            while j < n and stream[j] not in b" \t\r\n[]()<>/":
                j += 1
            tok = stream[i:j].decode("latin-1")
            i = j
            try:
                stack.append(float(tok))
                continue
            except ValueError:
                pass
            if tok == "Tm" and len(stack) >= 6:
                x = lx = float(stack[-2])
                y = ly = float(stack[-1])
            elif tok in ("Td", "TD") and len(stack) >= 2:
                tx, ty = float(stack[-2]), float(stack[-1])
                if tok == "TD":
                    leading = -ty
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
            elif tok == "TL" and stack:
                leading = float(stack[-1])
            elif tok == "T*":
                ly -= leading
                x, y = lx, ly
            elif tok in ("Tj", "'"):
                if tok == "'":
                    ly -= leading
                    x, y = lx, ly
                s = next((v for v in reversed(stack) if isinstance(v, str) and v != "["), "")
                if s:
                    runs.append((y, x, s))
            elif tok == "TJ":
                # array show: concatenate the string pieces back to the
                # matching '[' (kerning numbers are advance tweaks only)
                parts: list[str] = []
                while stack:
                    v = stack.pop()
                    if v == "[":
                        break
                    if isinstance(v, str):
                        parts.append(v)
                s = "".join(reversed(parts))
                if s:
                    runs.append((y, x, s))
            elif tok == "BT":
                x = y = lx = ly = 0.0
            stack.clear()
    return runs


def _pdf_pages_stdlib(body: bytes) -> list[str]:
    """Stdlib .pdf table extraction — no pdfplumber/tabula: scan the
    object table (``N G obj … endobj``), follow the ``/Pages`` tree's
    ``/Kids`` for page ORDER, pull each page's ``/Contents`` stream(s)
    (zlib inflates ``/FlateDecode`` — the only filter table writers
    use), extract positioned text runs, then reconstruct the table the
    way pdfplumber's word-clustering does: cluster run y's into rows
    (tolerance 3 units), sort each row's cells by x, join with commas.
    A ``%PDF`` body with no parsable page raises ``ValueError`` —
    explicit, never silent garbage."""
    import zlib

    objs: dict[int, bytes] = {}
    for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", body, re.S):
        objs[int(m.group(1))] = m.group(2)

    def dict_of(raw: bytes) -> bytes:
        s = raw.find(b"<<")
        return raw[s:] if s >= 0 else b""

    def stream_of(raw: bytes) -> bytes | None:
        m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", raw, re.S)
        if not m:
            return None
        data = m.group(1)
        if b"/FlateDecode" in dict_of(raw):
            data = zlib.decompress(data)
        return data

    # page order: the catalog's /Pages tree, depth-first over /Kids
    page_ids: list[int] = []

    def walk(num: int, seen: frozenset = frozenset()):
        if num in seen or num not in objs:
            return
        d = objs[num]
        if re.search(rb"/Type\s*/Pages\b", d):
            kids = re.search(rb"/Kids\s*\[(.*?)\]", d, re.S)
            for km in re.finditer(rb"(\d+)\s+\d+\s+R", kids.group(1) if kids else b""):
                walk(int(km.group(1)), seen | {num})
        elif re.search(rb"/Type\s*/Page\b", d):
            page_ids.append(num)

    root = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", body)
    cat = objs.get(int(root.group(1)), b"") if root else b""
    pm = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", cat)
    if pm:
        walk(int(pm.group(1)))
    if not page_ids:  # fallback: object-order scan
        page_ids = [k for k, v in sorted(objs.items()) if re.search(rb"/Type\s*/Page\b", v)]
    if not page_ids:
        raise ValueError("pdf: no page objects found (unsupported container layout)")

    pages: list[str] = []
    for pid in page_ids:
        d = objs[pid]
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", d) or re.search(rb"/Contents\s*\[(.*?)\]", d, re.S)
        refs = [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", cm.group(1))] if cm and b"[" in cm.group(0) else (
            [int(cm.group(1))] if cm else []
        )
        content = b"\n".join(s for r in refs if (s := stream_of(objs.get(r, b""))) is not None)
        runs = _pdf_content_texts(content)
        runs.sort(key=lambda r: (-r[0], r[1]))
        # column-aware reconstruction (pdfplumber's text-vertical
        # strategy): cluster x starts page-wide into columns so an EMPTY
        # cell stays an empty CSV field instead of shifting its row left
        xs: list[float] = []
        for _, rx, _ in sorted(runs, key=lambda r: r[1]):
            if not xs or rx - xs[-1] > 5.0:
                xs.append(rx)
        rows: list[list[str]] = []
        cur_y = None
        for ry, rx, txt in runs:
            if cur_y is None or abs(ry - cur_y) > 3.0:
                rows.append([""] * len(xs))
                cur_y = ry
            col = min(range(len(xs)), key=lambda k: abs(xs[k] - rx))
            rows[-1][col] = (rows[-1][col] + txt) if rows[-1][col] else txt
        pages.append("\n".join(",".join(r) for r in rows))
    return pages


def _pdf_pages_real(body: bytes) -> list[str]:
    """Real PDF table extraction: pdfplumber when installed (the
    reference uses tabula+JVM, tokyo.py:50-63 — neither is in this
    container), else the stdlib object-scan + content-stream extractor
    — the seam is CLOSED, a real %PDF body always decodes (a container
    with no parsable page raises ValueError, never silent garbage)."""
    try:
        import io

        import pdfplumber  # noqa: PLC0415
    except ImportError:
        return _pdf_pages_stdlib(body)
    pages = []
    with pdfplumber.open(io.BytesIO(body)) as pdf:
        for page in pdf.pages:
            tbl = page.extract_table() or []
            pages.append("\n".join(",".join("" if c is None else str(c) for c in row) for row in tbl))
    return pages


def parse_file_pdf(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """PDF table parse with per-page fan-out + df repair (tokyo.py:50-98).
    Codec seam CLOSED: a real %PDF body decodes via pdfplumber when
    installed, else the stdlib object-scan extractor (zlib inflates
    FlateDecode); a container with no parsable page raises ValueError —
    explicit, never silent garbage.  The page store's form-feed CSV fake
    keeps the engine plumbing exercised on the deterministic corpus."""
    res = ParseResult()
    if body[:5] == b"%PDF-":  # real pdf container
        text = "\f".join(_pdf_pages_real(body))
    else:
        text = body.decode("utf-8", "replace")
    for page in text.split("\f"):
        lines = page.splitlines()
        for line in lines[1:]:  # header row per page (tokyo.py:84-89)
            parts = line.split(",")
            if len(parts) < 3 or not parts[1].strip():
                continue
            item = dict(_EMPTY_ITEM)
            item["shop_name"], item["address"], item["tel"] = parts[0], parts[1], normalize_tel(parts[2])
            res.items.append(item)
            res.spans.append(("text", parts[0].strip(), ""))
            res.spans.append(("text", parts[1].strip(), ""))
    return res


def parse_scripted(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Session/CSRF handshake + paged search (reference: hokkaido.py:44-104):
    first response carries the token form; follow-ups are shop pages."""
    html = body.decode("utf-8", "replace")
    m = _TOKEN.search(html)
    if m:
        token = m.group(1)
        res = ParseResult()
        res.links.append(_link(f"/search?page=1&_token={token}", meta={"_token": token}))
        return res
    res = _shop_div_page(html)
    m = _REL_NEXT.search(html)
    if m:
        res.links.append(_link(m.group(1), meta=dict(meta)))
        res.spans.append(("link", "次へ", m.group(1)))
    return res


# niigata-style area list: tags in this set classify as area_name, all
# others as genre_name (reference: niigata.py:19-57 — a per-prefecture
# class-attribute list; broadcast small constant per SURVEY §2.3)
TAGCLASS_AREA_LIST = frozenset({"新潟市", "長岡市", "上越市", "佐渡市", "村上市", "燕市"})
_TAG_P = re.compile(r'<p class="tag">(.*?)</p>', re.S)


def parse_tagclass(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Tag classification family (reference: niigata.py:78-89 — single tag
    is EITHER an area or a genre, decided by membership in the area list;
    osaka.py:59-68 and yamagata.py:102-111 share the shape)."""
    from ..functions.extract import classify_tag

    html = body.decode("utf-8", "replace")
    res = ParseResult()
    for dm in _SHOP_DIV.finditer(html):
        inner = dm.group(1)

        def g(pat):
            m = pat.search(inner)
            return m.group(1) if m else None

        item, spans = _build_shop(g(_H3), g(_PLACE), g(_TEL_P), None, None, None, None, None, None)
        item["area_name"], item["genre_name"] = classify_tag(g(_TAG_P), TAGCLASS_AREA_LIST)
        res.items.append(item)
        res.spans.append(("text", normalize_text(item["shop_name"]) or "", ""))
        res.spans.append(("text", normalize_text(item["address"]) or "", ""))
    return res


def parse_browser(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """Rendered infinite-scroll DOM -> shop items (reference: oita.py:49-72
    lxml over the playwright-dumped HTML); no links (single-page app)."""
    return _shop_div_page(body.decode("utf-8", "replace"))


def parse_jsmap(url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    """The reference's ONE real join — miyagi html⋈js (miyagi.py:71-119):
    per page, decode the JS marker array (non-JSON literal, demjson-style
    tolerant decode) as the small side, then for each HTML-listed shop find
    markers where shop_name is EQUAL and the item address is a SUBSTRING of
    the marker address (miyagi.py:107-111); exactly one match -> copy
    lat/lng (miyagi.py:113-115); zero or several -> leave null
    (miyagi.py:116-119).  Left outer, per-row map_batches computation — no
    shuffle, both sides come from the same page (SURVEY.md §2.6)."""
    html = body.decode("utf-8", "replace")
    res = ParseResult()
    m = _JS_DATA.search(html)
    markers = decode_js_object(m.group(1)) if m else []
    for dm in _SHOP_DIV.finditer(html):
        inner = dm.group(1)
        item = dict(_EMPTY_ITEM)
        h = _H3.search(inner)
        item["shop_name"] = h.group(1) if h else None
        pm = _PLACE.search(inner)
        item["zip_code"], item["address"] = split_zip_address(pm.group(1) if pm else None)
        tm = _TEL_P.search(inner)
        item["tel"] = normalize_tel(tm.group(1)) if tm else None
        clean_name = normalize_text(item["shop_name"]) or ""
        clean_addr = normalize_text(item["address"]) or ""
        matches = [mk for mk in markers if mk.get("name") == clean_name and clean_addr and clean_addr in (mk.get("address") or "")]
        if len(matches) == 1:
            item["provided_lat"] = f"{matches[0]['lat']}"
            item["provided_lng"] = f"{matches[0]['lng']}"
        res.items.append(item)
        res.spans.append(("text", clean_name, ""))
        res.spans.append(("text", clean_addr, ""))
    return res


# --- registry + dispatch ----------------------------------------------------

PARSERS: dict[tuple[str, str], callable] = {
    ("paginated", "parse"): parse_paginated,
    ("pagesynth", "parse"): parse_pagesynth,
    ("listdetail", "parse"): parse_listdetail,
    ("listdetail", "detail"): parse_listdetail_detail,
    ("areafanout", "parse"): parse_areafanout,
    ("mesh", "parse"): parse_mesh,
    ("jsonapi", "parse"): parse_jsonapi,
    ("jsmap", "parse"): parse_jsmap,
    ("browser", "parse"): parse_browser,
    ("tagclass", "parse"): parse_tagclass,
    ("jsonhtml", "parse"): parse_jsonhtml,
    ("filetab", "parse"): parse_files_index,
    ("filetab", "file_csv"): parse_file_csv,
    ("filetab", "file_csv_coded"): parse_file_csv_coded,
    ("filetab", "file_xlsx"): parse_file_xlsx,
    ("filetab", "file_pdf"): parse_file_pdf,
    ("scripted", "parse"): parse_scripted,
}


def family_of(prefecture: str) -> str:
    """paginated3 -> paginated; names map 1:1 to parser families."""
    return prefecture.rstrip("0123456789")


def parse_page(prefecture: str, callback: str, url: str, body: bytes, meta: dict, depth: int) -> ParseResult:
    fn = PARSERS.get((family_of(prefecture), callback))
    if fn is None:
        return ParseResult()
    return fn(url, body, meta, depth)
