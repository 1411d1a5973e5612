"""Golden parser-parity tests (SURVEY.md §5, FIXTURES.md §3-4).

For EVERY page reachable from the golden-scale seed list: run the family
parser + the global normalize stage and compare against the page store's
independently-derived ground truth — flat ShopItem rows AND the per-row
span-sequence invariant (kind, text, media_ref, order) from BASELINE.json.
"""

import pyarrow as pa
import pytest

from goto_eater_crawler_ray.sources.pagestore import PageStore, ScaleSpec
from goto_eater_crawler_ray.stages.normalize import normalize_batch, normalize_text
from goto_eater_crawler_ray.stages.parse import parse_page

ITEM_COLS = [
    "shop_name",
    "address",
    "tel",
    "genre_name",
    "zip_code",
    "official_page",
    "opening_hours",
    "closing_day",
    "area_name",
    "detail_page",
    "provided_lat",
    "provided_lng",
]


def _body_of(store, url, method, form, meta):
    """Fetch-layer behavior for tests: browser rows get the RENDERED DOM."""
    if meta.get("fetch_kind") == "browser":
        from goto_eater_crawler_ray.stages.fetch import SimBrowser

        return SimBrowser(store.spec).render(url)
    return store.get(url, method, form).body


def _crawl_closure(store):
    """(prefecture, callback, url, method, form) for every reachable page."""
    from collections import deque
    from urllib.parse import urlencode, urljoin

    out, seen = [], set()
    q = deque()
    for s in store.seeds():
        if s["url"].startswith("http://blocked."):
            continue
        q.append((s["prefecture"], s["callback"], s["url"], s["method"], tuple(sorted(s["form"].items())), s["meta"]))
    while q:
        pref, cb, url, method, form, meta = q.popleft()
        key = (url, method, form)
        if key in seen:
            continue
        seen.add(key)
        out.append((pref, cb, url, method, dict(form), meta))
        body = _body_of(store, url, method, dict(form), meta)
        res = parse_page(pref, cb, url, body, dict(meta), 0)
        for link in res.links:
            q.append((pref, link["callback"], urljoin(url, link["url"]), link["method"], tuple(sorted(link["form"].items())), link["meta"]))
    return out


@pytest.fixture(scope="module")
def store():
    return PageStore(ScaleSpec.golden())


@pytest.fixture(scope="module")
def closure(store):
    return _crawl_closure(store)


def _normalize_items(raw_items, prefecture, url):
    rows = []
    for r, it in enumerate(raw_items):
        row = dict(it)
        row["prefecture"] = prefecture
        row["source_url"] = url
        row["row_in_page"] = r
        rows.append(row)
    if not rows:
        return []
    schema = pa.schema([(c, pa.string()) for c in ITEM_COLS] + [("prefecture", pa.string()), ("source_url", pa.string()), ("row_in_page", pa.int32())])
    from goto_eater_crawler_ray.functions.overrides import apply_overrides

    tbl = pa.Table.from_pylist(rows, schema=schema)
    return normalize_batch(apply_overrides(tbl)).to_pylist()


def test_closure_covers_every_family(closure, store):
    families = {p for p, *_ in closure}
    for fam in ["paginated0", "pagesynth", "listdetail0", "areafanout", "mesh", "jsonapi", "jsmap", "browser", "tagclass", "jsonhtml", "filetab", "scripted"]:
        assert fam in families, f"family {fam} unreachable"
    # blocked host never enters the closure
    assert not any("blocked" in u for _, _, u, _, _, _ in closure)
    assert len(closure) == len(store.expected_reachable())


def test_golden_items_and_spans(closure, store):
    n_items = n_spans = 0
    for pref, cb, url, method, form, meta in closure:
        body = _body_of(store, url, method, form, meta)
        res = parse_page(pref, cb, url, body, dict(meta), 0)
        got_items = _normalize_items(res.items, pref, url)
        exp_items, exp_spans = store.expected_parse(pref, cb, url, method, form)
        assert len(got_items) == len(exp_items), f"{url}: item count {len(got_items)} != {len(exp_items)}"
        for g, e in zip(got_items, exp_items):
            for col in ITEM_COLS:
                assert g[col] == e[col], f"{url} row {g['row_in_page']} col {col}: {g[col]!r} != {e[col]!r}"
        # span-sequence equality (kind, text, media_ref, order) — the
        # BASELINE.json per-row invariant
        got_spans = [(k, t, m) for (k, t, m) in res.spans]
        assert got_spans == exp_spans, f"{url}: span sequence mismatch\n got={got_spans[:6]}\n exp={exp_spans[:6]}"
        n_items += len(got_items)
        n_spans += len(got_spans)
    assert n_items > 100, "golden corpus too small to be meaningful"
    assert n_spans > 300


def test_normalize_reference_vector():
    # verbatim reference unit vector (pipelines.py:53-54)
    assert normalize_text("山下<br>町12-12\r\n  一二三ビル1F") == "山下町12-12  一二三ビル1F"


def test_normalize_batch_strip_fields():
    tbl = pa.table(
        {
            "shop_name": ["  店<br>名\r\nA  "],
            "tel": ["  012-345-6789 "],
            "genre_name": [" 寿司|カフェ "],
            "address": ["住所<b>X</b>"],
        }
    )
    out = normalize_batch(tbl).to_pylist()[0]
    assert out["shop_name"] == "店名A"
    assert out["tel"] == "012-345-6789"
    assert out["genre_name"] == "寿司|カフェ"
    assert out["address"] == "住所X"


def test_retryable_failures_deterministic(store):
    p1 = store.get("http://paginated0.example.jp/list?page=1")
    p2 = store.get("http://paginated0.example.jp/list?page=1")
    assert p1.body == p2.body
    assert p1.retryable_failures == p2.retryable_failures
    assert p1.latency_ms == p2.latency_ms


def _build_real_xlsx(sheet_name: str, rows, sparse: bool = False) -> bytes:
    """Minimal REAL xlsx container (ECMA-376 SpreadsheetML) built with
    stdlib zipfile: workbook + rels + sharedStrings + one sheet.  With
    ``sparse=True``, None cells are omitted (the reader must gap-fill
    from cell references), the first data cell uses an inline string,
    and digit strings are written as numeric cells."""
    import io
    import zipfile

    shared: list[str] = []

    def sref(s: str) -> int:
        if s not in shared:
            shared.append(s)
        return shared.index(s)

    def colletter(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    xml_rows = []
    for ri, row in enumerate(rows, 1):
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{colletter(ci)}{ri}"
            if sparse and isinstance(v, str) and v.isdigit():
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')  # numeric cell
            elif sparse and ri > 1 and ci == 0:
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>')
            else:
                cells.append(f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>')
        xml_rows.append(f'<row r="{ri}">' + "".join(cells) + "</row>")

    M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    P = "http://schemas.openxmlformats.org/package/2006/relationships"
    workbook = (
        f'<workbook xmlns="{M}" xmlns:r="{R}"><sheets>'
        f'<sheet name="{sheet_name}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        f'<Relationships xmlns="{P}">'
        f'<Relationship Id="rId1" Type="{R}/worksheet" Target="worksheets/sheet1.xml"/>'
        f"</Relationships>"
    )
    sst = f'<sst xmlns="{M}" count="{len(shared)}" uniqueCount="{len(shared)}">' + "".join(
        f"<si><t>{s}</t></si>" for s in shared
    ) + "</sst>"
    sheet = f'<worksheet xmlns="{M}"><sheetData>' + "".join(xml_rows) + "</sheetData></worksheet>"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def _build_real_pdf(pages: list[list[list[str]]], compress: bool = True) -> bytes:
    """Minimal REAL PDF (ISO 32000 subset) built with stdlib only: a
    catalog → /Pages tree → one /Page + content stream per page, correct
    xref table and trailer.  Each table cell is one positioned show op —
    row 0 is placed with ``Tm``, later rows step down with ``Td``/``T*``,
    and alternating cells use ``Tj`` literal strings (with an escaped
    paren), ``TJ`` kerned arrays, and ``<hex>`` strings so the reader's
    whole operator surface is exercised.  ``compress=True`` FlateDecodes
    the content streams (what real writers emit)."""
    import zlib

    n_pages = len(pages)
    objs: list[bytes] = []
    kid_ids = [3 + 2 * i for i in range(n_pages)]
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    kids = " ".join(f"{k} 0 R" for k in kid_ids)
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())  # 2

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    for i, rows in enumerate(pages):
        content = ["BT", "/F1 10 Tf", "14 TL"]
        for ri, row in enumerate(rows):
            # row start: absolute Tm; within the row: relative Td steps
            content.append(f"1 0 0 1 50 {760 - 20 * ri} Tm")
            for ci, cell in enumerate(row):
                if ci:
                    content.append("170 0 Td")
                style = (ri + ci) % 3
                if style == 0:
                    content.append(f"({esc(cell)}) Tj")
                elif style == 1:
                    mid = max(1, len(cell) // 2)
                    content.append(f"[({esc(cell[:mid])}) -120 ({esc(cell[mid:])})] TJ")
                else:
                    content.append(f"<{cell.encode('utf-8').hex()}> Tj")
        content.append("ET")
        data = "\n".join(content).encode()
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b" /Filter /FlateDecode"
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents {kid_ids[i] + 1} 0 R >>".encode()
        )
        objs.append(b"<< /Length " + str(len(data)).encode() + filt + b" >>\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


def _build_real_png(pixels, color_type: int = 2, filters=(0,), palette=None) -> bytes:
    """Minimal REAL PNG built with stdlib only (struct chunks + zlib +
    correct CRCs): applies the GIVEN scanline filter per row (cycling
    ``filters``), so the decoder's whole unfilter surface — None/Sub/Up/
    Average/Paeth — is exercised with exact-pixel round-trips.
    ``pixels`` is uint8 ``[h, w, spp]``; ``color_type`` 0/2/3/4/6 with
    spp 1/3/1/2/4 (type 3 needs ``palette`` [n, 3])."""
    import struct
    import zlib

    import numpy as np

    h, w, spp = pixels.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", zlib.crc32(ctype + data))

    raw = bytearray()
    prev = np.zeros(w * spp, np.int32)
    for y in range(h):
        cur = pixels[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        out = np.zeros(w * spp, np.int32)
        for x in range(w * spp):
            a = cur[x - spp] if x >= spp else 0
            b = prev[x]
            c = prev[x - spp] if x >= spp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            out[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw += out.astype(np.uint8).tobytes()
        prev = cur
    body = b"\x89PNG\r\n\x1a\n"
    body += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        body += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body += chunk(b"IDAT", zlib.compress(bytes(raw)))
    body += chunk(b"IEND", b"")
    return body


class TestCodecSeams:
    """The xlsx/pdf/image codec seams: deterministic fakes keep plumbing
    testable in this container; REAL bodies either decode through the real
    library (conditional tests, skipped when absent) or raise an explicit
    NotImplementedError — never silent garbage."""

    def test_malformed_xlsx_zip_raises_explicitly(self):
        import zipfile

        from goto_eater_crawler_ray.stages.parse import parse_file_xlsx

        with pytest.raises((NotImplementedError, zipfile.BadZipFile)):
            parse_file_xlsx("u", b"PK\x03\x04 not really a sheet", {}, 0)

    def test_malformed_pdf_raises_explicitly(self):
        # a %PDF header with no parsable page object is an explicit
        # error (the xlsx BadZipFile pattern), never silent garbage
        from goto_eater_crawler_ray.stages.parse import parse_file_pdf

        try:
            import pdfplumber  # noqa: F401

            pytest.skip("pdfplumber installed; the stdlib branch is shadowed")
        except ImportError:
            pass
        with pytest.raises(ValueError, match="pdf"):
            parse_file_pdf("u", b"%PDF-1.7 fake", {}, 0)

    def test_real_pdf_decode_stdlib(self):
        # a REAL multi-page PDF built with stdlib (correct xref,
        # FlateDecode streams, Tm/Td positioning, Tj / kerned-TJ / hex
        # show ops, escaped parens) decodes through the stdlib seam
        # with no pdfplumber — the seam is CLOSED
        from goto_eater_crawler_ray.stages.parse import parse_file_pdf

        body = _build_real_pdf(
            [
                [
                    ["店名", "住所", "電話"],
                    ["店(P)A", "東京都港区1-1", "03-0000-0001"],
                    ["店B", "東京都北区2-2", "03-0000-0002"],
                ],
                [
                    ["店名", "住所", "電話"],
                    ["店C", "東京都台東区3-3", "03-0000-0003"],
                ],
            ]
        )
        res = parse_file_pdf("u", body, {}, 0)
        assert [it["shop_name"] for it in res.items] == ["店(P)A", "店B", "店C"]
        assert res.items[0]["address"] == "東京都港区1-1"
        assert res.items[2]["tel"] == "03-0000-0003"

    def test_real_pdf_decode_stdlib_uncompressed(self):
        # same container with raw (no /Filter) streams — both branches
        # of the stream decoder are real
        from goto_eater_crawler_ray.stages.parse import _pdf_pages_stdlib

        body = _build_real_pdf([[["h1", "h2"], ["a", "b"]]], compress=False)
        assert _pdf_pages_stdlib(body) == ["h1,h2\na,b"]

    def test_real_xlsx_decode_stdlib(self):
        # a REAL xlsx container built with zipfile in the test (ECMA-376
        # minimum: workbook + rels + sharedStrings + one sheet) decodes
        # through the stdlib seam with no openpyxl — the seam is CLOSED
        from goto_eater_crawler_ray.stages.parse import parse_file_xlsx

        body = _build_real_xlsx(
            "リスト",
            # second row: writer omits the trailing empty tel cell — the
            # reader must pad to sheet width (openpyxl iter_rows semantics)
            # or the 3-column guard silently drops the shop
            [["店名", "住所", "電話"], ["店A", "奈良市1-1", "0742-00-0001"], ["店B", "奈良市2-2"]],
        )
        res = parse_file_xlsx("u", body, {}, 0)
        assert len(res.items) == 2
        assert res.items[0]["shop_name"] == "店A"
        assert res.items[0]["address"] == "奈良市1-1"
        assert res.items[1]["shop_name"] == "店B"

    def test_real_xlsx_decode_matches_openpyxl_when_present(self):
        openpyxl = pytest.importorskip("openpyxl")
        import io

        from goto_eater_crawler_ray.stages.parse import _xlsx_rows_stdlib

        wb = openpyxl.Workbook()
        ws = wb.active
        ws.title = "リスト"
        ws.append(["店名", "住所", "電話"])
        ws.append(["店A", "奈良市1-1", "0742-00-0001"])
        buf = io.BytesIO()
        wb.save(buf)
        assert _xlsx_rows_stdlib(buf.getvalue())[:2] == [
            ["店名", "住所", "電話"],
            ["店A", "奈良市1-1", "0742-00-0001"],
        ]

    def test_stdlib_xlsx_gap_fill_and_inline_strings(self):
        # sparse cells (B skipped), inline strings, and numeric cells all
        # land as gap-filled strings — the dtype=str contract (nara.py:31)
        from goto_eater_crawler_ray.stages.parse import _xlsx_rows_stdlib

        body = _build_real_xlsx(
            "リスト",
            [["h1", "h2", "h3"], ["a", None, "42"]],
            sparse=True,
        )
        rows = _xlsx_rows_stdlib(body)
        assert rows == [["h1", "h2", "h3"], ["a", "", "42"]]

    def test_real_image_decode_when_codec_present(self):
        PIL = pytest.importorskip("PIL")  # noqa: F841
        import io

        from PIL import Image

        from goto_eater_crawler_ray.functions.multimodal import DecodeImage

        buf = io.BytesIO()
        Image.new("RGB", (17, 9)).save(buf, format="PNG")
        out = DecodeImage()(pa.table({"doc_id": ["d1"], "media_bytes": [buf.getvalue()]}))
        assert out.column("width")[0].as_py() == 17
        assert out.column("height")[0].as_py() == 9

    def test_real_png_decode_stdlib(self):
        # a REAL PNG built with stdlib (struct chunks + zlib + one of EACH
        # of the five scanline filters) decodes to the EXACT pixels with
        # no Pillow — the image seam is CLOSED for PNG
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import DecodeImage, png_decode_stdlib

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
        body = _build_real_png(px, filters=[0, 1, 2, 3, 4])
        w, h, mode, got = png_decode_stdlib(body)
        assert (w, h, mode) == (6, 5, "RGB")
        assert np.array_equal(got, px)
        out = DecodeImage()(pa.table({"doc_id": ["d1"], "media_bytes": [body]}))
        assert out.to_pylist()[0] == {"doc_id": "d1", "width": 6, "height": 5, "mode": "RGB"}

    def test_real_png_decode_stdlib_variants(self):
        # grayscale, RGBA, and palette containers through the same seam
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import png_decode_stdlib

        gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
        w, h, mode, got = png_decode_stdlib(_build_real_png(gray, color_type=0, filters=[4, 1, 3]))
        assert (w, h, mode) == (4, 3, "L") and np.array_equal(got, gray)

        rgba = np.arange(48, dtype=np.uint8).reshape(3, 4, 4)
        w, h, mode, got = png_decode_stdlib(_build_real_png(rgba, color_type=6, filters=[2, 4, 0]))
        assert (w, h, mode) == (4, 3, "RGBA") and np.array_equal(got, rgba)

        palette = np.array([[10, 20, 30], [200, 100, 0]], np.uint8)
        idx = np.array([[0, 1], [1, 0]], np.uint8)[:, :, None]
        w, h, mode, got = png_decode_stdlib(_build_real_png(idx, color_type=3, filters=[1, 2], palette=palette))
        assert (w, h, mode) == (2, 2, "P")
        assert np.array_equal(got, palette[idx[:, :, 0]])  # indices resolved through PLTE

    def test_malformed_png_raises_explicitly(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import png_decode_stdlib

        with pytest.raises(ValueError, match="png"):
            png_decode_stdlib(b"\x89PNG\r\n\x1a\n garbage")
        # unsupported variant (16-bit) is explicit, never silent garbage
        body = bytearray(_build_real_png(np.zeros((1, 1, 3), np.uint8), filters=[0]))
        body[24] = 16  # IHDR bit-depth byte
        with pytest.raises(ValueError, match="unsupported"):
            png_decode_stdlib(bytes(body))


def _gif_lzw_compress(indices, mcs: int) -> bytes:
    """Spec-conformant GIF LZW compressor (test-side encoder): emits an
    initial clear code, grows code width at dictionary size 2^width,
    and terminates with EOI — so the decoder is exercised on a REAL
    variable-width stream, not a hand-picked one."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for i in indices:
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            # decoder grows width when its table REACHES 2^width
            width += 1
        cur = bytes([i])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _build_real_gif(indices, palette, mcs: int = 2, version=b"GIF89a", gce: bool = True) -> bytes:
    """Minimal REAL GIF built with stdlib only: header + logical screen
    descriptor + global color table + (optional) graphic control
    extension + image descriptor + LZW sub-blocks + trailer."""
    import struct

    h, w = indices.shape
    n = len(palette)
    size_field = max((n - 1).bit_length() - 1, 0)
    body = bytearray()
    body += version
    body += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * ((2 << size_field) - n))
    body += pal
    if gce:  # a skippable extension block before the image
        body += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    body += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    body += bytes([mcs])
    data = _gif_lzw_compress(indices.reshape(-1).tolist(), mcs)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        body += bytes([len(chunk)]) + chunk
    body += b"\x00\x3b"
    return bytes(body)


def _build_real_bmp(px, top_down: bool = False) -> bytes:
    """Minimal REAL BMP (BITMAPINFOHEADER, BI_RGB, 24/32 bpp) built with
    stdlib only: BGR(A) samples, 4-byte row alignment, bottom-up rows
    unless ``top_down``."""
    import struct

    h, w, spp = px.shape
    stride = (w * spp + 3) & ~3
    rows = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        line = bytearray()
        for x in range(w):
            p = px[y, x]
            line += bytes([p[2], p[1], p[0]]) + (bytes([p[3]]) if spp == 4 else b"")
        line += b"\x00" * (stride - len(line))
        rows += line
    data_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", data_off + len(rows), 0, 0, data_off)
    dib = struct.pack("<IiihHIIiiII", 40, w, (-h if top_down else h), 1, spp * 8, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + bytes(rows)


class TestGifBmpSeams:
    def test_real_gif_decode_stdlib(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import DecodeImage, gif_decode_stdlib

        rng = np.random.default_rng(11)
        palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = rng.integers(0, 4, (7, 11), dtype=np.uint8)
        body = _build_real_gif(idx, palette)
        w, h, mode, got = gif_decode_stdlib(body)
        assert (w, h, mode) == (11, 7, "P")
        assert np.array_equal(got, palette[idx])
        out = DecodeImage()(pa.table({"doc_id": ["g"], "media_bytes": [body]}))
        assert out.to_pylist()[0] == {"doc_id": "g", "width": 11, "height": 7, "mode": "P"}

    def test_gif_width_growth_and_gif87a(self):
        # >2^(mcs+1) dictionary entries force a code-width growth mid-stream
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import gif_decode_stdlib

        rng = np.random.default_rng(13)
        palette = np.array([[i, 2 * i, 3 * i] for i in range(16)], np.uint8)
        idx = rng.integers(0, 16, (23, 31), dtype=np.uint8)
        body = _build_real_gif(idx, palette, mcs=4, version=b"GIF87a", gce=False)
        w, h, mode, got = gif_decode_stdlib(body)
        assert (w, h) == (31, 23) and np.array_equal(got, palette[idx])

    def test_gif_kwkwk_and_malformed(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import gif_decode_stdlib

        # aaaa... forces the KwKwK (code == len(table)) LZW case
        palette = np.array([[9, 9, 9], [1, 1, 1]], np.uint8)
        idx = np.zeros((4, 8), np.uint8)
        w, h, mode, got = gif_decode_stdlib(_build_real_gif(idx, palette))
        assert np.array_equal(got, palette[idx])
        with pytest.raises(ValueError, match="gif"):
            gif_decode_stdlib(b"GIF89a garbage that is not a gif")
        body = bytearray(_build_real_gif(idx, palette))
        body[-12] |= 0  # keep valid; now flip the interlace flag in the descriptor
        # find image descriptor: byte 0x2c after header+LSD+GCT+GCE
        pos = body.index(0x2C)
        body[pos + 9] |= 0x40
        with pytest.raises(ValueError, match="interlaced"):
            gif_decode_stdlib(bytes(body))

    def test_real_bmp_decode_stdlib(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import DecodeImage, bmp_decode_stdlib

        rng = np.random.default_rng(17)
        px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        body = _build_real_bmp(px)
        w, h, mode, got = bmp_decode_stdlib(body)
        assert (w, h, mode) == (7, 5, "RGB")
        assert np.array_equal(got, px)
        out = DecodeImage()(pa.table({"doc_id": ["b"], "media_bytes": [body]}))
        assert out.to_pylist()[0] == {"doc_id": "b", "width": 7, "height": 5, "mode": "RGB"}

    def test_bmp_variants_and_malformed(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import bmp_decode_stdlib

        rng = np.random.default_rng(19)
        rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
        w, h, mode, got = bmp_decode_stdlib(_build_real_bmp(rgba))
        assert (w, h, mode) == (4, 3, "RGBA") and np.array_equal(got, rgba)
        td = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
        w, h, mode, got = bmp_decode_stdlib(_build_real_bmp(td, top_down=True))
        assert np.array_equal(got, td)
        with pytest.raises(ValueError, match="bmp"):
            bmp_decode_stdlib(b"BM too short")
        body = bytearray(_build_real_bmp(td))
        body[28] = 16  # bpp field -> unsupported 16-bit
        with pytest.raises(ValueError, match="unsupported"):
            bmp_decode_stdlib(bytes(body))

    def test_pillow_cross_check_when_present(self):
        PIL = pytest.importorskip("PIL")  # noqa: F841
        import io

        import numpy as np
        from PIL import Image

        from goto_eater_crawler_ray.functions.multimodal import bmp_decode_stdlib, gif_decode_stdlib

        palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.random.default_rng(23).integers(0, 4, (6, 9), dtype=np.uint8)
        with Image.open(io.BytesIO(_build_real_gif(idx, palette))) as im:
            assert (im.width, im.height) == (9, 6)
            assert np.array_equal(np.asarray(im.convert("RGB")), gif_decode_stdlib(_build_real_gif(idx, palette))[3])
        px = np.random.default_rng(29).integers(0, 256, (4, 6, 3), dtype=np.uint8)
        with Image.open(io.BytesIO(_build_real_bmp(px))) as im:
            assert np.array_equal(np.asarray(im.convert("RGB")), bmp_decode_stdlib(_build_real_bmp(px))[3])


class _JpegWriter:
    """Spec-conformant BASELINE JPEG encoder (test-side, stdlib+numpy):
    JFIF YCbCr (or grayscale), optional 2x2 luma subsampling, flat
    quant table, fixed-length canonical Huffman tables emitted via DHT,
    byte stuffing, optional restart intervals — so the decoder is
    exercised on real ITU T.81 streams it didn't write itself."""

    def __init__(self, quant: int = 1, restart_interval: int = 0):
        import numpy as np

        self.q = quant
        self.dri = restart_interval
        from goto_eater_crawler_ray.functions.multimodal import _DCT_M, _ZIGZAG

        self.M = _DCT_M
        self.zz = _ZIGZAG
        self.np = np

    @staticmethod
    def _category(v: int) -> int:
        return int(abs(v)).bit_length()

    def _block_symbols(self, block, pred):
        """(dc_symbol, dc_bits), [(ac_symbol, ac_bits)...], new_pred"""
        np = self.np
        f = self.M @ (block - 128.0) @ self.M.T
        coef = np.round(f / self.q).astype(np.int64)
        zzc = coef.reshape(-1)[self.zz]
        dc = int(zzc[0])
        diff = dc - pred
        t = self._category(diff)
        dc_bits = (diff if diff >= 0 else diff + (1 << t) - 1, t)
        acs = []
        run = 0
        last_nz = max((k for k in range(1, 64) if zzc[k]), default=0)
        for k in range(1, last_nz + 1):
            v = int(zzc[k])
            if v == 0:
                run += 1
                if run == 16:
                    acs.append((0xF0, (0, 0)))
                    run = 0
                continue
            s = self._category(v)
            acs.append(((run << 4) | s, (v if v >= 0 else v + (1 << s) - 1, s)))
            run = 0
        if last_nz < 63:
            acs.append((0x00, (0, 0)))  # EOB
        return (t, dc_bits), acs, dc

    def encode(self, px, subsample=False) -> bytes:
        import struct

        np = self.np
        if px.ndim == 2:
            px = px[:, :, None]
        h, w, ch = px.shape
        gray = ch == 1
        if gray:
            planes = [px[:, :, 0].astype(np.float64)]
            sampling = [(1, 1)]
        else:
            r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
            if subsample:
                hp, wp = -(-h // 2) * 2, -(-w // 2) * 2
                yp = np.pad(y, ((0, hp - h), (0, wp - w)), mode="edge")
                cbp = np.pad(cb, ((0, hp - h), (0, wp - w)), mode="edge")
                crp = np.pad(cr, ((0, hp - h), (0, wp - w)), mode="edge")
                cb = (cbp.reshape(hp // 2, 2, wp // 2, 2)).mean(axis=(1, 3))
                cr = (crp.reshape(hp // 2, 2, wp // 2, 2)).mean(axis=(1, 3))
                planes = [yp, cb, cr]
                sampling = [(2, 2), (1, 1), (1, 1)]
            else:
                planes = [y, cb, cr]
                sampling = [(1, 1), (1, 1), (1, 1)]
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        padded = []
        for p, (sh, sv) in zip(planes, sampling):
            ph, pw = mcuy * sv * 8, mcux * sh * 8
            padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))

        # pass 1: gather every MCU's symbols (shared DC + AC tables)
        preds = [0] * len(planes)
        mcus = []
        dc_syms, ac_syms = set(), set()
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if self.dri and n_mcu and n_mcu % self.dri == 0:
                    preds = [0] * len(planes)
                n_mcu += 1
                parts = []
                for ci, (p, (sh, sv)) in enumerate(zip(padded, sampling)):
                    for by in range(sv):
                        for bx in range(sh):
                            y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                            (t, dcb), acs, preds[ci] = self._block_symbols(
                                p[y0 : y0 + 8, x0 : x0 + 8], preds[ci]
                            )
                            dc_syms.add(t)
                            ac_syms.update(s for s, _ in acs)
                            parts.append(((t, dcb), acs))
                mcus.append(parts)

        def fixed_table(symbols):
            syms = sorted(symbols)
            L = 2
            while (1 << L) - 1 < len(syms):
                L += 1
            bits = [0] * 16
            bits[L - 1] = len(syms)
            codes = {s: (L, i) for i, s in enumerate(syms)}
            return bits, syms, codes

        dc_bits, dc_vals, dc_codes = fixed_table(dc_syms)
        ac_bits, ac_vals, ac_codes = fixed_table(ac_syms)

        out = bytearray(b"\xff\xd8")
        qt = bytes([0]) + bytes([self.q] * 64)
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(qt)) + qt
        nc = 1 if gray else 3
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
        for i in range(nc):
            sh, sv = sampling[i]
            sof += bytes([i + 1, (sh << 4) | sv, 0])
        out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
            seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
        if self.dri:
            out += b"\xff\xdd" + struct.pack(">HH", 4, self.dri)
        sos = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + bytes([0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        # pass 2: bitstream
        buf = bytearray()
        acc = nbits = 0

        def put(code, length):
            nonlocal acc, nbits
            if length == 0:
                return
            acc = (acc << length) | code
            nbits += length
            while nbits >= 8:
                byte = (acc >> (nbits - 8)) & 0xFF
                buf.append(byte)
                if byte == 0xFF:
                    buf.append(0x00)
                nbits -= 8
            acc &= (1 << nbits) - 1

        def flush():
            nonlocal acc, nbits
            if nbits:
                byte = ((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF
                buf.append(byte)
                if byte == 0xFF:
                    buf.append(0x00)
                acc = nbits = 0

        rst = 0
        for i, parts in enumerate(mcus):
            if self.dri and i and i % self.dri == 0:
                flush()
                buf += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
            for (t, (dcv, dct)), acs in parts:
                cl, cc = dc_codes[t]
                put(cc, cl)
                put(dcv, dct)
                for sym, (v, s) in acs:
                    cl, cc = ac_codes[sym]
                    put(cc, cl)
                    put(v, s)
        flush()
        out += buf + b"\xff\xd9"
        return bytes(out)


class TestJpegSeam:
    def test_baseline_444_rgb_roundtrip(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import DecodeImage, jpeg_decode_stdlib

        rng = np.random.default_rng(31)
        # smooth gradient + mild noise: with a flat quant=1 table the
        # round-trip error is DCT rounding only
        xx, yy = np.meshgrid(np.arange(24), np.arange(16))
        base = (xx * 5 + yy * 3) % 256
        px = np.stack([base, 255 - base, (base * 2) % 256], axis=2).astype(np.uint8)
        body = _JpegWriter(quant=1).encode(px)
        w, h, mode, got = jpeg_decode_stdlib(body)
        assert (w, h, mode) == (24, 16, "RGB")
        assert np.abs(got.astype(int) - px.astype(int)).max() <= 4  # DCT+color rounding
        out = DecodeImage()(pa.table({"doc_id": ["j"], "media_bytes": [body]}))
        assert out.to_pylist()[0] == {"doc_id": "j", "width": 24, "height": 16, "mode": "RGB"}

    def test_grayscale_and_nonmultiple_dims(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import jpeg_decode_stdlib

        rng = np.random.default_rng(37)
        px = rng.integers(0, 256, (13, 19), dtype=np.uint8)  # non-8-multiple
        w, h, mode, got = jpeg_decode_stdlib(_JpegWriter(quant=1).encode(px))
        assert (w, h, mode) == (19, 13, "L")
        assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 2

    def test_420_subsampling(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import jpeg_decode_stdlib

        # constant-chroma image: 4:2:0 subsampling loses nothing
        xx = np.tile(np.arange(32, dtype=np.uint8) * 8, (24, 1))
        px = np.stack([xx, xx, xx], axis=2)
        body = _JpegWriter(quant=1).encode(px, subsample=True)
        w, h, mode, got = jpeg_decode_stdlib(body)
        assert (w, h) == (32, 24)
        assert np.abs(got.astype(int) - px.astype(int)).max() <= 4

    def test_restart_intervals(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import jpeg_decode_stdlib

        rng = np.random.default_rng(41)
        xx, yy = np.meshgrid(np.arange(40), np.arange(24))
        base = (xx * 7 + yy * 2) % 256
        px = np.stack([base, base[::-1], base], axis=2).astype(np.uint8)
        body = _JpegWriter(quant=1, restart_interval=2).encode(px)
        assert b"\xff\xdd" in body and body.count(b"\xff\xd0") >= 1
        w, h, mode, got = jpeg_decode_stdlib(body)
        assert np.abs(got.astype(int) - px.astype(int)).max() <= 4

    def test_progressive_and_malformed_raise(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import jpeg_decode_stdlib

        with pytest.raises(ValueError, match="jpeg"):
            jpeg_decode_stdlib(b"\xff\xd8 garbage")
        body = bytearray(_JpegWriter(quant=1).encode(np.zeros((8, 8), np.uint8)))
        i = body.index(b"\xff\xc0")
        body[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="baseline"):
            jpeg_decode_stdlib(bytes(body))

    def test_pillow_cross_check_when_present(self):
        PIL = pytest.importorskip("PIL")  # noqa: F841
        import io

        import numpy as np
        from PIL import Image

        from goto_eater_crawler_ray.functions.multimodal import jpeg_decode_stdlib

        xx, yy = np.meshgrid(np.arange(24), np.arange(16))
        base = (xx * 5 + yy * 3) % 256
        px = np.stack([base, 255 - base, (base * 2) % 256], axis=2).astype(np.uint8)
        body = _JpegWriter(quant=1).encode(px)
        with Image.open(io.BytesIO(body)) as im:
            ours = jpeg_decode_stdlib(body)[3]
            theirs = np.asarray(im.convert("RGB"))
            assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


class TestWavSeam:
    def test_real_wav_decode_stdlib(self):
        import io
        import wave as wave_mod

        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import DecodeAudio, wav_decode_stdlib

        rng = np.random.default_rng(43)
        samples = rng.integers(-32768, 32767, (500, 2), dtype=np.int16)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(samples.tobytes())
        body = buf.getvalue()
        ch, rate, frames, got = wav_decode_stdlib(body)
        assert (ch, rate, frames) == (2, 44100, 500)
        assert np.array_equal(got, samples)
        out = DecodeAudio()(pa.table({"doc_id": ["a"], "media_bytes": [body]}))
        row = out.to_pylist()[0]
        assert row["n_channels"] == 2 and row["sample_rate"] == 44100 and row["n_frames"] == 500
        assert row["duration_ms"] == 500 * 1000 // 44100

    def test_wav_8bit_and_malformed(self):
        import io
        import wave as wave_mod

        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import wav_decode_stdlib

        raw8 = np.arange(256, dtype=np.uint8)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(raw8.tobytes())
        ch, rate, frames, got = wav_decode_stdlib(buf.getvalue())
        assert (ch, rate, frames) == (1, 8000, 256)
        assert np.array_equal(got[:, 0], ((raw8.astype(np.int16) - 128) << 8))
        with pytest.raises(ValueError, match="wav"):
            wav_decode_stdlib(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks
        with pytest.raises(ValueError, match="wav"):
            wav_decode_stdlib(b"not audio at all")

    def test_fake_path_matches_md5_arithmetic(self):
        import hashlib

        from goto_eater_crawler_ray.functions.multimodal import DecodeAudio

        body = b"plain text payload"
        d = hashlib.md5(body).digest()
        row = DecodeAudio()(pa.table({"doc_id": ["x"], "media_bytes": [body]})).to_pylist()[0]
        assert row["n_channels"] == 1 + (d[0] & 1)
        assert row["sample_rate"] == 8000 + 100 * d[1]
        assert row["n_frames"] == 1000 + d[2] + (d[3] << 8)
        with pytest.raises(NotImplementedError):
            DecodeAudio(strict=True)(pa.table({"doc_id": ["x"], "media_bytes": [body]}))


def _build_real_avi_mjpeg(jpeg_frames) -> bytes:
    """Minimal REAL RIFF-AVI container with an hdrl stub and a movi LIST
    of 00dc MJPEG chunks — enough structure to exercise the RIFF walk
    (nested LISTs, word alignment, non-frame chunks skipped)."""
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    hdrl = lst(b"hdrl", chunk(b"avih", b"\x00" * 56))
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = lst(b"movi", movi_body + chunk(b"idx1", b"\x00" * 16))
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


class TestAviSeam:
    def test_real_mjpeg_avi_frame_sampling(self):
        import numpy as np

        from goto_eater_crawler_ray.functions.multimodal import FrameSampler, avi_mjpeg_frames_stdlib

        frames_px = []
        enc = _JpegWriter(quant=1)
        for i in range(5):
            xx, yy = np.meshgrid(np.arange(16), np.arange(8))
            base = (xx * 3 + yy * 5 + i * 40) % 256
            frames_px.append(np.stack([base, base, base], axis=2).astype(np.uint8))
        body = _build_real_avi_mjpeg([enc.encode(p) for p in frames_px])
        got = avi_mjpeg_frames_stdlib(body, every_n=2)  # frames 0, 2, 4
        assert [g[0] for g in got] == [0, 1, 2]
        for (n, w, h, px), src in zip(got, frames_px[::2]):
            assert (w, h) == (16, 8)
            assert np.abs(px.astype(int) - src.astype(int)).max() <= 4
        out = FrameSampler(every_n=2)(pa.table({"doc_id": ["v"], "media_bytes": [body]}))
        assert out.num_rows == 3 and out.column("frame_no").to_pylist() == [0, 1, 2]

    def test_malformed_avi_raises(self):
        import pytest as _pytest

        from goto_eater_crawler_ray.functions.multimodal import avi_mjpeg_frames_stdlib

        with _pytest.raises(ValueError, match="avi"):
            avi_mjpeg_frames_stdlib(b"RIFF\x04\x00\x00\x00WAVE")
        body = _build_real_avi_mjpeg([b"not a jpeg"])
        with _pytest.raises(ValueError, match="jpeg"):
            avi_mjpeg_frames_stdlib(body)
