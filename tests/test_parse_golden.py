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


class TestCodecSeams:
    """The xlsx/pdf/image codec seams: deterministic fakes keep plumbing
    testable in this container; REAL bodies either decode through the real
    library (conditional tests, skipped when absent) or raise an explicit
    NotImplementedError — never silent garbage."""

    def test_real_xlsx_body_without_codec_raises(self):
        from goto_eater_crawler_ray.stages.parse import parse_file_xlsx

        try:
            import openpyxl  # noqa: F401

            pytest.skip("openpyxl installed; the no-codec branch is unreachable")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError, match="openpyxl"):
            parse_file_xlsx("u", b"PK\x03\x04 not really a sheet", {}, 0)

    def test_real_pdf_body_without_codec_raises(self):
        from goto_eater_crawler_ray.stages.parse import parse_file_pdf

        try:
            import pdfplumber  # noqa: F401

            pytest.skip("pdfplumber installed; the no-codec branch is unreachable")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError, match="pdf"):
            parse_file_pdf("u", b"%PDF-1.7 fake", {}, 0)

    def test_real_xlsx_decode_when_codec_present(self):
        openpyxl = pytest.importorskip("openpyxl")
        import io

        from goto_eater_crawler_ray.stages.parse import parse_file_xlsx

        wb = openpyxl.Workbook()
        ws = wb.active
        ws.title = "リスト"
        ws.append(["店名", "住所", "電話"])
        ws.append(["店A", "奈良市1-1", "0742-00-0001"])
        buf = io.BytesIO()
        wb.save(buf)
        res = parse_file_xlsx("u", buf.getvalue(), {}, 0)
        assert res.items[0]["shop_name"] == "店A"

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
