"""Scalar extraction families (SURVEY.md §2.3) — pure string fns, compiled once.

Each function reproduces a reference extractor family's semantics (citations
inline).  They are called per-row *inside* ``map_batches`` over Arrow string
columns — the batch loop is in the parse stage, patterns are compiled at
module import (equivalently: once per worker process), never per batch.
"""

from __future__ import annotations

import re

# --- zip/address split ------------------------------------------------------
# reference: tochigi.py:32-40 (`〒(?P<zip_code>.*?)\s(?P<address>.*)` + no-zip
# fallback), aichi.py:33-36 (`〒\s*`), shizuoka.py:30-34 (zero-space variant
# `\d{3}-\d{4}` with no separator).
_ZIP_SPACED = re.compile(r"^〒\s*(?P<zip>\d{3}-?\d{4})\s+(?P<addr>.*)$", re.S)
_ZIP_TIGHT = re.compile(r"^〒\s*(?P<zip>\d{3}-\d{4})(?P<addr>.*)$", re.S)


def split_zip_address(place: str | None) -> tuple[str | None, str | None]:
    if not place:
        return None, None
    place = place.strip()
    m = _ZIP_SPACED.match(place) or _ZIP_TIGHT.match(place)
    if m:
        return m.group("zip"), m.group("addr").strip()
    return None, place  # no-zip fallback (tochigi.py:38-40)


# --- tel normalization ------------------------------------------------------
# reference prefix strips: "TEL:" okinawa.py:27, "TEL." gunma.py:37,
# "tel:" tottori.py:29, "TEL : " yamagata.py:100; regex extract
# `0\d{1,4}-\d{1,4}-\d{3,4}` iwate.py:73-75.
_TEL_NUM = re.compile(r"0\d{1,4}-\d{1,4}-\d{3,4}")
_TEL_PREFIX = re.compile(r"^\s*(?:TEL\s*[:.．]?\s*|tel:)\s*", re.I)


def normalize_tel(raw: str | None) -> str | None:
    if not raw:
        return None
    m = _TEL_NUM.search(raw)
    if m:
        return m.group(0)
    return _TEL_PREFIX.sub("", raw).strip() or None


# --- genre multi-value join -------------------------------------------------
# reference: "|".join (oita.py:59-60, tottori.py:34-35); delimiter rewrites
# 、->| (fukui.py:54), ｜->| (kagawa.py:28-33), comma split-rejoin
# (tokushima.py:24-28); ●-strip (yamaguchi.py:40-41).
_GENRE_SPLIT = re.compile(r"[、｜,|]")


def join_genres(raw: str | None) -> str | None:
    if not raw:
        return None
    parts = [p.strip().lstrip("●") for p in _GENRE_SPLIT.split(raw)]
    parts = [p for p in parts if p]
    return "|".join(parts) if parts else None


# --- lat/lng from map URLs --------------------------------------------------
# reference regex shapes: `/@lat,lng,zoom` tochigi.py:47-54 + niigata.py:91-95,
# `q=lat,lng` kyoto.py:84-88 / fukui.py:64-70 / fukushima.py:40-50,
# static-map marker tokyo_gnavi.py:145-149.
_LATLNG_AT = re.compile(r"/@(\d+\.\d+),(\d+\.\d+)")
_LATLNG_Q = re.compile(r"[?&]q=(\d+\.\d+),(\d+\.\d+)")
_LATLNG_MARKER = re.compile(r"[?&]markers=(\d+\.\d+),(\d+\.\d+)")


def extract_latlng(href: str | None) -> tuple[str | None, str | None]:
    if not href:
        return None, None
    for pat in (_LATLNG_AT, _LATLNG_Q, _LATLNG_MARKER):
        m = pat.search(href)
        if m:
            return m.group(1), m.group(2)
    return None, None


# --- name/genre split -------------------------------------------------------
# reference: miyazaki.py:24-28 `(?P<shop_name>.*)(\/|／)+(?P<genre_name>.*)`.
_NAME_GENRE = re.compile(r"^(?P<shop_name>.*?)[/／]+(?P<genre_name>.*)$")


def split_name_genre(title: str | None) -> tuple[str | None, str | None]:
    if not title:
        return None, None
    m = _NAME_GENRE.match(title)
    if m:
        return m.group("shop_name").strip(), m.group("genre_name").strip()
    return title.strip(), None


# --- whitespace scrub -------------------------------------------------------
# reference: re.sub(r"\s","",address) osaka.py:73, hyogo.py:27.
_WS = re.compile(r"\s")


def scrub_whitespace(s: str | None) -> str | None:
    return _WS.sub("", s) if s else s


# --- tag classification (area vs genre) -------------------------------------
# reference: membership test against per-prefecture area_list
# (niigata.py:78-89, osaka.py:59-68, yamagata.py:102-111).
def classify_tag(tag: str | None, area_set: frozenset[str]) -> tuple[str | None, str | None]:
    """-> (area_name, genre_name); single-value assumption as in reference."""
    if not tag:
        return None, None
    tag = tag.strip()
    return (tag, None) if tag in area_set else (None, tag)


# --- code -> name mapping ---------------------------------------------------
# reference: fukuoka.py:20-37,65 genre int code -> fixed name list.
def map_code(code: str | int | None, table: list[str]) -> str | None:
    try:
        i = int(code)
    except (TypeError, ValueError):
        return None
    return table[i] if 0 <= i < len(table) else None


# --- js-object literal decode ----------------------------------------------
# reference: miyagi.py:71-86 uses demjson for non-JSON JS literals; here a
# tolerant converter: a quote-aware tokenizer rewrites single-quoted JS
# strings to JSON double-quoted strings (preserving apostrophes INSIDE
# double-quoted strings and escaping embedded double quotes — a naive
# global quote swap corrupts values like "Bob's diner", which is exactly
# why the reference reaches for demjson), then quotes unquoted keys and
# drops trailing commas OUTSIDE string spans, then json.loads.
_JS_KEY = re.compile(r"([{,]\s*)([A-Za-z_]\w*)\s*:")
_JS_TRAILING = re.compile(r",(\s*[}\]])")


def _js_segments(src: str):
    """Split into (is_string, text) segments; string segments are emitted
    already converted to valid JSON double-quoted strings."""
    out = []
    i, n = 0, len(src)
    plain_start = 0
    while i < n:
        c = src[i]
        if c not in "'\"":
            i += 1
            continue
        if plain_start < i:
            out.append((False, src[plain_start:i]))
        if c == '"':  # double-quoted: copy verbatim (escapes already JSON-ish)
            j = i + 1
            while j < n and src[j] != '"':
                j += 2 if src[j] == "\\" else 1
            out.append((True, src[i : min(j + 1, n)]))
            i = j + 1
        else:  # single-quoted: convert
            j, buf = i + 1, []
            while j < n and src[j] != "'":
                if src[j] == "\\":
                    nxt = src[j + 1] if j + 1 < n else ""
                    buf.append("'" if nxt == "'" else src[j : j + 2])
                    j += 2
                    continue
                buf.append('\\"' if src[j] == '"' else src[j])
                j += 1
            out.append((True, '"' + "".join(buf) + '"'))
            i = j + 1
        plain_start = i
    if plain_start < n:
        out.append((False, src[plain_start:]))
    return out


def decode_js_object(src: str):
    import json

    parts = []
    for is_str, seg in _js_segments(src):
        if not is_str:
            seg = _JS_KEY.sub(r'\1"\2":', seg)
            seg = _JS_TRAILING.sub(r"\1", seg)
        parts.append(seg)
    return json.loads("".join(parts))
