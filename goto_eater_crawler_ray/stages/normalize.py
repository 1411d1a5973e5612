"""The global post-parse normalize stage (reference pipelines.py:10-40).

Runs on EVERY item from EVERY parser, exactly like the reference's
``GotoEatScrapyPipeline.process_item``:

  1. ``normalize_text`` = remove HTML tags -> join ``splitlines()`` ->
     ``strip()``, applied to shop_name, address, opening_hours, closing_day
     (pipelines.py:31-33; w3lib.remove_tags semantics re-implemented on
     stdlib regex since w3lib isn't a dependency here).
  2. bare ``.strip()`` for genre_name, area_name, tel, zip_code,
     official_page (pipelines.py:36-38).

Exposed two ways: ``normalize_text`` (scalar, reference-parity unit vector
pipelines.py:53-54) and ``normalize_batch`` (vectorized pyarrow stage for
``map_batches(batch_format="pyarrow")``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TAG = re.compile(r"<[^>]*>")
# str.splitlines() boundary characters (Python docs) — removing them equals
# "".join(s.splitlines())
_LINEBREAKS = r"[\n\r\v\f\x1c\x1d\x1e\x85  ]"

TAGGED_FIELDS = ("shop_name", "address", "opening_hours", "closing_day")
STRIPPED_FIELDS = ("genre_name", "area_name", "tel", "zip_code", "official_page")


def normalize_text(s: str | None) -> str | None:
    """Scalar reference-parity form (pipelines.py:10-17)."""
    if s is None:
        return None
    return "".join(_TAG.sub("", s).splitlines()).strip()


def _normalize_string_array(arr: pa.Array) -> pa.Array:
    arr = pc.replace_substring_regex(arr, pattern=_TAG.pattern, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_LINEBREAKS, replacement="")
    return pc.utf8_trim_whitespace(arr)


def _string_col(tbl: pa.Table, name: str) -> pa.Array | None:
    """Column as a contiguous string array, or None if absent/non-string.
    All-null columns infer as pa.null() from from_pylist — cast those."""
    if name not in tbl.column_names:
        return None
    col = tbl.column(name)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        return None
    return arr


def normalize_batch(tbl: pa.Table) -> pa.Table:
    """Vectorized normalize over an items table; non-present columns skipped."""
    for name in TAGGED_FIELDS:
        arr = _string_col(tbl, name)
        if arr is not None:
            tbl = tbl.set_column(tbl.column_names.index(name), name, _normalize_string_array(arr))
    for name in STRIPPED_FIELDS:
        arr = _string_col(tbl, name)
        if arr is not None:
            tbl = tbl.set_column(tbl.column_names.index(name), name, pc.utf8_trim_whitespace(arr))
    return tbl
