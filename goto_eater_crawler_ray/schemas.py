"""Arrow schemas for every engine table (SURVEY.md §1.4).

All bulk data moves as Arrow blocks with these fixed schemas; the only
non-dataset state is the seen/politeness shard actors (checkpointed
separately).
"""

from __future__ import annotations

import pyarrow as pa

# frontier_t — one row per admitted, scheduled fetch (SURVEY.md §1.4)
FRONTIER_SCHEMA = pa.schema(
    [
        ("prefecture", pa.string()),
        ("url", pa.string()),  # canonical
        ("url_key", pa.binary(20)),  # sha1(method|canonical|form)
        ("host", pa.string()),
        ("part", pa.int32()),  # hash partition (salted for mega-hosts)
        ("depth", pa.int32()),
        ("discovered_at", pa.float64()),  # virtual discovery time
        ("visit_seq", pa.int64()),  # per-host visit order (politeness shard)
        ("sched_ts", pa.float64()),  # virtual fetch time
        ("method", pa.string()),
        ("form_json", pa.string()),
        ("meta_json", pa.string()),
        ("callback", pa.string()),
        ("parent_key", pa.binary(20)),
        ("chain", pa.int8()),  # 1 = sole frontier row for its host this wave -> chain-followable
    ]
)

# fetched page rows (body dropped after parse — bodies never traverse more
# than one stage, SURVEY.md §7.0)
PAGE_EXTRA_FIELDS = [
    ("status", pa.int32()),
    ("content_type", pa.string()),
    ("body", pa.binary()),
    ("latency_ms", pa.int32()),
    ("attempts", pa.int32()),
    ("fetched_at", pa.float64()),  # virtual completion time
]
PAGE_SCHEMA = pa.schema(list(FRONTIER_SCHEMA) + [pa.field(n, t) for n, t in PAGE_EXTRA_FIELDS])

SPAN_STRUCT = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
)

ITEM_STRUCT = pa.struct(
    [
        ("shop_name", pa.string()),
        ("address", pa.string()),
        ("tel", pa.string()),
        ("genre_name", pa.string()),
        ("zip_code", pa.string()),
        ("official_page", pa.string()),
        ("opening_hours", pa.string()),
        ("closing_day", pa.string()),
        ("area_name", pa.string()),
        ("detail_page", pa.string()),
        ("provided_lat", pa.string()),
        ("provided_lng", pa.string()),
    ]
)

# pending (NOT-yet-fetched) discovered links only: links the chain follower
# fetched in-task become their own parsed rows, so storing them again would
# double the control-plane bytes and force the admission stage to decode
# them just to drop them. ``n_links`` keeps the total discovery count.
LINK_STRUCT = pa.struct(
    [
        ("url", pa.string()),
        ("callback", pa.string()),
        ("method", pa.string()),
        ("form_json", pa.string()),
        ("meta_json", pa.string()),
    ]
)

# narrow per-page parse output (the only wave-materialized table)
PARSED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("prefecture", pa.string()),
        ("url", pa.string()),
        ("url_key", pa.binary(20)),
        ("parent_key", pa.binary(20)),
        ("host", pa.string()),
        ("part", pa.int32()),
        ("depth", pa.int32()),
        ("visit_seq", pa.int64()),
        ("sched_ts", pa.float64()),
        ("fetched_at", pa.float64()),
        ("status", pa.int32()),
        ("attempts", pa.int32()),
        ("bytes", pa.int64()),
        ("callback", pa.string()),
        ("n_links", pa.int32()),  # total discovered (incl. chain-followed)
        ("n_items", pa.int32()),  # flat item count: metrics never decodes the nested col
        ("items", pa.list_(ITEM_STRUCT)),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("links", pa.list_(LINK_STRUCT)),  # pending links only
    ]
)

# flat items table (reference 12-col order + keys, settings.py:100-113)
ITEM_SCHEMA = pa.schema(
    [pa.field(f.name, f.type) for f in ITEM_STRUCT]
    + [
        ("prefecture", pa.string()),
        ("source_url", pa.string()),
        ("row_in_page", pa.int32()),
        ("visit_seq", pa.int64()),
    ]
)

# interleaved span documents — EXACTLY the BASELINE.json input_hint shape
DOCUMENT_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

# per-wave x host metrics (SURVEY.md §4.2)
METRICS_SCHEMA = pa.schema(
    [
        ("wave", pa.int32()),
        ("host", pa.string()),
        ("pages", pa.int64()),
        ("items", pa.int64()),
        ("links", pa.int64()),
        ("bytes", pa.int64()),
        ("errors", pa.int64()),
        ("retries", pa.int64()),
    ]
)

# lineage: every fetched page's discovery provenance (SURVEY.md §4.2)
LINEAGE_SCHEMA = pa.schema(
    [
        ("url_key", pa.binary(20)),
        ("url", pa.string()),
        ("parent_key", pa.binary(20)),
        ("prefecture", pa.string()),
        ("depth", pa.int32()),
        ("wave", pa.int32()),
        ("visit_seq", pa.int64()),
        ("host", pa.string()),
    ]
)
