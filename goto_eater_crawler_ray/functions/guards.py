"""Schema-pinned empty-result guards (repo convention).

Ray's hash aggregate / hash join emit ZERO-COLUMN empty blocks when a
key domain is empty (empty seed set, no qualifying rows at tiny scale)
or smaller than the shuffle partition count, and ``map_batches`` is
never invoked on empty input — so an empty upstream silently erases the
result schema and poisons any downstream Arrow join ("No match or
multiple matches for key field ...").  Two idioms fix it:

- mid-pipeline, before a ``Dataset.join``: an inline
  ``.repartition(n)  # zero-column empty-block scrub`` coalesces the
  empty partitions away (used inline throughout ``pipelines/queries.py``).
- at a FINAL aggregate whose result is small (the driver-legal kind):
  :func:`pin_small` — materialize and re-pin the declared schema,
  returning a typed empty table when nothing qualified, so the result
  keeps its column set at every scale (sf0.001 included).
"""

from __future__ import annotations

import pyarrow as pa


def pin_small(result, schema: pa.Schema) -> pa.Table:
    """Materialize a SMALL final result with its schema pinned.

    ``result`` is a ``ray.data.Dataset`` (or an Arrow table) whose row
    count is driver-legal (bounded by a tiny key domain or a LIMIT).
    Empty blocks are dropped before concat (they are the zero-column
    hazard); when nothing survives, the typed empty table for ``schema``
    is returned instead of a schema-less one.  Non-empty results are
    column-selected and cast to ``schema`` so the dtype contract holds
    on every path."""
    import ray

    if isinstance(result, pa.Table):
        tabs = [result] if result.num_rows else []
    else:
        tabs = [t for t in ray.get(result.to_arrow_refs()) if t.num_rows > 0]
    if not tabs:
        return schema.empty_table()
    t = pa.concat_tables(tabs, promote_options="permissive")
    return t.select(schema.names).cast(schema)
