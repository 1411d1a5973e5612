"""Distributed prefix-sum (scan) and sequence packing.

The LLM-corpus packing op: concatenate documents in a stable global
order and slice the token stream into fixed-length training sequences —
each document needs its GLOBAL start offset, i.e. an exclusive prefix
sum over a corpus-sized table.  Ray Data has no scan primitive, so this
implements the classic two-pass distributed scan:

  1. partition by a deterministic KEY RANGE (part = key // rows_per_part
     — a pure function of the key, so membership is stable under any
     re-partitioning of the input, like functions/sampling.py),
  2. per-partition value sums -> ONE tiny table (n_parts rows) to the
     driver, which computes the exclusive scan of partition totals
     (n_parts scalars — the legal kind of driver materialization),
  3. one groupby(part).map_groups pass: sort within the partition by
     key, local exclusive cumsum + the broadcast partition offset.

Total exchange: one groupby shuffle + n_parts scalars.  SQL twin:
``sum(v) OVER (ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING)`` — all-integer, exact hash match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def prefix_sum(ds, key_col: str, value_col: str, out_col: str = "offset", n_parts: int = 64):
    """Exclusive prefix sum of ``value_col`` in ascending ``key_col``
    order (keys must be unique non-negative ints).  Returns the input
    columns plus ``out_col``."""
    from ray.data.aggregate import Max, Sum

    hi = ds.aggregate(Max(key_col, alias_name="hi"))["hi"]
    if hi is None:  # empty input: no partitions to scan, empty output
        hi = 0
    rows_per_part = max(1, int(hi) // n_parts + 1)

    def part_key(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array((k // rows_per_part).astype(np.int32), pa.int32()))

    parted = ds.map_batches(part_key, batch_format="pyarrow")
    # pass 1: per-partition totals -> tiny driver-side exclusive scan
    totals = parted.groupby("_part").aggregate(Sum(value_col, alias_name="part_sum")).take_all()
    totals.sort(key=lambda r: r["_part"])
    base = {}
    running = 0
    for r in totals:
        base[r["_part"]] = running
        running += int(r["part_sum"])

    # pass 2: local exclusive cumsum + broadcast partition offset
    def scan(part: pa.Table) -> pa.Table:
        out_schema = part.schema.remove(part.schema.get_field_index("_part")).append(pa.field(out_col, pa.int64()))
        if part.num_rows == 0:
            return out_schema.empty_table()
        pid = int(part.column("_part")[0].as_py())
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        part = part.take(pa.array(order)).drop_columns(["_part"])
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.concatenate(([0], np.cumsum(vals)[:-1])) + base.get(pid, 0)
        return part.append_column(out_col, pa.array(excl, pa.int64()))

    return parted.groupby("_part").map_groups(scan, batch_format="pyarrow")


def pack_sequences(docs_ds, key_col: str, n_tokens_col: str, seq_len: int, n_parts: int = 64):
    """Fixed-length sequence packing: global token start offset per doc
    (distributed scan) -> ``seq_id = offset // seq_len``, the id of the
    training sequence in which this document BEGINS when the corpus is
    concatenated in key order and sliced every ``seq_len`` tokens."""
    scanned = prefix_sum(docs_ds, key_col, n_tokens_col, out_col="start_offset", n_parts=n_parts)

    def with_seq(t: pa.Table) -> pa.Table:
        seq = pc.cast(pc.divide(t.column("start_offset"), seq_len), pa.int64())
        return t.append_column("seq_id", seq)

    return scanned.map_batches(with_seq, batch_format="pyarrow")
