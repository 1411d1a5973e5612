"""Windowed per-key aggregates, Ray-Data-first.

The reference has no in-engine aggregation (SURVEY.md §2.7), but a
training-data pipeline needs ordered per-key window ops (rolling quality
averages, per-host rate windows).  Pattern (the same coarse-partition
trick as the LSH buckets): hash keys into ``n_key_parts`` partitions via
one groupby — each ``map_groups`` call receives MANY complete key groups
— then sort and compute all windows segment-vectorized with numpy (no
per-key Python calls, no per-key shuffle).

SQL-oracle twin: ``avg(x) OVER (PARTITION BY key ORDER BY ... ROWS
BETWEEN w-1 PRECEDING AND CURRENT ROW)`` — rolling mean emitted as a
scaled BIGINT so the DuckDB hash-compare is float-rounding-proof.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rolling_mean_per_key(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 3,
    out_col: str = "mov_avg_c",
    scale: int = 100,
    n_key_parts: int = 64,
):
    """ROWS window-1 PRECEDING..CURRENT rolling mean per key, ordered by
    ``order_cols`` — returns (key, *order_cols, out_col) with the mean as
    ``round(mean*scale)`` BIGINT.  One hash shuffle (the coarse groupby);
    everything inside is a numpy segment pass."""

    def part_key(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    def windows(part: pa.Table) -> pa.Table:
        n = part.num_rows
        out_schema = pa.schema(
            [part.schema.field(key_col)]
            + [part.schema.field(c) for c in order_cols]
            + [pa.field(out_col, pa.int64())]
        )
        if n == 0:
            return out_schema.empty_table()
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        orders = [part.column(c).to_numpy(zero_copy_only=False) for c in order_cols]
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        sort_idx = np.lexsort(tuple(reversed(orders)) + (keys,))
        keys, vals = keys[sort_idx], vals[sort_idx]
        orders = [o[sort_idx] for o in orders]
        seg_start = np.concatenate(([True], keys[1:] != keys[:-1]))
        # position within segment, vectorized
        idx = np.arange(n)
        start_of = np.maximum.accumulate(np.where(seg_start, idx, 0))
        pos = idx - start_of
        win = np.minimum(pos + 1, window)
        # frame sum accumulated OLDEST-ELEMENT-FIRST: for row i with frame
        # length L the adds happen in order v[i-L+1], ..., v[i] — the same
        # order a SQL engine's frame scan uses, so float rounding is
        # bit-compatible with the DuckDB oracle by construction (a row with
        # pos < d skips the d-shifted add, so its first add is its own
        # oldest frame element)
        s = np.zeros(n, dtype=np.float64)
        for d in range(window - 1, -1, -1):
            shifted = np.concatenate((np.zeros(min(d, n)), vals[: n - d])) if d else vals
            s = np.where(pos >= d, s + shifted, s)
        mean = s / win
        # DuckDB round() is half-AWAY-from-zero; np.round is half-to-even —
        # window means land exactly on .5 (sum/2), so match DuckDB explicitly
        scaled = mean * scale
        scaled = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
        cols = {key_col: keys}
        for c, o in zip(order_cols, orders):
            cols[c] = o
        cols[out_col] = scaled.astype(np.int64)
        arrays = []
        for f in out_schema:
            arrays.append(pa.array(cols[f.name]).cast(f.type))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return ds.map_batches(part_key, batch_format="pyarrow").groupby("_key_part").map_groups(windows, batch_format="pyarrow")


def top_n_per_key(
    ds,
    key_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str,
    descending: bool = True,
    rank_col: str = "rn",
    n_key_parts: int = 64,
):
    """``row_number() OVER (PARTITION BY key ORDER BY order_col [DESC],
    tiebreak_col) <= n`` — per-key top-N with a deterministic tie-break.
    Same shape as :func:`rolling_mean_per_key`: one coarse hash shuffle,
    then an in-part lexsort + segment-position mask (no per-key Python
    calls).  A per-batch pre-prune keeps only each batch's local top-N per
    key before the shuffle, so the exchange carries O(n_keys·N) rows, not
    the full table — the partial-aggregate trick applied to a window op."""

    def _local_positions(keys: np.ndarray, order: np.ndarray, tie: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ord_key = -order if descending else order
        sort_idx = np.lexsort((tie, ord_key, keys))
        skeys = keys[sort_idx]
        seg_start = np.concatenate(([True], skeys[1:] != skeys[:-1]))
        idx = np.arange(len(keys))
        pos = idx - np.maximum.accumulate(np.where(seg_start, idx, 0))
        return sort_idx, pos

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            k = batch.column(key_col).to_numpy(zero_copy_only=False)
            return batch.append_column("_key_part", pa.array(k.astype(np.int32), pa.int32()))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        order = batch.column(order_col).to_numpy(zero_copy_only=False)
        tie = batch.column(tiebreak_col).to_numpy(zero_copy_only=False)
        sort_idx, pos = _local_positions(keys, order, tie)
        keep = sort_idx[pos < n]  # local top-n per key is a superset of the global winners in this batch
        out = batch.take(pa.array(np.sort(keep)))
        k = out.column(key_col).to_numpy(zero_copy_only=False)
        return out.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    def topn(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_key_part"])
        out_schema = part.schema.append(pa.field(rank_col, pa.int64()))
        if part.num_rows == 0:
            return out_schema.empty_table()
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        order = part.column(order_col).to_numpy(zero_copy_only=False)
        tie = part.column(tiebreak_col).to_numpy(zero_copy_only=False)
        sort_idx, pos = _local_positions(keys, order, tie)
        keep_mask = pos < n
        taken = part.take(pa.array(sort_idx[keep_mask]))
        return taken.append_column(rank_col, pa.array(pos[keep_mask] + 1, pa.int64()))

    return ds.map_batches(prune, batch_format="pyarrow").groupby("_key_part").map_groups(topn, batch_format="pyarrow")

def lag_delta_per_key(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "delta",
    first_value: int = -1,
    n_key_parts: int = 64,
):
    """``value - lag(value) OVER (PARTITION BY key ORDER BY order_cols)``
    with the partition's first row coalesced to ``first_value`` — the
    inter-arrival / difference window op (event-gap analysis, rate
    estimation).  Integer in, integer out, so the SQL twin hash-matches
    with no float rounding concerns.

    Same shape as :func:`rolling_mean_per_key`: one coarse hash shuffle
    (key % n_key_parts), then an in-part lexsort + one vectorized shifted
    subtraction across all key segments at once."""

    def part_key(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    def deltas(part: pa.Table) -> pa.Table:
        n = part.num_rows
        out_schema = pa.schema(
            [part.schema.field(key_col)]
            + [part.schema.field(c) for c in order_cols]
            + [pa.field(out_col, pa.int64())]
        )
        if n == 0:
            return out_schema.empty_table()
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        orders = [part.column(c).to_numpy(zero_copy_only=False) for c in order_cols]
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sort_idx = np.lexsort(tuple(reversed(orders)) + (keys,))
        keys, vals = keys[sort_idx], vals[sort_idx]
        orders = [o[sort_idx] for o in orders]
        seg_start = np.concatenate(([True], keys[1:] != keys[:-1]))
        prev = np.concatenate(([0], vals[:-1]))
        delta = np.where(seg_start, np.int64(first_value), vals - prev)
        cols = {key_col: keys, out_col: delta}
        for c, o in zip(order_cols, orders):
            cols[c] = o
        arrays = [pa.array(cols[f.name]).cast(f.type) for f in out_schema]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return ds.map_batches(part_key, batch_format="pyarrow").groupby("_key_part").map_groups(deltas, batch_format="pyarrow")
