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

def broadcast_interval_join_agg(
    ds,
    windows: pa.Table,
    *,
    ts_col: str,
    value_col: str,
    win_id_col: str = "window_id",
    start_col: str = "start",
    end_col: str = "end",
    count_col: str = "n_events",
    sum_col: str = "sum_value",
    max_windows: int = 100_000,
):
    """Broadcast interval (range) JOIN + aggregate: match every probe row
    whose ``ts_col`` falls in ``[start, end)`` of a window — NO equality
    key — and return per-window ``(win_id, count, sum(value))`` with
    inner-join semantics (empty windows dropped).

    The reference engine has no joins at all (SURVEY.md §2.6 covers only
    the miyagi two-source lookup); this is the time-range lookup a crawl /
    training-data pipeline needs for attribution windows, incident
    correlation and campaign roll-ups.

    Scale shape: the windows side is broadcast-small BY CONTRACT
    (campaign / incident lists; hard-gated by ``max_windows`` — at 10^10
    probe rows the probe side streams, nothing probe-sized ever
    materializes).  Windows are sorted by start once on the driver and
    shipped via ``ray.put``; each probe batch finds its candidate window
    range with two ``np.searchsorted`` binary searches against the sorted
    starts (using the max window width as the lookback bound), masks on
    the true per-window end, and combines ``(count, sum)`` per window
    LOCALLY with ``np.bincount`` — so the only exchange is the final tiny
    ``groupby(window_id)`` over per-batch partials, O(blocks × windows)
    rows max.  For a large-large interval join, bin BOTH sides by a time
    bucket first (the bucketed equi-join pattern) and apply this
    per-bucket; that variant is not needed for the query surface here.
    """
    import ray
    from ray.data.aggregate import Sum

    if windows.num_rows > max_windows:
        raise ValueError(
            f"interval-join windows side has {windows.num_rows} rows > max_windows={max_windows}; "
            "bin both sides by time bucket instead of broadcasting"
        )
    ids = windows.column(win_id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = windows.column(start_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    ends = windows.column(end_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, starts))
    ids, starts, ends = ids[order], starts[order], ends[order]
    max_width = int((ends - starts).max()) if len(starts) else 0
    win_ref = ray.put((ids, starts, ends, max_width))

    def partials(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [pa.field(win_id_col, pa.int64()), pa.field(count_col, pa.int64()), pa.field(sum_col, pa.float64())]
        )
        w_ids, w_starts, w_ends, w_max = ray.get(win_ref)
        if batch.num_rows == 0 or len(w_starts) == 0:
            return out_schema.empty_table()
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        # candidate windows for row ts: start in (ts - max_width, ts]
        lo = np.searchsorted(w_starts, ts - w_max, side="right")
        hi = np.searchsorted(w_starts, ts, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        ev_idx = np.repeat(np.arange(len(ts)), counts)
        win_idx = np.repeat(lo, counts) + (np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts))
        keep = w_ends[win_idx] > ts[ev_idx]  # exact end check (variable widths)
        ev_idx, win_idx = ev_idx[keep], win_idx[keep]
        if len(win_idx) == 0:
            return out_schema.empty_table()
        n_per_win = np.bincount(win_idx, minlength=len(w_starts))
        s_per_win = np.bincount(win_idx, weights=vals[ev_idx], minlength=len(w_starts))
        nz = np.flatnonzero(n_per_win)
        return pa.table(
            {
                win_id_col: pa.array(w_ids[nz], pa.int64()),
                count_col: pa.array(n_per_win[nz], pa.int64()),
                sum_col: pa.array(s_per_win[nz], pa.float64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(win_id_col)
        .aggregate(Sum(count_col, alias_name=count_col), Sum(sum_col, alias_name=sum_col))
    )


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
    subtraction across all key segments at once.  Output schema is
    ``(key, *order_cols, value_col if distinct, out_col)`` — the value
    column is carried through (deduped against key/order cols) so generic
    callers don't silently lose it."""

    def part_key(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    carry_value = value_col not in (key_col, *order_cols)

    def deltas(part: pa.Table) -> pa.Table:
        n = part.num_rows
        out_schema = pa.schema(
            [part.schema.field(key_col)]
            + [part.schema.field(c) for c in order_cols]
            + ([part.schema.field(value_col)] if carry_value else [])
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
        if carry_value:
            cols[value_col] = vals
        arrays = [pa.array(cols[f.name]).cast(f.type) for f in out_schema]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return ds.map_batches(part_key, batch_format="pyarrow").groupby("_key_part").map_groups(deltas, batch_format="pyarrow")


def funnel_stages(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    out_col: str = "funnel_stage",
    n_key_parts: int = 64,
):
    """Ordered funnel / sequence analysis: how far each key progressed
    through ``steps`` IN ORDER — stage k means the first step-k event
    STRICTLY after the key's first step-(k-1) event exists (the classic
    product-analytics funnel; each later step must follow the earlier
    one in time, not merely exist).

    Same shape as :func:`rolling_mean_per_key`: ONE coarse hash shuffle
    (key % n_key_parts), then each partition computes every key's stage
    with segment-vectorized numpy — per step, a masked
    ``np.minimum.reduceat`` finds each key's first qualifying timestamp,
    broadcast back with ``np.repeat`` for the next step's strict-after
    mask.  len(steps) reduceat passes, no per-key Python.

    SQL twin: a chain of ``min(ts) ... WHERE ts > prev`` CTEs LEFT-JOINed
    onto the distinct keys (mirrored strict inequality)."""

    def part_key(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    def stages(part: pa.Table) -> pa.Table:
        out_schema = pa.schema([part.schema.field(key_col), pa.field(out_col, pa.int64())])
        n = part.num_rows
        if n == 0:
            return out_schema.empty_table()
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        types = part.column(type_col).to_pandas().to_numpy()
        order = np.argsort(keys, kind="stable")
        keys, ts, types = keys[order], ts[order], types[order]
        seg_start = np.concatenate(([True], keys[1:] != keys[:-1]))
        bounds = np.flatnonzero(seg_start)
        seg_len = np.diff(np.append(bounds, n))
        prev = np.full(len(bounds), -np.inf)  # stage-0 threshold: any time qualifies
        stage = np.zeros(len(bounds), np.int64)
        alive = np.ones(len(bounds), bool)
        for step in steps:
            # first ts of this step type STRICTLY after the key's previous-step ts
            cand = np.where((types == step) & (ts > np.repeat(prev, seg_len)), ts, np.inf)
            first = np.minimum.reduceat(cand, bounds)
            first[seg_len == 0] = np.inf  # reduceat quirk guard (cannot occur: segments non-empty)
            reached = alive & np.isfinite(first)
            stage[reached] += 1
            alive = reached
            prev = np.where(reached, first, prev)
        return pa.table({key_col: pa.array(keys[bounds]).cast(out_schema.field(key_col).type), out_col: pa.array(stage, pa.int64())})

    return ds.map_batches(part_key, batch_format="pyarrow").groupby("_key_part").map_groups(stages, batch_format="pyarrow")


def percent_rank_per_key(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "pct_rank_6dp",
    n_bins: int = 4096,
    n_parts: int = 64,
    scale: int = 1_000_000,
):
    """Distributed ``percent_rank() OVER (PARTITION BY key ORDER BY
    value)`` — the global-ordering window op, computed WITHOUT a global
    sort materialization: range-partition by value bin (one tiny global
    min/max aggregate), collect the bounded per-(key, bin) count table
    to the driver, exclusive-scan it into per-(key, partition) base
    ranks, then each partition computes exact min-ranks locally
    (lexsort + first-of-equal-run) and adds its broadcast base.  Ties
    can never span partitions (equal values share a bin, bins never
    split across partitions), so min-rank tie semantics are exact.

    Emits ``round(scale * (rank-1)/(n_key-1))`` as int64 (0 when the
    key has a single row, matching SQL percent_rank); the division is
    the same exact-int double division DuckDB evaluates, so the scaled
    value is bit-identical and the oracle hash-compare exact."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    stats = ds.aggregate(Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi"))
    lo = float(stats["lo"] or 0.0)
    hi = float(stats["hi"] or 0.0)
    width = (hi - lo) / float(n_bins)
    bins_per_part = -(-n_bins // n_parts)  # ceil

    def bins_of(v: np.ndarray) -> np.ndarray:
        if width == 0.0:
            return np.zeros(len(v), np.int64)
        return np.minimum(np.floor((v - lo) / width), n_bins - 1).astype(np.int64)

    def count_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"_key": pa.array([], pa.string()), "_bin": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        df = pd.DataFrame({"_key": t.column(key_col).to_pandas(), "_bin": b})
        g = df.groupby(["_key", "_bin"], as_index=False).size()
        return pa.table(
            {
                "_key": pa.array(g["_key"], pa.string()),
                "_bin": pa.array(g["_bin"].to_numpy(), pa.int64()),
                "c": pa.array(g["size"].to_numpy(), pa.int64()),
            }
        )

    cnt = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby(["_key", "_bin"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )  # bounded: |keys| x occupied bins — category keys, never corpus-sized
    keys_sorted = sorted(cnt["_key"].unique())
    key_arr = pa.array(keys_sorted, pa.string())
    n_keys = len(keys_sorted)
    ki = pd.Categorical(cnt["_key"], categories=keys_sorted).codes.astype(np.int64)
    pi = (cnt["_bin"].to_numpy() // bins_per_part).astype(np.int64)
    # base[k, p] = count of key-k rows in bins strictly below partition p's range
    per_part = np.zeros((n_keys, n_parts), np.int64)
    np.add.at(per_part, (ki, pi), cnt["c"].to_numpy())
    totals = per_part.sum(axis=1)
    base = np.zeros((n_keys, n_parts + 1), np.int64)
    base[:, 1:] = np.cumsum(per_part, axis=1)

    def part_key(t: pa.Table) -> pa.Table:
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        return t.append_column("_vpart", pa.array((b // bins_per_part).astype(np.int32), pa.int32()))

    def rank_part(part: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                part.schema.field(id_col),
                part.schema.field(key_col),
                pa.field(out_col, pa.int64()),
            ]
        )
        n = part.num_rows
        if n == 0:
            return out_schema.empty_table()
        pid = int(part.column("_vpart")[0].as_py())
        # tiny-table code lookup via pc.index_in — no per-row Python
        kcodes = pc.index_in(part.column(key_col).combine_chunks(), value_set=key_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, kcodes))
        kc, v = kcodes[order], vals[order]
        seg_start = np.concatenate(([True], kc[1:] != kc[:-1]))
        run_start = seg_start | np.concatenate(([True], v[1:] != v[:-1]))
        idx = np.arange(n)
        seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
        run_first = np.maximum.accumulate(np.where(run_start, idx, 0))
        local_minrank = run_first - seg_first  # 0-based min-rank within (key, partition)
        grank = base[kc, pid] + local_minrank + 1
        denom = totals[kc] - 1
        pr = np.where(denom > 0, (grank - 1) / np.maximum(denom, 1), 0.0) * float(scale)
        pri = (np.sign(pr) * np.floor(np.abs(pr) + 0.5)).astype(np.int64)  # DuckDB round: half away
        ids = pc.take(part.column(id_col).combine_chunks(), pa.array(order))
        keys_out = pc.take(part.column(key_col).combine_chunks(), pa.array(order))
        return pa.Table.from_arrays([ids, keys_out, pa.array(pri, pa.int64())], schema=out_schema)

    return (
        ds.map_batches(part_key, batch_format="pyarrow")
        .groupby("_vpart")
        .map_groups(rank_part, batch_format="pyarrow")
    )


def _extreme_per_group_indices(
    t: pa.Table, key_cols: list[str], order_cols: list[str], keep: str = "last"
) -> np.ndarray:
    """Row indices of the FIRST or LAST row per composite key under
    ascending ``order_cols`` order.  String keys are dictionary-encoded
    to int codes (grouping needs equality, not lexicographic order);
    string ORDER columns are ordinal-encoded via ``np.unique`` (whose
    inverse codes are rank-ordered, preserving lexicographic order) so
    the lexsort runs on ints."""
    import pyarrow.compute as pc

    kcs = []
    for c in key_cols:
        col = t.column(c).combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = pc.dictionary_encode(col).indices
        kcs.append(col.to_numpy(zero_copy_only=False))
    ocs = []
    for c in order_cols:
        col = t.column(c).combine_chunks()
        arr = col.to_numpy(zero_copy_only=False)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            arr = np.unique(arr, return_inverse=True)[1]
        ocs.append(arr)
    order = np.lexsort(tuple(reversed(ocs)) + tuple(reversed(kcs)))
    n = len(order)
    seg_start = np.zeros(n, bool)
    seg_start[0] = True
    for k in kcs:
        sk = k[order]
        seg_start[1:] |= sk[1:] != sk[:-1]
    if keep == "first":
        return order[seg_start]
    seg_end = np.concatenate((seg_start[1:], [True]))  # last row of each key segment
    return order[seg_end]


def _last_per_group_indices(t: pa.Table, key_cols: list[str], order_cols: list[str]) -> np.ndarray:
    return _extreme_per_group_indices(t, key_cols, order_cols, keep="last")


def latest_per_key(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    part_col: str,
    n_key_parts: int = 64,
):
    """Latest-state compaction (CDC upsert semantics): per composite key,
    keep the single row that is LAST in ascending ``order_cols`` order —
    ``row_number() OVER (PARTITION BY keys ORDER BY order DESC) = 1``.
    The classic changelog→snapshot materialization the reference's
    cached-rerun store implies (latest fetch wins per URL).

    Scale shape: a per-batch PRE-PRUNE keeps only the batch-local winner
    per key before the shuffle (the partial-aggregate trick — the
    exchange carries at most |distinct keys in batch| rows per input
    batch, not the changelog), then one coarse hash shuffle on
    ``part_col`` (an integer DETERMINED BY the key — a member of
    ``key_cols`` or a hash of it; a partition holds complete part_col
    groups, hence complete composite-key groups) and a
    segment-vectorized final pick.  No per-key Python calls."""
    return _pick_per_key(ds, key_cols, order_cols, part_col, n_key_parts, keep="last")


def first_per_key(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    part_col: str,
    n_key_parts: int = 64,
):
    """First-wins compaction — ``row_number() OVER (PARTITION BY keys
    ORDER BY order ASC) = 1``: per composite key, keep the single row
    that is FIRST in ascending ``order_cols`` order (the crawl
    admission's earliest-discovery-wins link dedup).  Same scale shape
    as :func:`latest_per_key` (batch-local pre-prune, one coarse hash
    exchange, segment-vectorized pick — no per-key Python calls)."""
    return _pick_per_key(ds, key_cols, order_cols, part_col, n_key_parts, keep="first")


def _pick_per_key(ds, key_cols, order_cols, part_col, n_key_parts, keep):
    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_key_part", pa.array([], pa.int32()))
        idx = _extreme_per_group_indices(batch, key_cols, order_cols, keep)
        out = batch.take(pa.array(np.sort(idx)))
        k = out.column(part_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return out.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    def compact(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_key_part"])
        if part.num_rows == 0:
            return part
        idx = _extreme_per_group_indices(part, key_cols, order_cols, keep)
        return part.take(pa.array(np.sort(idx)))

    return (
        ds.map_batches(prune, batch_format="pyarrow").groupby("_key_part").map_groups(compact, batch_format="pyarrow")
    )


def cumsum_per_key(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_c",
    scale: int = 100,
    n_key_parts: int = 64,
):
    """Running total per key — ``SUM(round(value*scale)::BIGINT) OVER
    (PARTITION BY key ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``.
    Values are scaled to int64 (half-away, the DuckDB round) BEFORE the
    scan so the running sums are exact integers (order-independent —
    no float re-association drift at any corpus size).  Same shape as
    :func:`rolling_mean_per_key`: one coarse hash shuffle on the int
    key, then one global ``np.cumsum`` per partition with segment-start
    offsets subtracted (no per-key Python calls)."""
    import pyarrow.compute as pc

    def part_key(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    def scan(part: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [part.schema.field(key_col)]
            + [part.schema.field(c) for c in order_cols]
            + [pa.field(out_col, pa.int64())]
        )
        n = part.num_rows
        if n == 0:
            return out_schema.empty_table()
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        orders = [part.column(c).combine_chunks().to_numpy(zero_copy_only=False) for c in order_cols]
        m = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64) * float(scale)
        v = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
        order = np.lexsort(tuple(reversed(orders)) + (keys,))
        k, v = keys[order], v[order]
        idx = np.arange(n)
        seg_start = np.concatenate(([True], k[1:] != k[:-1]))
        seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
        cs = np.cumsum(v)
        run = cs - (cs[seg_first] - v[seg_first])  # within-segment inclusive scan
        take = pa.array(order)
        arrays = [pc.take(part.column(key_col).combine_chunks(), take)]
        for c in order_cols:
            arrays.append(pc.take(part.column(c).combine_chunks(), take))
        arrays.append(pa.array(run, pa.int64()))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return ds.map_batches(part_key, batch_format="pyarrow").groupby("_key_part").map_groups(scan, batch_format="pyarrow")


def ntile_per_key(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 4,
    out_col: str = "tile",
    n_bins: int = 4096,
    n_parts: int = 64,
):
    """Distributed ``ntile(k) OVER (PARTITION BY key ORDER BY value,
    id)`` — equal-frequency binning per key without a global sort
    materialization.  Same machinery as :func:`percent_rank_per_key`
    (value-range partitions + a bounded per-(key, bin) count table
    scanned on the driver into per-partition base offsets), except the
    local pass computes the UNIQUE row_number (tie-broken by ``id_col``;
    equal values share a bin so an order-by-(value, id) row_number never
    splits across partitions), then the exact SQL NTILE size formula:
    the first ``n % k`` tiles get ``n//k + 1`` rows, the rest ``n//k``."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    stats = ds.aggregate(Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi"))
    lo = float(stats["lo"] or 0.0)
    hi = float(stats["hi"] or 0.0)
    width = (hi - lo) / float(n_bins)
    bins_per_part = -(-n_bins // n_parts)  # ceil

    def bins_of(v: np.ndarray) -> np.ndarray:
        if width == 0.0:
            return np.zeros(len(v), np.int64)
        return np.minimum(np.floor((v - lo) / width), n_bins - 1).astype(np.int64)

    def count_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"_key": pa.array([], pa.string()), "_bin": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        df = pd.DataFrame({"_key": t.column(key_col).to_pandas(), "_bin": b})
        g = df.groupby(["_key", "_bin"], as_index=False).size()
        return pa.table(
            {
                "_key": pa.array(g["_key"], pa.string()),
                "_bin": pa.array(g["_bin"].to_numpy(), pa.int64()),
                "c": pa.array(g["size"].to_numpy(), pa.int64()),
            }
        )

    cnt = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby(["_key", "_bin"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )  # bounded: |keys| x occupied bins — category keys, never corpus-sized
    keys_sorted = sorted(cnt["_key"].unique())
    key_arr = pa.array(keys_sorted, pa.string())
    n_keys = len(keys_sorted)
    ki = pd.Categorical(cnt["_key"], categories=keys_sorted).codes.astype(np.int64)
    pi = (cnt["_bin"].to_numpy() // bins_per_part).astype(np.int64)
    per_part = np.zeros((n_keys, n_parts), np.int64)
    np.add.at(per_part, (ki, pi), cnt["c"].to_numpy())
    totals = per_part.sum(axis=1)
    base = np.zeros((n_keys, n_parts + 1), np.int64)
    base[:, 1:] = np.cumsum(per_part, axis=1)

    def part_key(t: pa.Table) -> pa.Table:
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        return t.append_column("_vpart", pa.array((b // bins_per_part).astype(np.int32), pa.int32()))

    def tile_part(part: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [part.schema.field(id_col), part.schema.field(key_col), pa.field(out_col, pa.int64())]
        )
        n = part.num_rows
        if n == 0:
            return out_schema.empty_table()
        pid = int(part.column("_vpart")[0].as_py())
        kcodes = pc.index_in(part.column(key_col).combine_chunks(), value_set=key_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ids = part.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, vals, kcodes))
        kc = kcodes[order]
        idx = np.arange(n)
        seg_start = np.concatenate(([True], kc[1:] != kc[:-1]))
        seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
        rn = base[kc, pid] + (idx - seg_first) + 1  # exact global row_number
        nn = totals[kc]
        q, r = nn // k, nn % k
        cut = r * (q + 1)
        tile = np.where(
            rn <= cut,
            (rn + q) // (q + 1),
            r + (rn - cut + np.maximum(q, 1) - 1) // np.maximum(q, 1),
        )
        take = pa.array(order)
        return pa.Table.from_arrays(
            [
                pc.take(part.column(id_col).combine_chunks(), take),
                pc.take(part.column(key_col).combine_chunks(), take),
                pa.array(tile.astype(np.int64), pa.int64()),
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(part_key, batch_format="pyarrow")
        .groupby("_vpart")
        .map_groups(tile_part, batch_format="pyarrow")
    )


def dense_rank_per_key(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "drank",
    n_bins: int = 4096,
    n_parts: int = 64,
):
    """Distributed ``dense_rank() OVER (PARTITION BY key ORDER BY
    value)`` — three exchanges, none a global sort:

    1. distinct (key, value) pairs (batch-local dedup partials → one
       groupby — the combiner trick, so the exchange carries distinct
       pairs, not rows);
    2. the percent_rank machinery over the DISTINCT pairs: bounded
       per-(key, bin) count table → broadcast base offsets → local
       sorted position; row_number over distinct values IS the dense
       rank (ties collapsed by construction, and equal values share a
       bin so a rank never splits across partitions);
    3. one hash join of the input rows back to their (key, value) rank.

    Returns (id_col, key_col, out_col)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    stats = ds.aggregate(Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi"))
    lo = float(stats["lo"] or 0.0)
    hi = float(stats["hi"] or 0.0)
    width = (hi - lo) / float(n_bins)
    bins_per_part = -(-n_bins // n_parts)  # ceil

    def bins_of(v: np.ndarray) -> np.ndarray:
        if width == 0.0:
            return np.zeros(len(v), np.int64)
        return np.minimum(np.floor((v - lo) / width), n_bins - 1).astype(np.int64)

    def local_distinct(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: t.column(key_col).to_pandas(),
                value_col: t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby([key_col, value_col])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )

    def count_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"_key": pa.array([], pa.string()), "_bin": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        df = pd.DataFrame({"_key": t.column(key_col).to_pandas(), "_bin": b})
        g = df.groupby(["_key", "_bin"], as_index=False).size()
        return pa.table(
            {
                "_key": pa.array(g["_key"], pa.string()),
                "_bin": pa.array(g["_bin"].to_numpy(), pa.int64()),
                "c": pa.array(g["size"].to_numpy(), pa.int64()),
            }
        )

    # the distinct dataset is consumed by BOTH the count pass and the rank
    # pass — materialize once so neither branch recomputes the dedup
    # exchange (and Ray's diamond-DAG join hazard never sees live aliasing)
    distinct = distinct.materialize()
    cnt = (
        distinct.map_batches(count_partials, batch_format="pyarrow")
        .groupby(["_key", "_bin"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )  # bounded: |keys| x occupied bins
    keys_sorted = sorted(cnt["_key"].unique())
    key_arr = pa.array(keys_sorted, pa.string())
    n_keys = len(keys_sorted)
    ki = pd.Categorical(cnt["_key"], categories=keys_sorted).codes.astype(np.int64)
    pi = (cnt["_bin"].to_numpy() // bins_per_part).astype(np.int64)
    per_part = np.zeros((n_keys, n_parts), np.int64)
    np.add.at(per_part, (ki, pi), cnt["c"].to_numpy())
    base = np.zeros((n_keys, n_parts + 1), np.int64)
    base[:, 1:] = np.cumsum(per_part, axis=1)

    def part_key(t: pa.Table) -> pa.Table:
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        return t.append_column("_vpart", pa.array((b // bins_per_part).astype(np.int32), pa.int32()))

    rank_schema = pa.schema([(key_col, pa.string()), ("_rv", pa.float64()), (out_col, pa.int64())])

    def rank_part(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return rank_schema.empty_table()
        pid = int(part.column("_vpart")[0].as_py())
        kcodes = pc.index_in(part.column(key_col).combine_chunks(), value_set=key_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, kcodes))
        kc = kcodes[order]
        idx = np.arange(n)
        seg_start = np.concatenate(([True], kc[1:] != kc[:-1]))
        seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
        rn = base[kc, pid] + (idx - seg_first) + 1  # row_number over DISTINCT values == dense rank
        return pa.Table.from_arrays(
            [
                pc.take(part.column(key_col).combine_chunks(), pa.array(order)).cast(pa.string()),
                pa.array(vals[order], pa.float64()),
                pa.array(rn, pa.int64()),
            ],
            schema=rank_schema,
        )

    ranks = (
        distinct.map_batches(part_key, batch_format="pyarrow")
        .groupby("_vpart")
        .map_groups(rank_part, batch_format="pyarrow")
        .repartition(max(2, n_parts // 4))  # scrub empty-partition blocks before the join
    )

    def left_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                key_col: t.column(key_col).cast(pa.string()),
                "_lv": t.column(value_col).cast(pa.float64()),
            }
        )

    left = ds.map_batches(left_prep, batch_format="pyarrow")
    joined = left.join(
        ranks,
        join_type="inner",  # every (key, value) exists in the rank table by construction
        num_partitions=max(2, n_parts // 4),
        on=(key_col, "_lv"),
        right_on=(key_col, "_rv"),
    )
    return joined.select_columns([id_col, key_col, out_col])


def exact_order_stats_per_key(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    quarters: tuple = (1, 2, 3),
    out_col: str = "value",
    n_bins: int = 4096,
    n_parts: int = 64,
    denom: int = 4,
):
    """EXACT per-key order statistics (p25/p50/p75 as lower order stats,
    ``rank_q = floor((n-1)·q/denom) + 1`` — denom=4 for quartiles, 3 for
    the CCNet-style tertiles) — no global sort, no sketch
    approximation: the same value-range machinery as
    :func:`percent_rank_per_key` assigns every row its exact global
    row_number (ordered by value, tie-broken by ``id_col``; ties share
    a bin so numbering never splits across partitions), and each
    partition emits only its rows whose row_number hits one of the
    key's target ranks.  The exchange carries the full table once; the
    result is |keys| × |quarters| rows.  All rank arithmetic is integer
    (q/4 as ``(n-1)*q // 4``), mirrored verbatim in the SQL twin."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    stats = ds.aggregate(Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi"))
    lo = float(stats["lo"] or 0.0)
    hi = float(stats["hi"] or 0.0)
    width = (hi - lo) / float(n_bins)
    bins_per_part = -(-n_bins // n_parts)

    def bins_of(v: np.ndarray) -> np.ndarray:
        if width == 0.0:
            return np.zeros(len(v), np.int64)
        return np.minimum(np.floor((v - lo) / width), n_bins - 1).astype(np.int64)

    def count_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"_key": pa.array([], pa.string()), "_bin": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        df = pd.DataFrame({"_key": t.column(key_col).to_pandas(), "_bin": b})
        g = df.groupby(["_key", "_bin"], as_index=False).size()
        return pa.table(
            {
                "_key": pa.array(g["_key"], pa.string()),
                "_bin": pa.array(g["_bin"].to_numpy(), pa.int64()),
                "c": pa.array(g["size"].to_numpy(), pa.int64()),
            }
        )

    cnt = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby(["_key", "_bin"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    keys_sorted = sorted(cnt["_key"].unique())
    key_arr = pa.array(keys_sorted, pa.string())
    n_keys = len(keys_sorted)
    ki = pd.Categorical(cnt["_key"], categories=keys_sorted).codes.astype(np.int64)
    pi = (cnt["_bin"].to_numpy() // bins_per_part).astype(np.int64)
    per_part = np.zeros((n_keys, n_parts), np.int64)
    np.add.at(per_part, (ki, pi), cnt["c"].to_numpy())
    totals = per_part.sum(axis=1)
    base = np.zeros((n_keys, n_parts + 1), np.int64)
    base[:, 1:] = np.cumsum(per_part, axis=1)

    def part_key(t: pa.Table) -> pa.Table:
        b = bins_of(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        return t.append_column("_vpart", pa.array((b // bins_per_part).astype(np.int32), pa.int32()))

    out_schema = pa.schema([(key_col, pa.string()), ("quarter", pa.int64()), (out_col, pa.float64())])

    def pick_part(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return out_schema.empty_table()
        pid = int(part.column("_vpart")[0].as_py())
        kcodes = pc.index_in(part.column(key_col).combine_chunks(), value_set=key_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ids = part.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, vals, kcodes))
        kc = kcodes[order]
        idx = np.arange(n)
        seg_start = np.concatenate(([True], kc[1:] != kc[:-1]))
        seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
        rn = base[kc, pid] + (idx - seg_first) + 1
        nn = totals[kc]
        keys_out, quarters_out, vals_out = [], [], []
        sv = vals[order]
        for q in quarters:
            target = ((nn - 1) * q) // denom + 1  # exact integer rank arithmetic
            hit = rn == target
            keys_out.append(pc.take(part.column(key_col).combine_chunks(), pa.array(order[hit])))
            quarters_out.append(np.full(int(hit.sum()), q, np.int64))
            vals_out.append(sv[hit])
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in keys_out]).cast(pa.string()),
                pa.array(np.concatenate(quarters_out), pa.int64()),
                pa.array(np.concatenate(vals_out), pa.float64()),
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(part_key, batch_format="pyarrow")
        .groupby("_vpart")
        .map_groups(pick_part, batch_format="pyarrow")
    )


def rolling_median_per_key(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 5,
    out_col: str = "med_x2_c",
    scale: int = 100,
    n_key_parts: int = 64,
):
    """ROWS window-1 PRECEDING..CURRENT rolling MEDIAN per key — the
    order-statistic window op (robust smoothing; not expressible as a
    running sum).  Same shape as :func:`rolling_mean_per_key`: one
    coarse hash shuffle, then segment-vectorized numpy inside — the
    sliding frame is materialized as an (n x window) staircase matrix
    (one shifted column per lag, invalid lags masked to a +inf
    sentinel), one row-wise ``np.sort``, and the two middle order
    statistics picked per row.

    EXACTNESS: values are scaled to int64 centi-units first (the repo's
    ``round(value*scale)`` convention), and the output is ``lo + hi`` —
    exactly TWICE the interpolated median — which is always an integer
    (odd frame: 2*mid; even frame: the two middles' sum).  No float
    interpolation exists on either engine's side: the SQL twin computes
    ``CAST(2 * median(vc) OVER w AS BIGINT)`` where the only non-integer
    intermediate is an exact x.5 double."""

    def part_key(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column("_key_part", pa.array((k % n_key_parts).astype(np.int32), pa.int32()))

    SENTINEL = np.int64(2**62)

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
        fv = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64) * scale
        vals = (np.sign(fv) * np.floor(np.abs(fv) + 0.5)).astype(np.int64)  # half-away, like DuckDB round()
        sort_idx = np.lexsort(tuple(reversed(orders)) + (keys,))
        keys, vals = keys[sort_idx], vals[sort_idx]
        orders = [o[sort_idx] for o in orders]
        seg_start = np.concatenate(([True], keys[1:] != keys[:-1]))
        idx = np.arange(n)
        pos = idx - np.maximum.accumulate(np.where(seg_start, idx, 0))
        k_frame = np.minimum(pos + 1, window)
        m = np.full((n, window), SENTINEL, np.int64)
        for d in range(window):
            valid = pos >= d
            m[valid, d] = vals[idx[valid] - d]
        m.sort(axis=1)
        lo = m[idx, (k_frame - 1) // 2]
        hi = m[idx, k_frame // 2]
        cols = {key_col: keys, out_col: lo + hi}
        for c, o in zip(order_cols, orders):
            cols[c] = o
        return pa.Table.from_arrays([pa.array(cols[f.name]).cast(f.type) for f in out_schema], schema=out_schema)

    return ds.map_batches(part_key, batch_format="pyarrow").groupby("_key_part").map_groups(windows, batch_format="pyarrow")
