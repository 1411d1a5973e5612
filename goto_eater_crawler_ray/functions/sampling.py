"""Deterministic sampling / dataset-split operators.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible across runs and cluster widths, (b) computable per batch
with NO shuffle or global state, and (c) stable under re-partitioning —
so membership must be a pure function of the row's key, never of
position or randomness.  The standard trick: hash the key into buckets
and take bucket ranges (the same idea behind
`tf.data`-style hash splits and DuckDB/BigQuery `hash(key) % N`
sampling).

The bucket hash is md5 of the key's decimal string, first 8 bytes
little-endian — EXACTLY DuckDB's ``md5_number_upper(CAST(k AS VARCHAR))``
— so every operator here has an exact SQL twin and the driver's oracle
gate hash-checks membership, not just counts.  (One md5 per ROW, not per
token: documents are the unit, and the cost is the same as the
`fingerprint` content-addressing pass.)

At 100 TB each operator is a stateless `map_batches` filter: zero
exchange, prunes at the earliest stage it is applied to.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def md5_u64(vals) -> np.ndarray:
    """Raw 64-bit key hash — md5(str(v)) first 8 bytes LE, EXACTLY
    DuckDB's ``md5_number_upper(CAST(v AS VARCHAR))`` (uint64)."""
    if isinstance(vals, (pa.Array, pa.ChunkedArray)):
        vals = vals.to_pylist()
    out = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        out[i] = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
    return out


def md5_buckets(vals, mod: int = 100) -> np.ndarray:
    """Deterministic bucket in [0, mod) per value — md5(str(v)) first 8
    bytes LE, the value DuckDB's ``md5_number_upper(CAST(v AS VARCHAR))``
    yields, reduced mod `mod`."""
    return (md5_u64(vals) % np.uint64(mod)).astype(np.int64)


def hash_sample(ds, id_col: str, pct: int, mod: int = 100):
    """Keep rows whose key bucket < pct (a deterministic ~pct% sample).
    SQL twin: ``WHERE md5_number_upper(CAST(id AS VARCHAR)) % mod < pct``."""

    def fn(t: pa.Table) -> pa.Table:
        b = md5_buckets(t.column(id_col), mod)
        return t.append_column("bucket", pa.array(b, pa.int64())).filter(pa.array(b < pct))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_split(ds, id_col: str, splits: list[tuple[str, int]], mod: int = 100):
    """Assign every row a split label from cumulative bucket ranges, e.g.
    ``[("train", 80), ("val", 10), ("test", 10)]`` (must sum to mod).
    Disjoint, exhaustive, reproducible at any width/partitioning."""
    if sum(w for _, w in splits) != mod:
        raise ValueError(f"split weights must sum to mod={mod}")
    names = [n for n, _ in splits]
    bounds = np.cumsum([w for _, w in splits])

    def fn(t: pa.Table) -> pa.Table:
        b = md5_buckets(t.column(id_col), mod)
        lab = np.array(names, dtype=object)[np.searchsorted(bounds, b, side="right")]
        return t.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_topk(ds, id_col: str, weight_col: str, k: int, scale: int = 1_000_000_000):
    """Deterministic weighted sampling WITHOUT replacement, k items —
    Efraimidis–Spirakis A-Res (the standard distributed weighted
    reservoir): each row gets priority ``u ** (1/w)`` where ``u`` is a
    hash-derived uniform in [0,1) (md5 of the key — reproducible across
    runs, widths and partitionings, like every sampler in this module),
    and the sample is the global top-k by priority.  The quality- /
    length-weighted corpus subsample op.

    Shape: priorities are batch-local, a per-batch top-k prune bounds
    the exchange to O(blocks*k) rows, and one tiny sort+limit finishes —
    the corpus never shuffles.  SQL twin: the identical
    ``pow(md5_number_upper(...) % 2^53 / 2^53, 1/w)`` expression with
    ORDER BY ... LIMIT k; priority emitted as a scaled int so the hash
    compare is float-exact."""
    M = float(1 << 53)

    def pri(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        keep = w > 0  # zero/negative weight = never sampled (matches the twin's WHERE)
        t = t.filter(pa.array(keep))
        w = w[keep]
        u = (md5_u64(t.column(id_col)) % np.uint64(1 << 53)).astype(np.float64) / M
        p = np.power(u, 1.0 / w)
        return pa.table(
            {
                id_col: t.column(id_col),
                "weight": t.column(weight_col).cast(pa.int64()),
                "p": pa.array(p, pa.float64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        order = np.lexsort((t.column(id_col).to_numpy(zero_copy_only=False), -t.column("p").to_numpy()))[:k]
        return t.take(pa.array(order))

    out = (
        ds.map_batches(pri, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["p", id_col], descending=[True, False])
        .limit(k)
    )

    def finish(t: pa.Table) -> pa.Table:
        p = t.column("p").to_numpy() * float(scale)
        pi = (np.sign(p) * np.floor(np.abs(p) + 0.5)).astype(np.int64)  # DuckDB round: half away
        return pa.table(
            {
                id_col: t.column(id_col),
                "weight": t.column("weight"),
                "priority_9dp": pa.array(pi, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def sample_topk_per_group(ds, key_col: str, id_col: str, k: int):
    """Deterministic fixed-k sample PER GROUP — the 'k examples per class'
    sampler (eval-set construction, per-source corpus capping): each row's
    priority is the md5 hash of its id (reproducible across runs, widths
    and partitionings, like every sampler in this module), and each group
    keeps its k smallest-priority rows, ranked.

    Shape: priorities are batch-local and a vectorized per-(batch, key)
    top-k prune runs BEFORE the exchange, so the shuffle carries
    O(blocks * groups * k) rows, never the corpus; the final per-group
    top-k is one groupby over the pruned rows (groups = the bounded
    category set).  SQL twin: ``row_number() OVER (PARTITION BY key ORDER
    BY md5_number_upper(CAST(id AS VARCHAR)), id) <= k``."""

    out_schema = pa.schema([(key_col, pa.string()), (id_col, pa.int64()), ("rk", pa.int64())])

    def pri_prune(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.schema([(key_col, pa.string()), (id_col, pa.int64()), ("_pri", pa.uint64())]).empty_table()
        h = md5_u64(t.column(id_col))
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(t.column(key_col).to_pandas(), sort=False)
        order = np.lexsort((ids, h, codes))
        sk = codes[order]
        seg_start = np.concatenate(([True], sk[1:] != sk[:-1]))
        pos = np.arange(n)
        rank_in_seg = pos - np.maximum.accumulate(np.where(seg_start, pos, 0))
        keep_idx = order[rank_in_seg < k]
        kept = t.take(pa.array(keep_idx))
        return pa.table(
            {
                key_col: kept.column(key_col).cast(pa.string()),
                id_col: kept.column(id_col).cast(pa.int64()),
                "_pri": pa.array(h[keep_idx], pa.uint64()),
            }
        )

    def group_topk(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        h = part.column("_pri").to_numpy(zero_copy_only=False)
        ids = part.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        kept = part.take(pa.array(order))
        return pa.table(
            {
                key_col: kept.column(key_col),
                id_col: kept.column(id_col),
                "rk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
            },
            schema=out_schema,
        )

    return ds.map_batches(pri_prune, batch_format="pyarrow").groupby(key_col).map_groups(group_topk, batch_format="pyarrow")


def stratified_sample(ds, id_col: str, strata_col: str, rates: dict[str, int], default_pct: int = 0, mod: int = 100):
    """Per-stratum deterministic sampling: stratum s keeps rows with
    bucket < rates.get(s, default_pct).  The classic quality-weighted /
    language-balanced corpus downsample, still a stateless per-batch
    filter (rates ride the closure; no shuffle)."""

    def fn(t: pa.Table) -> pa.Table:
        b = md5_buckets(t.column(id_col), mod)
        strata = t.column(strata_col).to_pylist()
        thr = np.array([rates.get(s, default_pct) for s in strata], dtype=np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64())).filter(pa.array(b < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def temperature_thresholds(counts: dict[str, int], target: int, mod: int = 1_000_000) -> dict[str, int]:
    """Per-group hash thresholds for temperature-based mixture
    rebalancing at tau=0.5 (the XLM/mBERT language-sampling rule
    p_g ~ q_g^tau, Conneau & Lample 2019): group g with n_g rows gets an
    expected quota target * sqrt(n_g) / sum_h(sqrt(n_h)), i.e. keep rate
    min(1, quota / n_g) — low-resource groups are upsampled RELATIVELY
    (rate capped at 1: no replication), high-resource ones downsampled.

    Exactness contract with the SQL twin: s_g = floor(sqrt(n_g * 10^12))
    under IEEE double sqrt (both engines round the same product to the
    same double and sqrt is correctly rounded), then the threshold is
    pure integer arithmetic — floor(mod * target * s_g / (ssum * n_g)),
    capped at mod — so membership is bit-identical."""
    s = {g: int(np.floor(np.sqrt(np.float64(n * 10**12)))) for g, n in counts.items() if n > 0}
    ssum = sum(s.values())
    if not ssum:
        return {}
    return {g: min(mod, (mod * target * s[g]) // (ssum * counts[g])) for g in s}


def temperature_sample(ds, id_col: str, group_col: str, target: int, mod: int = 1_000_000):
    """Temperature (tau=0.5) mixture resampling over ``group_col``: one
    tiny per-group count aggregate (rows = #groups, taken to the driver
    — bounded by the group domain, documented), thresholds broadcast
    into a stateless per-batch hash filter; the corpus never shuffles.
    SQL twin: the same integer-exact thresholds via a grouped CTE and
    ``md5_number_upper(CAST(id AS VARCHAR)) % mod < thr``."""
    from ray.data.aggregate import Count

    counts = {
        r[group_col]: r["n"]
        for r in ds.groupby(group_col).aggregate(Count(alias_name="n")).take_all()
    }
    thr = temperature_thresholds(counts, target, mod)

    def fn(t: pa.Table) -> pa.Table:
        b = md5_u64(t.column(id_col)) % np.uint64(mod)
        groups = t.column(group_col).to_pylist()
        cut = np.array([thr.get(g, 0) for g in groups], dtype=np.uint64)
        return t.filter(pa.array(b < cut))

    return ds.map_batches(fn, batch_format="pyarrow")
