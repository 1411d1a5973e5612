"""Distributed approximate quantiles — mergeable fixed-bin histogram.

The scale path for percentiles over 100 TB: quantiles need a global view,
but an EXACT distributed quantile is a multi-pass sort; the standard
streaming answer is a mergeable sketch (t-digest, GK, or a fixed-bin
histogram).  The fixed-bin histogram is chosen here because it is
(a) one tiny aggregate per batch — a 1024-long int vector, vectorized
via ``np.bincount``; (b) exactly reproducible in ANSI SQL, so the DuckDB
oracle runs the SAME sketch and the driver's hash-compare is exact (the
oracle checks the distributed implementation, not a looser tolerance);
(c) error-bounded by bin width ((max-min)/n_bins), pytest-asserted
against ``np.percentile``.

Plan shape: one Min/Max/Count aggregate (pass 1) -> per-batch bincount
``map_batches`` + groupby(bin) Sum (pass 2) -> the 1024-row cumulative
table reduces driver-side.  Nothing proportional to the corpus ever
leaves the cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def histogram_quantiles(ds, col: str, pcts: list[int] | None = None, n_bins: int = 1024):
    """Approximate percentiles of ``ds[col]`` via an ``n_bins`` fixed-bin
    histogram.  Returns a small table (pct, bin, lo_c, hi_c) where ``bin``
    is the first histogram bin whose cumulative count reaches
    ``ceil(pct/100 * n)`` and lo_c/hi_c are the whole value range as
    scaled-int centi-units (so the result is float-rounding-proof for the
    oracle compare)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    if pcts is None:
        pcts = [50, 90, 99]

    # pass 1: exact global min/max/count (tiny aggregate)
    stats = ds.aggregate(
        rd.aggregate.Min(col, alias_name="lo"), rd.aggregate.Max(col, alias_name="hi"), rd.aggregate.Count(alias_name="n")
    )
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    width = (hi - lo) / float(n_bins)
    if n == 0 or width == 0.0:  # empty or constant column: everything is bin 0
        return pd.DataFrame(
            [{"pct": int(p), "bin": 0, "lo_c": int(round(lo * 100)), "hi_c": int(round(hi * 100))} for p in pcts]
        )

    def bin_counts(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        # same expression the SQL oracle evaluates: floor((v-lo)/width),
        # clamped into the last bin (the max value itself)
        b = np.minimum(np.floor((v - lo) / width), n_bins - 1).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(bins, pa.int64()), "c": pa.array(counts, pa.int64())})

    hist = ds.map_batches(bin_counts, batch_format="pyarrow").groupby("bin").aggregate(Sum("c", alias_name="c"))
    hdf = hist.to_pandas().sort_values("bin")  # <= n_bins rows: driver-safe by construction
    cum = hdf["c"].cumsum().to_numpy()
    bins_sorted = hdf["bin"].to_numpy()

    out = []
    for pct in pcts:
        rank = (pct * n + 99) // 100  # == ceil(pct*n/100) in pure ints (FP-identity-proof vs the SQL twin)
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append(
            {
                "pct": int(pct),
                "bin": int(bins_sorted[min(idx, len(bins_sorted) - 1)]) if len(bins_sorted) else 0,
                "lo_c": int(round(lo * 100)),
                "hi_c": int(round(hi * 100)),
            }
        )
    return pd.DataFrame(out)


def bin_to_value(bin_idx: int, lo: float, hi: float, n_bins: int = 1024) -> float:
    """Midpoint of a histogram bin — the sketch's value estimate, with
    error <= (hi-lo)/n_bins/2 + discretization."""
    width = (hi - lo) / float(n_bins)
    return lo + (bin_idx + 0.5) * width


def grouped_histogram_quantiles(ds, group_col: str, col: str, pcts: list[int] | None = None, n_bins: int = 256):
    """Per-GROUP approximate percentiles with the same mergeable fixed-bin
    sketch as :func:`histogram_quantiles` — the grouped form (percentile
    per event type / per host / per label).

    Assumes BOUNDED group cardinality (a closed category set): the pass-1
    per-group (lo, hi, n) table is collected to the driver and broadcast
    in the pass-2 closure — |groups| scalars, the legal kind of driver
    materialization.  The histogram exchange carries at most
    |groups|·n_bins rows, and the final per-group bin selection happens
    INSIDE a groupby.map_groups (nothing cumulative on the driver), so
    the shape survives many groups even though pass 1 would not.

    The SQL twin evaluates the identical bin expression
    ``least(floor((v-lo)/((hi-lo)/n_bins)), n_bins-1)`` per group and the
    identical pure-integer rank ``(pct*n+99)//100``, so the hash compare
    is exact."""
    from ray.data.aggregate import Count, Max, Min, Sum

    if pcts is None:
        pcts = [50, 90, 99]

    stats_rows = ds.groupby(group_col).aggregate(
        Min(col, alias_name="lo"), Max(col, alias_name="hi"), Count(alias_name="n")
    ).take_all()
    params = {r[group_col]: (float(r["lo"]), float(r["hi"]), int(r["n"])) for r in stats_rows}

    key_is_str = isinstance(next(iter(params), ""), str)  # empty input -> string key, empty result below
    key_type = pa.string() if key_is_str else pa.int64()
    hist_schema = pa.schema([(group_col, key_type), ("bin", pa.int64()), ("c", pa.int64())])

    def bin_counts(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, col]).to_pandas()
        gs, bs, cs = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            lo, hi, _ = params[g]
            width = (hi - lo) / float(n_bins)
            v = sub[col].to_numpy(dtype=np.float64)
            if width == 0.0:
                b = np.zeros(len(v), dtype=np.int64)
            else:
                b = np.minimum(np.floor((v - lo) / width), n_bins - 1).astype(np.int64)
            bins, counts = np.unique(b, return_counts=True)
            gs.extend([g] * len(bins))
            bs.extend(bins.tolist())
            cs.extend(counts.tolist())
        return pa.table({group_col: pa.array(gs, key_type), "bin": pa.array(bs, pa.int64()), "c": pa.array(cs, pa.int64())})

    hist = ds.map_batches(bin_counts, batch_format="pyarrow").groupby([group_col, "bin"]).aggregate(Sum("c", alias_name="c"))

    out_schema = pa.schema(
        [(group_col, key_type), ("pct", pa.int64()), ("bin", pa.int64()), ("lo_c", pa.int64()), ("hi_c", pa.int64())]
    )

    def pick(gtbl: pa.Table) -> pa.Table:
        if gtbl.num_rows == 0:
            return out_schema.empty_table()
        g = gtbl.column(group_col)[0].as_py()
        lo, hi, n = params[g]
        hdf = gtbl.to_pandas().sort_values("bin")
        cum = hdf["c"].cumsum().to_numpy()
        bins_sorted = hdf["bin"].to_numpy()
        rows = {group_col: [], "pct": [], "bin": [], "lo_c": [], "hi_c": []}
        for pct in pcts:
            rank = (pct * n + 99) // 100
            idx = int(np.searchsorted(cum, rank, side="left"))
            rows[group_col].append(g)
            rows["pct"].append(int(pct))
            rows["bin"].append(int(bins_sorted[min(idx, len(bins_sorted) - 1)]))
            # DuckDB round() is half AWAY from zero; Python round() is
            # half-to-even — match DuckDB explicitly so extrema landing
            # exactly on .5 centi-units don't hash-mismatch
            rows["lo_c"].append(int(np.sign(lo * 100) * np.floor(abs(lo * 100) + 0.5)))
            rows["hi_c"].append(int(np.sign(hi * 100) * np.floor(abs(hi * 100) + 0.5)))
        return pa.Table.from_arrays([pa.array(rows[f.name], f.type) for f in out_schema], schema=out_schema)

    return hist.groupby(group_col).map_groups(pick, batch_format="pyarrow")
