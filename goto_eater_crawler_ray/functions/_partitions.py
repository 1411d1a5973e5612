"""Shared shuffle-partition sizing (repo convention)."""

from __future__ import annotations

# the box the literal caps were tuned on; a bigger cluster scales them up
_BASELINE_CPUS = 32


def _cluster_cpus() -> int:
    """Total CPUs in the Ray cluster (the multi-node scale knob); falls
    back to the tuning baseline when Ray isn't up yet (schema probes,
    unit tests)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or _BASELINE_CPUS
    except Exception:
        pass
    return _BASELINE_CPUS


def auto_num_partitions(n_rows: int, cap: int = 256, rows_per_part: int = 100_000) -> int:
    """Shuffle-partition count sized to the data: one partition per
    ~``rows_per_part`` rows, at least 2 (no single-reducer bottleneck,
    and never more partitions than a tiny group domain can fill).

    The ``cap`` bounds scheduler/driver overhead but is CLUSTER-AWARE:
    the literal caps (64 light / 256 wide) were tuned on a 32-cpu box,
    and scale linearly with total cluster CPUs — on a 256-node cluster
    the wide-exchange cap grows with the worker count so per-partition
    input stays bounded (~rows_per_part rows) instead of concentrating
    TB-scale partitions on a handful of reducers."""
    scaled_cap = max(cap, cap * _cluster_cpus() // _BASELINE_CPUS)
    return max(2, min(scaled_cap, n_rows // rows_per_part + 1))


def coarse_part_key(key_col: str, out_col: str, n: int):
    """Batch fn appending ``out_col = key % n`` as int32 — the shared
    coarse-hash partition key for partition-local reducers (one coarse
    exchange, segment-vectorized group work; the `small_qty_revenue`
    idiom).  The key column must be integer-typed."""
    import numpy as np
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return t.append_column(out_col, pa.array((k % n).astype(np.int32), pa.int32()))

    return fn
