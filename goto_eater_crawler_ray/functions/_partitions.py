"""Shared shuffle-partition sizing (repo convention)."""

from __future__ import annotations


def auto_num_partitions(n_rows: int, cap: int = 256, rows_per_part: int = 100_000) -> int:
    """Shuffle-partition count sized to the data: one partition per
    ~``rows_per_part`` rows, at least 2 (no single-reducer bottleneck,
    and never more partitions than a tiny group domain can fill), capped
    at ``cap`` (scheduler / driver overhead bound).  Used for every join
    / groupby whose key domain scales with the data."""
    return max(2, min(cap, n_rows // rows_per_part + 1))
