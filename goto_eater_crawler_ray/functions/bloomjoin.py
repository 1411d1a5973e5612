"""Bloom-filter semi-join reduction (the classic distributed-join
pre-filter): build a bloom over the SMALL side's join keys once, broadcast
it (KBs-MBs of numpy words, vs GBs for a Python key set), and drop probe
rows batch-locally BEFORE the exact hash join — so the join's shuffle
carries only rows that can possibly match (plus the bloom's bounded false
positives, which the exact join then resolves; the reduction is therefore
result-invariant by construction and the SQL twin is the plain join).

Reuses the crawl engine's own ``state/bloom.py`` BlockedBloom (vectorized
batch probes, serializable numpy state).  Scale contract: the build side
is the broadcast-small side (same contract as every broadcast join here,
hard-gated by ``max_build_rows``); at 10^10 probe rows the probe side
streams and each batch does one vectorized ``contains``.  For build sides
too big to collect, shard the bloom by key hash (the seen-set layout) —
not needed for this query surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.bloom import BlockedBloom

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain) — uint64 -> uint64."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def int_keys_to_digests(keys: np.ndarray) -> np.ndarray:
    """int64 join keys -> (n, 20) uint8 pseudo-digests for BlockedBloom
    (two independent splitmix64 words; the bloom only reads the first 16
    bytes)."""
    k = keys.astype(np.uint64, copy=False)
    out = np.zeros((len(k), 20), np.uint8)
    out[:, 0:8] = _mix64(k).view(np.uint8).reshape(-1, 8)
    out[:, 8:16] = _mix64(k ^ _GOLDEN).view(np.uint8).reshape(-1, 8)
    return out


def build_bloom(build_ds, key_col: str, bits_per_key: int = 12, max_build_rows: int = 10_000_000) -> bytes:
    """Collect the small side's int64 keys and build one BlockedBloom —
    returns its serialized bytes for ``ray.put`` broadcast."""
    n = build_ds.count()
    if n > max_build_rows:
        raise ValueError(
            f"bloom build side has {n} rows > max_build_rows={max_build_rows}; "
            "shard the bloom by key hash instead of broadcasting one"
        )
    bloom = BlockedBloom(capacity=max(n, 1), bits_per_key=bits_per_key)
    if n:
        keys = build_ds.select_columns([key_col]).to_pandas()[key_col].to_numpy(dtype=np.int64)
        bloom.add(int_keys_to_digests(keys))
    return bloom.to_bytes()


def build_bloom_and_keys(build_ds, key_col: str, bits_per_key: int = 12, max_build_rows: int = 10_000_000):
    """Like :func:`build_bloom` but also returns the SORTED exact key
    array (int64).  Under the same ``max_build_rows`` gate that makes the
    bloom buildable, the exact keys are by construction already driver-
    collected — broadcasting them (8 B/key) lets probes resolve bloom
    false positives with a binary-search membership filter instead of a
    shuffle join (which pays fixed join-operator setup regardless of
    data size).  Above the gate, shard the bloom AND keep the shuffle
    join: neither structure may be broadcast then."""
    n = build_ds.count()
    if n > max_build_rows:
        raise ValueError(
            f"bloom build side has {n} rows > max_build_rows={max_build_rows}; "
            "shard the bloom by key hash instead of broadcasting one"
        )
    bloom = BlockedBloom(capacity=max(n, 1), bits_per_key=bits_per_key)
    keys = np.empty(0, np.int64)
    if n:
        keys = build_ds.select_columns([key_col]).to_pandas()[key_col].to_numpy(dtype=np.int64)
        bloom.add(int_keys_to_digests(keys))
    return bloom.to_bytes(), np.sort(keys)


class ExactResolve:
    """Actor-pool stage removing bloom FALSE POSITIVES exactly: the
    broadcast sorted build keys are fetched once per actor; each batch is
    one ``searchsorted`` membership test.  Placed after
    :class:`BloomProbe`, the pair is semantically an exact semi-join."""

    def __init__(self, key_col: str, keys_ref):
        import ray

        self.key_col = key_col
        self.keys = ray.get(keys_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t.column(self.key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(self.keys) == 0:
            return t.filter(pa.array(np.zeros(len(k), bool)))
        idx = np.searchsorted(self.keys, k)
        idx[idx >= len(self.keys)] = 0
        return t.filter(pa.array(self.keys[idx] == k))


class BloomProbe:
    """Actor-pool probe stage: the broadcast bloom is fetched and
    deserialized ONCE per actor in ``__init__``; each batch is one
    vectorized ``contains`` + filter."""

    def __init__(self, key_col: str, bloom_ref):
        import ray

        self.key_col = key_col
        self.bloom = BlockedBloom.from_bytes(ray.get(bloom_ref))

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = t.column(self.key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(self.bloom.contains(int_keys_to_digests(keys))))


def bloom_filter_probe(probe_ds, key_col: str, bloom_ref, concurrency=(1, 8)):
    """Drop probe rows whose key is DEFINITELY absent from the build side
    (false positives pass through and must be resolved by the exact join
    that follows)."""
    return probe_ds.map_batches(
        BloomProbe,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(key_col, bloom_ref),
    )
