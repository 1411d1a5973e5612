"""Sharded URL-seen set: blocked bloom fast-path + cuckoo exact layer.

The reference relies on Scrapy's request-fingerprint dupe filter plus a
never-expiring HTTP cache (reference: goto_eat_scrapy/settings.py:90-94) —
in-process, single-node state.  Here the seen set is the distributed core
of the engine (SURVEY.md §2.2): keys are SHA-1 digests of canonical URLs,
hash-partitioned across shard actors by digest prefix, so a 10^10-key set
becomes e.g. 4096 shards x ~2.4M keys, each shard a few MB of numpy state.

Semantics: "first discovery wins".  ``admit`` atomically tests-and-inserts
a batch inside one shard actor, so two waves (or two partitions of one
wave) discovering the same URL race safely — exactly one caller sees
``True`` (novel) per key.

Layering per probe batch:
  bloom.contains -> False  => definitely new: insert both, admit.
  bloom.contains -> True   => cuckoo.contains decides (handles bloom fps);
                              cuckoo supports delete for re-crawl
                              invalidation, bloom bits are left stale
                              (safe: stale bloom 'maybe' only costs a
                              cuckoo probe).

``SeenShard`` is a plain class (unit-testable without Ray); wrap with
``ray.remote`` via ``make_shard_actors`` for the distributed engine.
State checkpoints to bytes per shard (SURVEY.md §4.2 resume).
"""

from __future__ import annotations

import numpy as np

from .bloom import BlockedBloom
from .cuckoo import CuckooFilter


def _as_key_array(keys: bytes | np.ndarray) -> np.ndarray:
    """Accept packed bytes (n*20) or (n,20) u8 array -> (n,20) u8 array."""
    if isinstance(keys, (bytes, bytearray, memoryview)):
        arr = np.frombuffer(keys, dtype=np.uint8)
    else:
        arr = keys.view(np.uint8)
    return arr.reshape(-1, 20)


class SeenShard:
    """One shard of the seen set. All APIs are batch-oriented."""

    def __init__(self, capacity: int = 1_000_000, bits_per_key: int = 12):
        self.capacity = capacity
        self.bloom = BlockedBloom(capacity, bits_per_key)
        self.cuckoo = CuckooFilter(capacity)

    def admit(self, keys: bytes | np.ndarray) -> np.ndarray:
        """Test-and-insert. -> bool (n,): True = novel (admitted just now).

        Duplicate keys *within* the batch: only the first occurrence is
        novel (first-discovery-wins inside the batch too).
        """
        arr = _as_key_array(keys)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        maybe = self.bloom.contains(arr)
        present = np.zeros(len(arr), dtype=bool)
        if maybe.any():
            present[maybe] = self.cuckoo.contains(arr[maybe])
        novel = ~present
        if novel.any():
            # de-dup within the admitted sub-batch
            sub = arr[novel]
            view = np.ascontiguousarray(sub).view([("", np.uint8)] * 20).ravel()
            _, first_idx = np.unique(view, return_index=True)
            keep = np.zeros(len(sub), dtype=bool)
            keep[first_idx] = True
            novel_idx = np.flatnonzero(novel)
            novel[novel_idx[~keep]] = False
            uniq = sub[np.sort(first_idx)]
            self.bloom.add(uniq)
            self.cuckoo.add(uniq)
        return novel

    def contains(self, keys: bytes | np.ndarray) -> np.ndarray:
        arr = _as_key_array(keys)
        maybe = self.bloom.contains(arr)
        out = np.zeros(len(arr), dtype=bool)
        if maybe.any():
            out[maybe] = self.cuckoo.contains(arr[maybe])
        return out

    def delete(self, keys: bytes | np.ndarray) -> np.ndarray:
        """Re-crawl invalidation: remove from the exact layer only."""
        return self.cuckoo.delete(_as_key_array(keys))

    def size(self) -> int:
        return self.cuckoo.count

    # --- checkpoint ----------------------------------------------------
    def checkpoint(self) -> bytes:
        b = self.bloom.to_bytes()
        c = self.cuckoo.to_bytes()
        header = np.array([self.capacity, len(b), len(c)], dtype=np.int64).tobytes()
        return header + b + c

    @classmethod
    def restore(cls, blob: bytes) -> "SeenShard":
        capacity, nb, nc = np.frombuffer(blob[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.capacity = int(capacity)
        obj.bloom = BlockedBloom.from_bytes(blob[24 : 24 + nb])
        obj.cuckoo = CuckooFilter.from_bytes(blob[24 + nb : 24 + nb + nc])
        return obj


def shard_of(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard router: digest bytes 12..20 mod n_shards (SURVEY §7.3).

    MUST be independent of the filter-internal bits: bloom block and cuckoo
    primary bucket derive from bytes 0..8 and the cuckoo fingerprint from
    bytes 8..10 — routing on the same word would mean shard s only ever
    sees keys with (w0 % n_shards == s), collapsing each shard's usable
    bucket space to 1/n_shards of its table and overflowing the cuckoo
    filter far below design capacity (observed failure mode)."""
    arr = _as_key_array(keys)
    w = arr[:, 12:20].copy().view(np.uint64).ravel()
    return (w % np.uint64(n_shards)).astype(np.int64)


class ShardedSeenSet:
    """Driver/stage-side facade over N shard actors (or local shards).

    ``shards`` may be Ray actor handles (with .admit.remote etc.) or plain
    ``SeenShard`` objects — the facade detects which, so unit tests run
    Ray-free and the engine runs distributed with batched actor calls
    (one call per shard per wave, not per key).
    """

    def __init__(self, shards: list):
        self.shards = shards
        self.n = len(shards)
        self._remote = hasattr(shards[0], "admit") and hasattr(getattr(shards[0], "admit"), "remote")

    def _scatter_gather(self, method: str, keys: np.ndarray) -> np.ndarray:
        arr = _as_key_array(keys)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        sid = shard_of(arr, self.n)
        out = np.zeros(len(arr), dtype=bool)
        idx_per, payload_per, order = [], [], np.argsort(sid, kind="stable")
        sorted_sid = sid[order]
        bounds = np.searchsorted(sorted_sid, np.arange(self.n + 1))
        futures = []
        for s in range(self.n):
            sel = order[bounds[s] : bounds[s + 1]]
            if len(sel) == 0:
                continue
            idx_per.append(sel)
            payload = np.ascontiguousarray(arr[sel]).tobytes()
            if self._remote:
                futures.append(getattr(self.shards[s], method).remote(payload))
            else:
                futures.append(getattr(self.shards[s], method)(payload))
        if self._remote:
            import ray

            results = ray.get(futures)
        else:
            results = futures
        for sel, res in zip(idx_per, results):
            out[sel] = res
        return out

    def admit(self, keys: np.ndarray) -> np.ndarray:
        return self._scatter_gather("admit", keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self._scatter_gather("contains", keys)

    def delete(self, keys: np.ndarray) -> np.ndarray:
        return self._scatter_gather("delete", keys)

    def checkpoint_all(self) -> list[bytes]:
        if self._remote:
            import ray

            return ray.get([s.checkpoint.remote() for s in self.shards])
        return [s.checkpoint() for s in self.shards]


def make_shard_actors(n_shards: int, capacity_per_shard: int, restore_blobs: list[bytes] | None = None):
    """Create N named-less shard actors; optionally restore from checkpoint."""
    import ray

    # num_cpus=0.05: shard actors are RPC-bound; a bigger reservation steals
    # task slots from the data plane at low cpu counts (engine uses the same)
    RemoteShard = ray.remote(num_cpus=0.05)(SeenShard)
    actors = [RemoteShard.remote(capacity_per_shard) for _ in range(n_shards)]
    if restore_blobs is not None:
        assert len(restore_blobs) == n_shards
        ray.get([a._restore_inplace.remote(blob) for a, blob in zip(actors, restore_blobs)])
    return actors


def _restore_inplace(self: SeenShard, blob: bytes) -> bool:
    restored = SeenShard.restore(blob)
    self.capacity = restored.capacity
    self.bloom = restored.bloom
    self.cuckoo = restored.cuckoo
    return True


SeenShard._restore_inplace = _restore_inplace
