"""Cuckoo filter: exact-ish membership with DELETION, numpy state.

Second layer of the URL-seen set (SURVEY.md §2.2): the blocked bloom
answers "definitely new" cheaply; keys the bloom says "maybe" about are
resolved here.  Unlike a bloom, a cuckoo filter supports ``delete`` —
needed for re-crawl invalidation (drop a URL from the seen set so the
frontier re-admits it).

Standard design (Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014 — public literature):
buckets of 4 slots, 32-bit fingerprints, partial-key cuckoo hashing with
alt bucket = bucket XOR hash(fingerprint).

Fingerprint width is a coverage budget, not just memory: a false positive
here reports a genuinely-new URL as already-seen and silently drops the
page.  At design load (4-slot buckets, 2 candidate buckets) the false-seen
probability per novel key is ~= 8/2^fp_bits: 16-bit fp -> ~1.2e-4 (~1M
silently dropped pages at the 10^10-URL design point) — unacceptable
divergence from the reference's exact RFPDupeFilter; 32-bit fp -> ~1.9e-9
(~tens of pages at 10^10), which is below the reference's own noise floor
(network flakes).  Memory cost is 2x (16 B/bucket -> 32 B/bucket), still
~10 GiB/shard-group at 10^10 keys across shards.

State = one (n_buckets, 4) uint32 array (0 = empty slot) -> trivially
serializable for checkpoints.  Lookup/delete are fully vectorized; insert
does its cuckoo-kick loop per *novel* key only (admission volume), with a
vectorized fast path for keys whose primary bucket has a free slot.
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_FP_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio constant (public)


def _fingerprint_and_bucket(keys: np.ndarray, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """sha1 (n,20) u8 -> (fp uint32 in 1..2^32-1, primary bucket int64).

    ``n_buckets`` must be a power of two so the XOR alt-bucket mapping is
    an involution (alt(alt(b)) == b) — required for kicked items to stay
    findable (Fan et al. §3.1).
    """
    flat = keys.view(np.uint8).reshape(-1, 20)
    w = flat[:, :16].copy().view(np.uint64).reshape(-1, 2)
    fp = (w[:, 1] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    fp = np.where(fp == 0, np.uint32(1), fp)  # 0 is the empty marker
    b = (w[:, 0] & np.uint64(n_buckets - 1)).astype(np.int64)
    return fp, b


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    h = (fp.astype(np.uint64) * _FP_MIX) >> np.uint64(32)
    return (bucket ^ h.astype(np.int64)) & (n_buckets - 1)


class CuckooFilter:
    def __init__(self, capacity: int):
        # 95% max load on 4-slot buckets, rounded UP to a power of two
        # (XOR alt-bucket involution requirement).
        need = max(8, int(np.ceil(capacity / (0.95 * _SLOTS))))
        n = 1 << int(np.ceil(np.log2(need)))
        self.n_buckets = n
        self.table = np.zeros((n, _SLOTS), dtype=np.uint32)
        self.count = 0
        self._rng = np.random.default_rng(0xC0FFEE)  # deterministic kicks

    # --- batch lookup --------------------------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1 = _fingerprint_and_bucket(keys, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        hit1 = (self.table[b1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    # --- batch insert ---------------------------------------------------
    def add(self, keys: np.ndarray) -> int:
        """Insert a batch; returns number inserted (idempotent for dup fp+bucket).

        Vectorized fast path: per slot index, place every pending key whose
        primary (then alt) bucket has that slot free — one numpy pass per
        slot, first-wins on intra-batch bucket collisions.  Only keys whose
        both buckets are full fall back to the cuckoo-kick loop (rare below
        ~80% load)."""
        if len(keys) == 0:
            return 0
        fp, b1 = _fingerprint_and_bucket(keys, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        present = (self.table[b1] == fp[:, None]).any(axis=1) | (self.table[b2] == fp[:, None]).any(axis=1)
        pending = ~present
        inserted = 0
        for buckets in (b1, b2):
            for s in range(_SLOTS):
                cand = np.flatnonzero(pending & (self.table[buckets, s] == 0))
                if len(cand) == 0:
                    continue
                # first-wins per bucket within this pass
                _, first = np.unique(buckets[cand], return_index=True)
                sel = cand[first]
                self.table[buckets[sel], s] = fp[sel]
                pending[sel] = False
                inserted += len(sel)
        self.count += inserted
        for i in np.flatnonzero(pending):  # both buckets full: kick loop
            if self._insert_one(int(fp[i]), int(b1[i])):
                inserted += 1
        return inserted

    def _insert_one(self, fp: int, b1: int) -> bool:
        b2 = int(_alt_bucket(np.array([b1]), np.array([fp], dtype=np.uint32), self.n_buckets)[0])
        row1, row2 = self.table[b1], self.table[b2]
        if (row1 == fp).any() or (row2 == fp).any():
            return False  # already present (fingerprint-level dedup)
        for row in (row1, row2):
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # cuckoo kicks
        b = b1 if self._rng.integers(2) else b2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            b = int(_alt_bucket(np.array([b]), np.array([cur], dtype=np.uint32), self.n_buckets)[0])
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        raise RuntimeError("cuckoo filter full — size shards for capacity (SURVEY.md §7.4)")

    # --- batch delete ---------------------------------------------------
    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove keys (first matching slot). -> bool array: was present."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1 = _fingerprint_and_bucket(keys, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        out = np.zeros(len(fp), dtype=bool)
        for i, (f, a, b) in enumerate(zip(fp, b1, b2)):
            for bucket in (a, b):
                slots = np.flatnonzero(self.table[bucket] == f)
                if len(slots):
                    self.table[bucket, slots[0]] = 0
                    self.count -= 1
                    out[i] = True
                    break
        return out

    # --- checkpoint serialization ---------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.n_buckets, self.count], dtype=np.int64).tobytes()
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        n_buckets, count = np.frombuffer(blob[:16], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_buckets = int(n_buckets)
        obj.count = int(count)
        obj.table = np.frombuffer(blob[16:], dtype=np.uint32).reshape(int(n_buckets), _SLOTS).copy()
        obj._rng = np.random.default_rng(0xC0FFEE)
        return obj
