"""Blocked Bloom filter, numpy-vectorized, serializable.

Admission fast-path of the URL-seen set (SURVEY.md §2.2): each key probes
k bits inside ONE cache-line-sized 512-bit block, so a membership batch is
a handful of numpy gathers instead of k scattered reads across the whole
bit array.  Keys are 20-byte SHA-1 digests; we consume them as two u64
words (block selector + bit-position seed), so no extra hashing is needed.

False-positive budget: with 512-bit blocks, k=8 probes and ~12 bits/key
the additive block-imbalance penalty keeps fp < ~0.5% at design load —
good enough for a *first-pass* filter; exactness (and deletion) comes from
the cuckoo filter layered behind it (bloom says "maybe" -> cuckoo decides).

Design ref: Putze, Sanders, Singler, "Cache-, Hash- and Space-Efficient
Bloom Filters" (JEA 2009) — public literature.
"""

from __future__ import annotations

import numpy as np

_BLOCK_BITS = 512  # 8 x u64 words per block
_WORDS_PER_BLOCK = _BLOCK_BITS // 64


def _keys_to_words(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 20) uint8 sha1 digests -> two uint64 words per key."""
    if keys.dtype != np.uint8:
        keys = keys.view(np.uint8)
    flat = keys.reshape(-1, 20)
    w = flat[:, :16].copy().view(np.uint64).reshape(-1, 2)
    return w[:, 0], w[:, 1]


class BlockedBloom:
    """Fixed-capacity blocked bloom over 20-byte keys.

    add/contains are batch APIs over ``np.ndarray`` of shape (n, 20) uint8.
    State = one numpy uint64 array -> trivially serializable for the
    per-partition checkpoint (SURVEY.md §4.2).
    """

    K = 8  # probes per key, all within one block

    def __init__(self, capacity: int, bits_per_key: int = 12):
        n_bits = max(_BLOCK_BITS, int(capacity) * bits_per_key)
        self.n_blocks = int(np.ceil(n_bits / _BLOCK_BITS))
        self.words = np.zeros(self.n_blocks * _WORDS_PER_BLOCK, dtype=np.uint64)
        self.capacity = capacity

    def _probe(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (word_idx (n,K), bit_mask (n,K)) flattened probe coordinates."""
        w0, w1 = _keys_to_words(keys)
        block = (w0 % np.uint64(self.n_blocks)).astype(np.int64)
        # K bit positions inside the 512-bit block, derived from w1 by
        # successive 9-bit chunks mixed with an odd constant (public
        # double-hashing scheme: pos_i = h1 + i*h2 mod block_bits).
        h1 = w1 & np.uint64(0x1FF)
        h2 = ((w1 >> np.uint64(9)) | np.uint64(1)) & np.uint64(0x1FF)
        i = np.arange(self.K, dtype=np.uint64)
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(_BLOCK_BITS)
        word_idx = block[:, None] * _WORDS_PER_BLOCK + (pos >> np.uint64(6)).astype(np.int64)
        bit_mask = np.uint64(1) << (pos & np.uint64(63))
        return word_idx, bit_mask

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        word_idx, bit_mask = self._probe(keys)
        np.bitwise_or.at(self.words, word_idx.ravel(), bit_mask.ravel())

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """-> bool array (n,): True = maybe present, False = definitely new."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        word_idx, bit_mask = self._probe(keys)
        hit = (self.words[word_idx] & bit_mask) == bit_mask
        return hit.all(axis=1)

    # --- checkpoint serialization -------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.n_blocks, self.capacity], dtype=np.int64).tobytes()
        return header + self.words.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BlockedBloom":
        n_blocks, capacity = np.frombuffer(blob[:16], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_blocks = int(n_blocks)
        obj.capacity = int(capacity)
        obj.words = np.frombuffer(blob[16:], dtype=np.uint64).copy()
        return obj
