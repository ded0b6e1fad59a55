"""Vectorized Bloom filter over 64-bit key hashes.

Broadcast-friendly semi-join screen: the filter is a packed numpy uint64 bit
array built from the small side's keys and shipped once via ``ray.put`` — a
few MB for 10^7 keys at 1% FPR, vs GBs for the exact key set — and every
probe batch tests all its keys with ``k`` vectorized ``hash_family`` lookups.
The screen admits false positives (never false negatives), so callers that
need an exact result follow it with an exact verification on the survivors
only (see ``pipelines.queries.bloom_semijoin_lineitem`` — the
screen-then-exact shape the engine also uses for uniqueness and heavy
hitters).

All hashing goes through ``functions.hashing`` so a filter built on one
worker/ordering answers identically everywhere (determinism contract).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64, hash_family

_LN2 = float(np.log(2.0))


class BloomFilter:
    """Fixed-size Bloom filter; ``m_bits`` is rounded up to a power of two so
    position reduction is a mask, not a modulo."""

    __slots__ = ("bits", "m", "k", "seed")

    def __init__(self, m_bits: int, k: int, seed: int = 0):
        m = 64
        while m < m_bits:
            m <<= 1
        self.m = m
        self.k = int(k)
        self.seed = int(seed)
        self.bits = np.zeros(m // 64, dtype=np.uint64)

    @classmethod
    def build(cls, keys, fpp: float = 0.01, seed: int = 0) -> "BloomFilter":
        """Size for ``len(keys)`` keys at target false-positive rate ``fpp``
        (standard m = -n ln p / ln²2, k = m/n ln 2), then insert them."""
        n = max(1, len(keys))
        m_bits = int(-n * np.log(fpp) / (_LN2 * _LN2)) + 1
        k = max(1, int(round(m_bits / n * _LN2)))
        bf = cls(m_bits, k, seed)
        bf.add(keys)
        return bf

    def _positions(self, keys) -> np.ndarray:
        """(k, n) bit positions in [0, m)."""
        base = hash64(np.asarray(keys), seed=self.seed)
        fam = hash_family(base, self.k, seed=self.seed ^ 0x5EED)
        return fam & np.uint64(self.m - 1)

    def add(self, keys) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64).ravel()
        bit = np.uint64(1) << (pos & np.uint64(63)).ravel()
        np.bitwise_or.at(self.bits, word, bit)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """OR-combine a same-shape filter (per-block partial build)."""
        if (self.m, self.k, self.seed) != (other.m, other.k, other.seed):
            raise ValueError("bloom shape mismatch")
        self.bits |= other.bits
        return self

    def contains(self, keys) -> np.ndarray:
        """Vectorized membership: bool array, True may be a false positive."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=0)
