"""Deterministic vectorized 64-bit hashing.

All engine hashing (HLL, Count-Min, MinHash, SimHash, salting, bucketing) goes
through these functions so results are identical across runs, task orders and
parallelism levels (FIXTURES.md determinism contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants). uint64 -> uint64."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z


def hash64(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of an array of ints / strings / bytes.

    Strings/objects go through ``pandas.util.hash_array`` (SipHash-1-3 with the
    fixed default key — stable across processes); numeric arrays go straight
    through splitmix64. ``seed`` remixes the result so independent hash
    families (CMS rows, MinHash permutations) are cheap.
    """
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        base = arr.astype(np.uint64)
    elif arr.dtype.kind == "f":
        base = arr.astype(np.float64).view(np.uint64)
    else:
        base = pd.util.hash_array(arr.astype(object), categorize=False)
    if seed:
        base = base ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(base)


def probe_sorted(sorted_vals: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Membership mask: True where ``keys[i]`` is present in the SORTED
    array ``sorted_vals`` — the broadcast-probe kernel shared by the
    referential check, the uniqueness dup filter, the near-dup flag filter
    and the hot-band filter (one copy, with the empty-set guard all call
    sites need: an empty probe set means nothing matches, not IndexError)."""
    if sorted_vals.size == 0:
        return np.zeros(keys.shape, dtype=bool)
    pos = np.minimum(np.searchsorted(sorted_vals, keys),
                     sorted_vals.size - 1)
    return sorted_vals[pos] == keys


def hash_family(base_hash: np.ndarray, n_hashes: int, seed: int = 0) -> np.ndarray:
    """(n_hashes, len) matrix of independent hashes derived from one base hash.

    Used by MinHash (one row per permutation) and Count-Min (one row per depth).
    """
    seeds = splitmix64(np.arange(1, n_hashes + 1, dtype=np.uint64) ^ np.uint64(seed))
    return splitmix64(base_hash[None, :] ^ seeds[:, None])
